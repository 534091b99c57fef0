package graft.ml

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-Scala minimal media codecs — the REAL decode path for the
  * multimodal pipeline (no image/audio libraries exist in the offline
  * container, so the formats are the header-simple classics):
  *
  *  - BMP (24-bit uncompressed, BITMAPINFOHEADER): images
  *  - WAV (PCM16 mono, RIFF): audio
  *  - GRFV (a trivial length-prefixed container of BMP frames): video —
  *    stands in for a real container format; frame iteration, sampling and
  *    per-frame decode are the real plumbing a JPEG/MP4 codec would slot
  *    into unchanged
  *
  * Encoders exist so the synthetic media table carries REAL payloads;
  * decoders parse the actual bytes (header fields + pixel/sample data) —
  * nothing is smuggled through row metadata.
  */
object MediaCodec {

  // ------------------------------------------------------------------- BMP
  final case class BmpDecoded(width: Int, height: Int, pixelSum: Long)

  private def rowStride(width: Int): Int = ((width * 3 + 3) / 4) * 4

  /** Size in bytes of a 24-bit BMP of the given dimensions. */
  def bmpBytes(width: Int, height: Int): Int = 54 + height * rowStride(width)

  /** Encode a 24-bit BMP; `pixel(i)` supplies byte i of the top-down
    * (y*width + x)*3 + channel pixel stream (values 0-255).
    */
  def encodeBmp(width: Int, height: Int, pixel: Int => Int): Array[Byte] = {
    val stride = rowStride(width)
    val size = bmpBytes(width, height)
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(size) // file size
    bb.putInt(0) // reserved
    bb.putInt(54) // pixel data offset
    bb.putInt(40) // BITMAPINFOHEADER size
    bb.putInt(width)
    bb.putInt(height) // positive = bottom-up rows
    bb.putShort(1) // planes
    bb.putShort(24) // bpp
    bb.putInt(0) // no compression
    bb.putInt(size - 54) // image size
    bb.putInt(2835).putInt(2835) // 72 dpi
    bb.putInt(0).putInt(0) // palette
    var y = height - 1 // bottom-up storage of top-down logical rows
    while (y >= 0) {
      var x = 0
      while (x < width * 3) {
        bb.put((pixel(y * width * 3 + x) & 0xff).toByte)
        x += 1
      }
      var pad = width * 3
      while (pad < stride) { bb.put(0.toByte); pad += 1 }
      y -= 1
    }
    bb.array()
  }

  /** Decode a 24-bit BMP: dimensions from the header, sum of all pixel
    * bytes (order-independent content digest) from the pixel array.
    */
  def decodeBmp(bytes: Array[Byte], offset: Int = 0): BmpDecoded = {
    val bb = ByteBuffer.wrap(bytes, offset, bytes.length - offset).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.get() == 'B' && bb.get() == 'M', "not a BMP payload")
    bb.getInt; bb.getInt
    val dataOffset = bb.getInt
    bb.getInt // header size
    val width = bb.getInt
    val height = bb.getInt
    val stride = rowStride(width)
    var sum = 0L
    var y = 0
    while (y < height) {
      val rowStart = offset + dataOffset + y * stride
      var x = 0
      while (x < width * 3) { sum += bytes(rowStart + x) & 0xff; x += 1 }
      y += 1
    }
    BmpDecoded(width, height, sum)
  }

  /** Declared file size of the BMP starting at `offset` (header field). */
  def bmpSizeAt(bytes: Array[Byte], offset: Int): Int =
    ByteBuffer.wrap(bytes, offset + 2, 4).order(ByteOrder.LITTLE_ENDIAN).getInt

  // ------------------------------------------------------------------- WAV
  final case class WavDecoded(sampleRate: Int, nSamples: Int, sampleSum: Long)

  def wavBytes(nSamples: Int): Int = 44 + 2 * nSamples

  /** Encode PCM16 mono WAV; `sample(i)` supplies signed 16-bit sample i. */
  def encodeWav(sampleRate: Int, nSamples: Int, sample: Int => Int): Array[Byte] = {
    val dataLen = 2 * nSamples
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII"))
    bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII"))
    bb.putInt(16) // PCM fmt chunk size
    bb.putShort(1) // PCM
    bb.putShort(1) // mono
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * 2) // byte rate
    bb.putShort(2) // block align
    bb.putShort(16) // bits per sample
    bb.put("data".getBytes("US-ASCII"))
    bb.putInt(dataLen)
    var i = 0
    while (i < nSamples) { bb.putShort(sample(i).toShort); i += 1 }
    bb.array()
  }

  /** Decode PCM16 mono WAV: sample rate from fmt, signed sample sum from
    * the data chunk.
    */
  def decodeWav(bytes: Array[Byte]): WavDecoded = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val riff = new Array[Byte](4); bb.get(riff)
    require(new String(riff, "US-ASCII") == "RIFF", "not a WAV payload")
    bb.getInt
    val wave = new Array[Byte](4); bb.get(wave)
    require(new String(wave, "US-ASCII") == "WAVE", "not a WAV payload")
    bb.position(24)
    val sampleRate = bb.getInt
    bb.position(40)
    val dataLen = bb.getInt
    val n = dataLen / 2
    var sum = 0L
    var i = 0
    while (i < n) { sum += bb.getShort(44 + 2 * i); i += 1 }
    WavDecoded(sampleRate, n, sum)
  }

  // ------------------------------------------------- GRFV frame container
  final case class VideoDecoded(frames: Int, totalFrames: Int, width: Int, height: Int, pixelSum: Long)

  /** Container: "GRFV" + frame count (int32 LE) + concatenated BMP frames. */
  def encodeVideo(frames: Seq[Array[Byte]]): Array[Byte] = {
    val total = 8 + frames.map(_.length).sum
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("GRFV".getBytes("US-ASCII"))
    bb.putInt(frames.size)
    frames.foreach(bb.put)
    bb.array()
  }

  /** Decode every `step`-th frame (frame sampling happens IN the decoder —
    * skipped frames are seeked over via their header size, not decoded).
    */
  def decodeVideo(bytes: Array[Byte], step: Int = 1): VideoDecoded = {
    require(bytes.length >= 8 && bytes(0) == 'G' && bytes(1) == 'R' &&
      bytes(2) == 'F' && bytes(3) == 'V', "not a GRFV payload")
    val n = ByteBuffer.wrap(bytes, 4, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    var off = 8
    var sum = 0L
    var w = 0
    var h = 0
    var sampled = 0
    var f = 0
    while (f < n) {
      val size = bmpSizeAt(bytes, off)
      if (f % step == 0) {
        val d = decodeBmp(bytes, off)
        if (f == 0) { w = d.width; h = d.height }
        sum += d.pixelSum
        sampled += 1
      }
      off += size
      f += 1
    }
    VideoDecoded(sampled, n, w, h, sum)
  }
}
