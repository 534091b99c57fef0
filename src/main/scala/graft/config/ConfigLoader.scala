package graft.config

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Seed-list and config loading, mirroring the reference's run inputs:
  *  - seed queries: one per line from a text file
  *    (`/root/reference/app/utils/utils.py:30-32` — read, strip, keep order;
  *    blank lines are kept here and dropped by the engine's P1 filter, same
  *    observable behavior)
  *  - config: the flat `key: value` subset of the reference's YAML
  *    (`/root/reference/app/configs/config.yaml`) — no YAML dependency
  *    exists in the offline sandbox, and the reference config is flat
  *    scalars at the keys the engine consumes.
  */
object ConfigLoader {

  /** Load seed queries, preserving file order (D2 depends on it). */
  def loadSeeds(path: String): Seq[String] =
    Files.readAllLines(Paths.get(path)).asScala.toSeq.map(_.trim)

  /** Parse the flat `key: value` YAML subset: comments (#) and blank lines
    * ignored, values unquoted, last write wins.
    */
  def loadFlatYaml(path: String): Map[String, String] =
    Files.readAllLines(Paths.get(path)).asScala.iterator
      .map(_.takeWhile(_ != '#').trim)
      .filter(l => l.nonEmpty && l.contains(":"))
      .map { l =>
        val i = l.indexOf(':')
        l.take(i).trim -> l.drop(i + 1).trim.stripPrefix("\"").stripSuffix("\"")
      }.toMap

  /** Engine settings recognized in a config file (names follow the
    * reference's config.yaml vocabulary where one exists).
    */
  final case class EngineConfig(
      seed: Long = 42L,
      nHosts: Int = 200,
      resultsPerPage: Int = 10,
      pages: Int = 1,
      bodyElems: Int = 30,
      batchSize: Int = 8,
      expandTopK: Int = 0)

  def engineConfig(path: String): EngineConfig = {
    val m = loadFlatYaml(path)
    def i(k: String, d: Int) = m.get(k).map(_.toInt).getOrElse(d)
    val d = EngineConfig()
    EngineConfig(
      seed = m.get("seed").map(_.toLong).getOrElse(d.seed),
      nHosts = i("n_hosts", d.nHosts),
      resultsPerPage = i("results_per_page", d.resultsPerPage),
      pages = i("pages", d.pages),
      bodyElems = i("body_elems", d.bodyElems),
      batchSize = i("batch_size", d.batchSize),
      expandTopK = i("expand_top_k", d.expandTopK))
  }
}
