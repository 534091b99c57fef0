package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Minimal HTML DOM for the span extractor — the offline stand-in for the
  * reference's BeautifulSoup(html.parser) subset the pipeline exercises:
  * nested elements, attribute order/whitespace/quote variance, void
  * elements, comments/doctype, script/style raw text, mismatched close tags
  * (pop-to-match), implied end tags for list/table/definition/option
  * content, and character-reference decoding (numeric `&#..;`/`&#x..;` +
  * the named core set) in text runs and attribute values — script/style
  * raw text is NOT decoded, matching html.parser CDATA handling.
  *
  * Deliberately NOT a spec-complete parser, but the named-entity table IS
  * spec-complete for semicolon forms: the full HTML4 set plus every HTML5
  * single-codepoint name (2,032 names) plus the 93 multi-codepoint names
  * (`&NotGreaterFullEqual;` class), with numeric refs covering any other
  * codepoint; semicolon-less legacy forms pass through verbatim by design.
  * The extractor's semantics (helper_classes.py, scraper.py) only depend
  * on tree shape, document order, attributes, and text, which this models
  * faithfully for real-world-shaped pages.
  */
object HtmlDom {

  /** Named character references: the readable HTML4 core below (~250
    * names — Latin-1, ligatures, Greek, punctuation, arrows, math;
    * values match html.unescape exactly, incl. lang/rang at the HTML5
    * mathematical-angle-bracket codepoints) merged with the packed
    * [[Html5SingleCodepoint]] and [[Html5MultiCodepoint]] tables for full
    * HTML5 named-reference coverage (semicolon forms). Numeric `&#..;`
    * refs cover any other codepoint; semicolon-less legacy forms pass
    * through verbatim by design.
    */
  private val NamedRefs: Map[String, String] = {
    val cp: Seq[(String, Int)] = Seq(
      // C0 / ASCII
      "quot" -> 0x22, "amp" -> 0x26, "apos" -> 0x27, "lt" -> 0x3C, "gt" -> 0x3E,
      // Latin-1 (U+00A0..U+00FF)
      "nbsp" -> 0xA0, "iexcl" -> 0xA1, "cent" -> 0xA2, "pound" -> 0xA3,
      "curren" -> 0xA4, "yen" -> 0xA5, "brvbar" -> 0xA6, "sect" -> 0xA7,
      "uml" -> 0xA8, "copy" -> 0xA9, "ordf" -> 0xAA, "laquo" -> 0xAB,
      "not" -> 0xAC, "shy" -> 0xAD, "reg" -> 0xAE, "macr" -> 0xAF,
      "deg" -> 0xB0, "plusmn" -> 0xB1, "sup2" -> 0xB2, "sup3" -> 0xB3,
      "acute" -> 0xB4, "micro" -> 0xB5, "para" -> 0xB6, "middot" -> 0xB7,
      "cedil" -> 0xB8, "sup1" -> 0xB9, "ordm" -> 0xBA, "raquo" -> 0xBB,
      "frac14" -> 0xBC, "frac12" -> 0xBD, "frac34" -> 0xBE, "iquest" -> 0xBF,
      "Agrave" -> 0xC0, "Aacute" -> 0xC1, "Acirc" -> 0xC2, "Atilde" -> 0xC3,
      "Auml" -> 0xC4, "Aring" -> 0xC5, "AElig" -> 0xC6, "Ccedil" -> 0xC7,
      "Egrave" -> 0xC8, "Eacute" -> 0xC9, "Ecirc" -> 0xCA, "Euml" -> 0xCB,
      "Igrave" -> 0xCC, "Iacute" -> 0xCD, "Icirc" -> 0xCE, "Iuml" -> 0xCF,
      "ETH" -> 0xD0, "Ntilde" -> 0xD1, "Ograve" -> 0xD2, "Oacute" -> 0xD3,
      "Ocirc" -> 0xD4, "Otilde" -> 0xD5, "Ouml" -> 0xD6, "times" -> 0xD7,
      "Oslash" -> 0xD8, "Ugrave" -> 0xD9, "Uacute" -> 0xDA, "Ucirc" -> 0xDB,
      "Uuml" -> 0xDC, "Yacute" -> 0xDD, "THORN" -> 0xDE, "szlig" -> 0xDF,
      "agrave" -> 0xE0, "aacute" -> 0xE1, "acirc" -> 0xE2, "atilde" -> 0xE3,
      "auml" -> 0xE4, "aring" -> 0xE5, "aelig" -> 0xE6, "ccedil" -> 0xE7,
      "egrave" -> 0xE8, "eacute" -> 0xE9, "ecirc" -> 0xEA, "euml" -> 0xEB,
      "igrave" -> 0xEC, "iacute" -> 0xED, "icirc" -> 0xEE, "iuml" -> 0xEF,
      "eth" -> 0xF0, "ntilde" -> 0xF1, "ograve" -> 0xF2, "oacute" -> 0xF3,
      "ocirc" -> 0xF4, "otilde" -> 0xF5, "ouml" -> 0xF6, "divide" -> 0xF7,
      "oslash" -> 0xF8, "ugrave" -> 0xF9, "uacute" -> 0xFA, "ucirc" -> 0xFB,
      "uuml" -> 0xFC, "yacute" -> 0xFD, "thorn" -> 0xFE, "yuml" -> 0xFF,
      // Latin Extended / spacing modifiers
      "OElig" -> 0x152, "oelig" -> 0x153, "Scaron" -> 0x160, "scaron" -> 0x161,
      "Yuml" -> 0x178, "fnof" -> 0x192, "circ" -> 0x2C6, "tilde" -> 0x2DC,
      // Greek
      "Alpha" -> 0x391, "Beta" -> 0x392, "Gamma" -> 0x393, "Delta" -> 0x394,
      "Epsilon" -> 0x395, "Zeta" -> 0x396, "Eta" -> 0x397, "Theta" -> 0x398,
      "Iota" -> 0x399, "Kappa" -> 0x39A, "Lambda" -> 0x39B, "Mu" -> 0x39C,
      "Nu" -> 0x39D, "Xi" -> 0x39E, "Omicron" -> 0x39F, "Pi" -> 0x3A0,
      "Rho" -> 0x3A1, "Sigma" -> 0x3A3, "Tau" -> 0x3A4, "Upsilon" -> 0x3A5,
      "Phi" -> 0x3A6, "Chi" -> 0x3A7, "Psi" -> 0x3A8, "Omega" -> 0x3A9,
      "alpha" -> 0x3B1, "beta" -> 0x3B2, "gamma" -> 0x3B3, "delta" -> 0x3B4,
      "epsilon" -> 0x3B5, "zeta" -> 0x3B6, "eta" -> 0x3B7, "theta" -> 0x3B8,
      "iota" -> 0x3B9, "kappa" -> 0x3BA, "lambda" -> 0x3BB, "mu" -> 0x3BC,
      "nu" -> 0x3BD, "xi" -> 0x3BE, "omicron" -> 0x3BF, "pi" -> 0x3C0,
      "rho" -> 0x3C1, "sigmaf" -> 0x3C2, "sigma" -> 0x3C3, "tau" -> 0x3C4,
      "upsilon" -> 0x3C5, "phi" -> 0x3C6, "chi" -> 0x3C7, "psi" -> 0x3C8,
      "omega" -> 0x3C9, "thetasym" -> 0x3D1, "upsih" -> 0x3D2, "piv" -> 0x3D6,
      // general punctuation
      "ensp" -> 0x2002, "emsp" -> 0x2003, "thinsp" -> 0x2009, "zwnj" -> 0x200C,
      "zwj" -> 0x200D, "lrm" -> 0x200E, "rlm" -> 0x200F, "ndash" -> 0x2013,
      "mdash" -> 0x2014, "lsquo" -> 0x2018, "rsquo" -> 0x2019, "sbquo" -> 0x201A,
      "ldquo" -> 0x201C, "rdquo" -> 0x201D, "bdquo" -> 0x201E, "dagger" -> 0x2020,
      "Dagger" -> 0x2021, "bull" -> 0x2022, "hellip" -> 0x2026, "permil" -> 0x2030,
      "prime" -> 0x2032, "Prime" -> 0x2033, "lsaquo" -> 0x2039, "rsaquo" -> 0x203A,
      "oline" -> 0x203E, "frasl" -> 0x2044, "euro" -> 0x20AC,
      // letterlike
      "weierp" -> 0x2118, "image" -> 0x2111, "real" -> 0x211C, "trade" -> 0x2122,
      "alefsym" -> 0x2135,
      // arrows
      "larr" -> 0x2190, "uarr" -> 0x2191, "rarr" -> 0x2192, "darr" -> 0x2193,
      "harr" -> 0x2194, "crarr" -> 0x21B5, "lArr" -> 0x21D0, "uArr" -> 0x21D1,
      "rArr" -> 0x21D2, "dArr" -> 0x21D3, "hArr" -> 0x21D4,
      // math operators
      "forall" -> 0x2200, "part" -> 0x2202, "exist" -> 0x2203, "empty" -> 0x2205,
      "nabla" -> 0x2207, "isin" -> 0x2208, "notin" -> 0x2209, "ni" -> 0x220B,
      "prod" -> 0x220F, "sum" -> 0x2211, "minus" -> 0x2212, "lowast" -> 0x2217,
      "radic" -> 0x221A, "prop" -> 0x221D, "infin" -> 0x221E, "ang" -> 0x2220,
      "and" -> 0x2227, "or" -> 0x2228, "cap" -> 0x2229, "cup" -> 0x222A,
      "int" -> 0x222B, "there4" -> 0x2234, "sim" -> 0x223C, "cong" -> 0x2245,
      "asymp" -> 0x2248, "ne" -> 0x2260, "equiv" -> 0x2261, "le" -> 0x2264,
      "ge" -> 0x2265, "sub" -> 0x2282, "sup" -> 0x2283, "nsub" -> 0x2284,
      "sube" -> 0x2286, "supe" -> 0x2287, "oplus" -> 0x2295, "otimes" -> 0x2297,
      "perp" -> 0x22A5, "sdot" -> 0x22C5,
      // technical / geometric / card symbols
      "lceil" -> 0x2308, "rceil" -> 0x2309, "lfloor" -> 0x230A, "rfloor" -> 0x230B,
      "lang" -> 0x27E8, "rang" -> 0x27E9, "loz" -> 0x25CA, "spades" -> 0x2660,
      "clubs" -> 0x2663, "hearts" -> 0x2665, "diams" -> 0x2666)
    cp.iterator.map { case (n, c) => n -> new String(Character.toChars(c)) }.toMap ++
      Html5SingleCodepoint ++ Html5MultiCodepoint
  }

  /** Every HTML5 single-codepoint named reference (2,032 names), packed as
    * "name:hex;..." — data from the published WHATWG named-character-
    * references table (the same table Python's html.entities.html5 carries,
    * which backs the reference's html.unescape decode path) and validated
    * name-by-name against it by the driver-side oracle check that
    * generated it. The 93 multi-codepoint names live in the companion
    * [[Html5MultiCodepoint]] table.
    */
  private lazy val Html5SingleCodepoint: Map[String, String] = {
    val packed = Seq(
      "AElig:c6;AMP:26;Aacute:c1;Abreve:102;Acirc:c2;Acy:410;Afr:1d504;Agrave:c0;Alpha:391;Amacr:100;A",
      "nd:2a53;Aogon:104;Aopf:1d538;ApplyFunction:2061;Aring:c5;Ascr:1d49c;Assign:2254;Atilde:c3;Auml:",
      "c4;Backslash:2216;Barv:2ae7;Barwed:2306;Bcy:411;Because:2235;Bernoullis:212c;Beta:392;Bfr:1d505",
      ";Bopf:1d539;Breve:2d8;Bscr:212c;Bumpeq:224e;CHcy:427;COPY:a9;Cacute:106;Cap:22d2;CapitalDiffere",
      "ntialD:2145;Cayleys:212d;Ccaron:10c;Ccedil:c7;Ccirc:108;Cconint:2230;Cdot:10a;Cedilla:b8;Center",
      "Dot:b7;Cfr:212d;Chi:3a7;CircleDot:2299;CircleMinus:2296;CirclePlus:2295;CircleTimes:2297;Clockw",
      "iseContourIntegral:2232;CloseCurlyDoubleQuote:201d;CloseCurlyQuote:2019;Colon:2237;Colone:2a74;",
      "Congruent:2261;Conint:222f;ContourIntegral:222e;Copf:2102;Coproduct:2210;CounterClockwiseContou",
      "rIntegral:2233;Cross:2a2f;Cscr:1d49e;Cup:22d3;CupCap:224d;DD:2145;DDotrahd:2911;DJcy:402;DScy:4",
      "05;DZcy:40f;Dagger:2021;Darr:21a1;Dashv:2ae4;Dcaron:10e;Dcy:414;Del:2207;Delta:394;Dfr:1d507;Di",
      "acriticalAcute:b4;DiacriticalDot:2d9;DiacriticalDoubleAcute:2dd;DiacriticalGrave:60;Diacritical",
      "Tilde:2dc;Diamond:22c4;DifferentialD:2146;Dopf:1d53b;Dot:a8;DotDot:20dc;DotEqual:2250;DoubleCon",
      "tourIntegral:222f;DoubleDot:a8;DoubleDownArrow:21d3;DoubleLeftArrow:21d0;DoubleLeftRightArrow:2",
      "1d4;DoubleLeftTee:2ae4;DoubleLongLeftArrow:27f8;DoubleLongLeftRightArrow:27fa;DoubleLongRightAr",
      "row:27f9;DoubleRightArrow:21d2;DoubleRightTee:22a8;DoubleUpArrow:21d1;DoubleUpDownArrow:21d5;Do",
      "ubleVerticalBar:2225;DownArrow:2193;DownArrowBar:2913;DownArrowUpArrow:21f5;DownBreve:311;DownL",
      "eftRightVector:2950;DownLeftTeeVector:295e;DownLeftVector:21bd;DownLeftVectorBar:2956;DownRight",
      "TeeVector:295f;DownRightVector:21c1;DownRightVectorBar:2957;DownTee:22a4;DownTeeArrow:21a7;Down",
      "arrow:21d3;Dscr:1d49f;Dstrok:110;ENG:14a;ETH:d0;Eacute:c9;Ecaron:11a;Ecirc:ca;Ecy:42d;Edot:116;",
      "Efr:1d508;Egrave:c8;Element:2208;Emacr:112;EmptySmallSquare:25fb;EmptyVerySmallSquare:25ab;Eogo",
      "n:118;Eopf:1d53c;Epsilon:395;Equal:2a75;EqualTilde:2242;Equilibrium:21cc;Escr:2130;Esim:2a73;Et",
      "a:397;Euml:cb;Exists:2203;ExponentialE:2147;Fcy:424;Ffr:1d509;FilledSmallSquare:25fc;FilledVery",
      "SmallSquare:25aa;Fopf:1d53d;ForAll:2200;Fouriertrf:2131;Fscr:2131;GJcy:403;GT:3e;Gamma:393;Gamm",
      "ad:3dc;Gbreve:11e;Gcedil:122;Gcirc:11c;Gcy:413;Gdot:120;Gfr:1d50a;Gg:22d9;Gopf:1d53e;GreaterEqu",
      "al:2265;GreaterEqualLess:22db;GreaterFullEqual:2267;GreaterGreater:2aa2;GreaterLess:2277;Greate",
      "rSlantEqual:2a7e;GreaterTilde:2273;Gscr:1d4a2;Gt:226b;HARDcy:42a;Hacek:2c7;Hat:5e;Hcirc:124;Hfr",
      ":210c;HilbertSpace:210b;Hopf:210d;HorizontalLine:2500;Hscr:210b;Hstrok:126;HumpDownHump:224e;Hu",
      "mpEqual:224f;IEcy:415;IJlig:132;IOcy:401;Iacute:cd;Icirc:ce;Icy:418;Idot:130;Ifr:2111;Igrave:cc",
      ";Im:2111;Imacr:12a;ImaginaryI:2148;Implies:21d2;Int:222c;Integral:222b;Intersection:22c2;Invisi",
      "bleComma:2063;InvisibleTimes:2062;Iogon:12e;Iopf:1d540;Iota:399;Iscr:2110;Itilde:128;Iukcy:406;",
      "Iuml:cf;Jcirc:134;Jcy:419;Jfr:1d50d;Jopf:1d541;Jscr:1d4a5;Jsercy:408;Jukcy:404;KHcy:425;KJcy:40",
      "c;Kappa:39a;Kcedil:136;Kcy:41a;Kfr:1d50e;Kopf:1d542;Kscr:1d4a6;LJcy:409;LT:3c;Lacute:139;Lambda",
      ":39b;Lang:27ea;Laplacetrf:2112;Larr:219e;Lcaron:13d;Lcedil:13b;Lcy:41b;LeftAngleBracket:27e8;Le",
      "ftArrow:2190;LeftArrowBar:21e4;LeftArrowRightArrow:21c6;LeftCeiling:2308;LeftDoubleBracket:27e6",
      ";LeftDownTeeVector:2961;LeftDownVector:21c3;LeftDownVectorBar:2959;LeftFloor:230a;LeftRightArro",
      "w:2194;LeftRightVector:294e;LeftTee:22a3;LeftTeeArrow:21a4;LeftTeeVector:295a;LeftTriangle:22b2",
      ";LeftTriangleBar:29cf;LeftTriangleEqual:22b4;LeftUpDownVector:2951;LeftUpTeeVector:2960;LeftUpV",
      "ector:21bf;LeftUpVectorBar:2958;LeftVector:21bc;LeftVectorBar:2952;Leftarrow:21d0;Leftrightarro",
      "w:21d4;LessEqualGreater:22da;LessFullEqual:2266;LessGreater:2276;LessLess:2aa1;LessSlantEqual:2",
      "a7d;LessTilde:2272;Lfr:1d50f;Ll:22d8;Lleftarrow:21da;Lmidot:13f;LongLeftArrow:27f5;LongLeftRigh",
      "tArrow:27f7;LongRightArrow:27f6;Longleftarrow:27f8;Longleftrightarrow:27fa;Longrightarrow:27f9;",
      "Lopf:1d543;LowerLeftArrow:2199;LowerRightArrow:2198;Lscr:2112;Lsh:21b0;Lstrok:141;Lt:226a;Map:2",
      "905;Mcy:41c;MediumSpace:205f;Mellintrf:2133;Mfr:1d510;MinusPlus:2213;Mopf:1d544;Mscr:2133;Mu:39",
      "c;NJcy:40a;Nacute:143;Ncaron:147;Ncedil:145;Ncy:41d;NegativeMediumSpace:200b;NegativeThickSpace",
      ":200b;NegativeThinSpace:200b;NegativeVeryThinSpace:200b;NestedGreaterGreater:226b;NestedLessLes",
      "s:226a;NewLine:a;Nfr:1d511;NoBreak:2060;NonBreakingSpace:a0;Nopf:2115;Not:2aec;NotCongruent:226",
      "2;NotCupCap:226d;NotDoubleVerticalBar:2226;NotElement:2209;NotEqual:2260;NotExists:2204;NotGrea",
      "ter:226f;NotGreaterEqual:2271;NotGreaterLess:2279;NotGreaterTilde:2275;NotLeftTriangle:22ea;Not",
      "LeftTriangleEqual:22ec;NotLess:226e;NotLessEqual:2270;NotLessGreater:2278;NotLessTilde:2274;Not",
      "Precedes:2280;NotPrecedesSlantEqual:22e0;NotReverseElement:220c;NotRightTriangle:22eb;NotRightT",
      "riangleEqual:22ed;NotSquareSubsetEqual:22e2;NotSquareSupersetEqual:22e3;NotSubsetEqual:2288;Not",
      "Succeeds:2281;NotSucceedsSlantEqual:22e1;NotSupersetEqual:2289;NotTilde:2241;NotTildeEqual:2244",
      ";NotTildeFullEqual:2247;NotTildeTilde:2249;NotVerticalBar:2224;Nscr:1d4a9;Ntilde:d1;Nu:39d;OEli",
      "g:152;Oacute:d3;Ocirc:d4;Ocy:41e;Odblac:150;Ofr:1d512;Ograve:d2;Omacr:14c;Omega:3a9;Omicron:39f",
      ";Oopf:1d546;OpenCurlyDoubleQuote:201c;OpenCurlyQuote:2018;Or:2a54;Oscr:1d4aa;Oslash:d8;Otilde:d",
      "5;Otimes:2a37;Ouml:d6;OverBar:203e;OverBrace:23de;OverBracket:23b4;OverParenthesis:23dc;Partial",
      "D:2202;Pcy:41f;Pfr:1d513;Phi:3a6;Pi:3a0;PlusMinus:b1;Poincareplane:210c;Popf:2119;Pr:2abb;Prece",
      "des:227a;PrecedesEqual:2aaf;PrecedesSlantEqual:227c;PrecedesTilde:227e;Prime:2033;Product:220f;",
      "Proportion:2237;Proportional:221d;Pscr:1d4ab;Psi:3a8;QUOT:22;Qfr:1d514;Qopf:211a;Qscr:1d4ac;RBa",
      "rr:2910;REG:ae;Racute:154;Rang:27eb;Rarr:21a0;Rarrtl:2916;Rcaron:158;Rcedil:156;Rcy:420;Re:211c",
      ";ReverseElement:220b;ReverseEquilibrium:21cb;ReverseUpEquilibrium:296f;Rfr:211c;Rho:3a1;RightAn",
      "gleBracket:27e9;RightArrow:2192;RightArrowBar:21e5;RightArrowLeftArrow:21c4;RightCeiling:2309;R",
      "ightDoubleBracket:27e7;RightDownTeeVector:295d;RightDownVector:21c2;RightDownVectorBar:2955;Rig",
      "htFloor:230b;RightTee:22a2;RightTeeArrow:21a6;RightTeeVector:295b;RightTriangle:22b3;RightTrian",
      "gleBar:29d0;RightTriangleEqual:22b5;RightUpDownVector:294f;RightUpTeeVector:295c;RightUpVector:",
      "21be;RightUpVectorBar:2954;RightVector:21c0;RightVectorBar:2953;Rightarrow:21d2;Ropf:211d;Round",
      "Implies:2970;Rrightarrow:21db;Rscr:211b;Rsh:21b1;RuleDelayed:29f4;SHCHcy:429;SHcy:428;SOFTcy:42",
      "c;Sacute:15a;Sc:2abc;Scaron:160;Scedil:15e;Scirc:15c;Scy:421;Sfr:1d516;ShortDownArrow:2193;Shor",
      "tLeftArrow:2190;ShortRightArrow:2192;ShortUpArrow:2191;Sigma:3a3;SmallCircle:2218;Sopf:1d54a;Sq",
      "rt:221a;Square:25a1;SquareIntersection:2293;SquareSubset:228f;SquareSubsetEqual:2291;SquareSupe",
      "rset:2290;SquareSupersetEqual:2292;SquareUnion:2294;Sscr:1d4ae;Star:22c6;Sub:22d0;Subset:22d0;S",
      "ubsetEqual:2286;Succeeds:227b;SucceedsEqual:2ab0;SucceedsSlantEqual:227d;SucceedsTilde:227f;Suc",
      "hThat:220b;Sum:2211;Sup:22d1;Superset:2283;SupersetEqual:2287;Supset:22d1;THORN:de;TRADE:2122;T",
      "SHcy:40b;TScy:426;Tab:9;Tau:3a4;Tcaron:164;Tcedil:162;Tcy:422;Tfr:1d517;Therefore:2234;Theta:39",
      "8;ThinSpace:2009;Tilde:223c;TildeEqual:2243;TildeFullEqual:2245;TildeTilde:2248;Topf:1d54b;Trip",
      "leDot:20db;Tscr:1d4af;Tstrok:166;Uacute:da;Uarr:219f;Uarrocir:2949;Ubrcy:40e;Ubreve:16c;Ucirc:d",
      "b;Ucy:423;Udblac:170;Ufr:1d518;Ugrave:d9;Umacr:16a;UnderBar:5f;UnderBrace:23df;UnderBracket:23b",
      "5;UnderParenthesis:23dd;Union:22c3;UnionPlus:228e;Uogon:172;Uopf:1d54c;UpArrow:2191;UpArrowBar:",
      "2912;UpArrowDownArrow:21c5;UpDownArrow:2195;UpEquilibrium:296e;UpTee:22a5;UpTeeArrow:21a5;Uparr",
      "ow:21d1;Updownarrow:21d5;UpperLeftArrow:2196;UpperRightArrow:2197;Upsi:3d2;Upsilon:3a5;Uring:16",
      "e;Uscr:1d4b0;Utilde:168;Uuml:dc;VDash:22ab;Vbar:2aeb;Vcy:412;Vdash:22a9;Vdashl:2ae6;Vee:22c1;Ve",
      "rbar:2016;Vert:2016;VerticalBar:2223;VerticalLine:7c;VerticalSeparator:2758;VerticalTilde:2240;",
      "VeryThinSpace:200a;Vfr:1d519;Vopf:1d54d;Vscr:1d4b1;Vvdash:22aa;Wcirc:174;Wedge:22c0;Wfr:1d51a;W",
      "opf:1d54e;Wscr:1d4b2;Xfr:1d51b;Xi:39e;Xopf:1d54f;Xscr:1d4b3;YAcy:42f;YIcy:407;YUcy:42e;Yacute:d",
      "d;Ycirc:176;Ycy:42b;Yfr:1d51c;Yopf:1d550;Yscr:1d4b4;Yuml:178;ZHcy:416;Zacute:179;Zcaron:17d;Zcy",
      ":417;Zdot:17b;ZeroWidthSpace:200b;Zeta:396;Zfr:2128;Zopf:2124;Zscr:1d4b5;aacute:e1;abreve:103;a",
      "c:223e;acd:223f;acirc:e2;acute:b4;acy:430;aelig:e6;af:2061;afr:1d51e;agrave:e0;alefsym:2135;ale",
      "ph:2135;alpha:3b1;amacr:101;amalg:2a3f;amp:26;and:2227;andand:2a55;andd:2a5c;andslope:2a58;andv",
      ":2a5a;ang:2220;ange:29a4;angle:2220;angmsd:2221;angmsdaa:29a8;angmsdab:29a9;angmsdac:29aa;angms",
      "dad:29ab;angmsdae:29ac;angmsdaf:29ad;angmsdag:29ae;angmsdah:29af;angrt:221f;angrtvb:22be;angrtv",
      "bd:299d;angsph:2222;angst:c5;angzarr:237c;aogon:105;aopf:1d552;ap:2248;apE:2a70;apacir:2a6f;ape",
      ":224a;apid:224b;apos:27;approx:2248;approxeq:224a;aring:e5;ascr:1d4b6;ast:2a;asymp:2248;asympeq",
      ":224d;atilde:e3;auml:e4;awconint:2233;awint:2a11;bNot:2aed;backcong:224c;backepsilon:3f6;backpr",
      "ime:2035;backsim:223d;backsimeq:22cd;barvee:22bd;barwed:2305;barwedge:2305;bbrk:23b5;bbrktbrk:2",
      "3b6;bcong:224c;bcy:431;bdquo:201e;becaus:2235;because:2235;bemptyv:29b0;bepsi:3f6;bernou:212c;b",
      "eta:3b2;beth:2136;between:226c;bfr:1d51f;bigcap:22c2;bigcirc:25ef;bigcup:22c3;bigodot:2a00;bigo",
      "plus:2a01;bigotimes:2a02;bigsqcup:2a06;bigstar:2605;bigtriangledown:25bd;bigtriangleup:25b3;big",
      "uplus:2a04;bigvee:22c1;bigwedge:22c0;bkarow:290d;blacklozenge:29eb;blacksquare:25aa;blacktriang",
      "le:25b4;blacktriangledown:25be;blacktriangleleft:25c2;blacktriangleright:25b8;blank:2423;blk12:",
      "2592;blk14:2591;blk34:2593;block:2588;bnot:2310;bopf:1d553;bot:22a5;bottom:22a5;bowtie:22c8;box",
      "DL:2557;boxDR:2554;boxDl:2556;boxDr:2553;boxH:2550;boxHD:2566;boxHU:2569;boxHd:2564;boxHu:2567;",
      "boxUL:255d;boxUR:255a;boxUl:255c;boxUr:2559;boxV:2551;boxVH:256c;boxVL:2563;boxVR:2560;boxVh:25",
      "6b;boxVl:2562;boxVr:255f;boxbox:29c9;boxdL:2555;boxdR:2552;boxdl:2510;boxdr:250c;boxh:2500;boxh",
      "D:2565;boxhU:2568;boxhd:252c;boxhu:2534;boxminus:229f;boxplus:229e;boxtimes:22a0;boxuL:255b;box",
      "uR:2558;boxul:2518;boxur:2514;boxv:2502;boxvH:256a;boxvL:2561;boxvR:255e;boxvh:253c;boxvl:2524;",
      "boxvr:251c;bprime:2035;breve:2d8;brvbar:a6;bscr:1d4b7;bsemi:204f;bsim:223d;bsime:22cd;bsol:5c;b",
      "solb:29c5;bsolhsub:27c8;bull:2022;bullet:2022;bump:224e;bumpE:2aae;bumpe:224f;bumpeq:224f;cacut",
      "e:107;cap:2229;capand:2a44;capbrcup:2a49;capcap:2a4b;capcup:2a47;capdot:2a40;caret:2041;caron:2",
      "c7;ccaps:2a4d;ccaron:10d;ccedil:e7;ccirc:109;ccups:2a4c;ccupssm:2a50;cdot:10b;cedil:b8;cemptyv:",
      "29b2;cent:a2;centerdot:b7;cfr:1d520;chcy:447;check:2713;checkmark:2713;chi:3c7;cir:25cb;cirE:29",
      "c3;circ:2c6;circeq:2257;circlearrowleft:21ba;circlearrowright:21bb;circledR:ae;circledS:24c8;ci",
      "rcledast:229b;circledcirc:229a;circleddash:229d;cire:2257;cirfnint:2a10;cirmid:2aef;cirscir:29c",
      "2;clubs:2663;clubsuit:2663;colon:3a;colone:2254;coloneq:2254;comma:2c;commat:40;comp:2201;compf",
      "n:2218;complement:2201;complexes:2102;cong:2245;congdot:2a6d;conint:222e;copf:1d554;coprod:2210",
      ";copy:a9;copysr:2117;crarr:21b5;cross:2717;cscr:1d4b8;csub:2acf;csube:2ad1;csup:2ad0;csupe:2ad2",
      ";ctdot:22ef;cudarrl:2938;cudarrr:2935;cuepr:22de;cuesc:22df;cularr:21b6;cularrp:293d;cup:222a;c",
      "upbrcap:2a48;cupcap:2a46;cupcup:2a4a;cupdot:228d;cupor:2a45;curarr:21b7;curarrm:293c;curlyeqpre",
      "c:22de;curlyeqsucc:22df;curlyvee:22ce;curlywedge:22cf;curren:a4;curvearrowleft:21b6;curvearrowr",
      "ight:21b7;cuvee:22ce;cuwed:22cf;cwconint:2232;cwint:2231;cylcty:232d;dArr:21d3;dHar:2965;dagger",
      ":2020;daleth:2138;darr:2193;dash:2010;dashv:22a3;dbkarow:290f;dblac:2dd;dcaron:10f;dcy:434;dd:2",
      "146;ddagger:2021;ddarr:21ca;ddotseq:2a77;deg:b0;delta:3b4;demptyv:29b1;dfisht:297f;dfr:1d521;dh",
      "arl:21c3;dharr:21c2;diam:22c4;diamond:22c4;diamondsuit:2666;diams:2666;die:a8;digamma:3dd;disin",
      ":22f2;div:f7;divide:f7;divideontimes:22c7;divonx:22c7;djcy:452;dlcorn:231e;dlcrop:230d;dollar:2",
      "4;dopf:1d555;dot:2d9;doteq:2250;doteqdot:2251;dotminus:2238;dotplus:2214;dotsquare:22a1;doubleb",
      "arwedge:2306;downarrow:2193;downdownarrows:21ca;downharpoonleft:21c3;downharpoonright:21c2;drbk",
      "arow:2910;drcorn:231f;drcrop:230c;dscr:1d4b9;dscy:455;dsol:29f6;dstrok:111;dtdot:22f1;dtri:25bf",
      ";dtrif:25be;duarr:21f5;duhar:296f;dwangle:29a6;dzcy:45f;dzigrarr:27ff;eDDot:2a77;eDot:2251;eacu",
      "te:e9;easter:2a6e;ecaron:11b;ecir:2256;ecirc:ea;ecolon:2255;ecy:44d;edot:117;ee:2147;efDot:2252",
      ";efr:1d522;eg:2a9a;egrave:e8;egs:2a96;egsdot:2a98;el:2a99;elinters:23e7;ell:2113;els:2a95;elsdo",
      "t:2a97;emacr:113;empty:2205;emptyset:2205;emptyv:2205;emsp:2003;emsp13:2004;emsp14:2005;eng:14b",
      ";ensp:2002;eogon:119;eopf:1d556;epar:22d5;eparsl:29e3;eplus:2a71;epsi:3b5;epsilon:3b5;epsiv:3f5",
      ";eqcirc:2256;eqcolon:2255;eqsim:2242;eqslantgtr:2a96;eqslantless:2a95;equals:3d;equest:225f;equ",
      "iv:2261;equivDD:2a78;eqvparsl:29e5;erDot:2253;erarr:2971;escr:212f;esdot:2250;esim:2242;eta:3b7",
      ";eth:f0;euml:eb;euro:20ac;excl:21;exist:2203;expectation:2130;exponentiale:2147;fallingdotseq:2",
      "252;fcy:444;female:2640;ffilig:fb03;fflig:fb00;ffllig:fb04;ffr:1d523;filig:fb01;flat:266d;fllig",
      ":fb02;fltns:25b1;fnof:192;fopf:1d557;forall:2200;fork:22d4;forkv:2ad9;fpartint:2a0d;frac12:bd;f",
      "rac13:2153;frac14:bc;frac15:2155;frac16:2159;frac18:215b;frac23:2154;frac25:2156;frac34:be;frac",
      "35:2157;frac38:215c;frac45:2158;frac56:215a;frac58:215d;frac78:215e;frasl:2044;frown:2322;fscr:",
      "1d4bb;gE:2267;gEl:2a8c;gacute:1f5;gamma:3b3;gammad:3dd;gap:2a86;gbreve:11f;gcirc:11d;gcy:433;gd",
      "ot:121;ge:2265;gel:22db;geq:2265;geqq:2267;geqslant:2a7e;ges:2a7e;gescc:2aa9;gesdot:2a80;gesdot",
      "o:2a82;gesdotol:2a84;gesles:2a94;gfr:1d524;gg:226b;ggg:22d9;gimel:2137;gjcy:453;gl:2277;glE:2a9",
      "2;gla:2aa5;glj:2aa4;gnE:2269;gnap:2a8a;gnapprox:2a8a;gne:2a88;gneq:2a88;gneqq:2269;gnsim:22e7;g",
      "opf:1d558;grave:60;gscr:210a;gsim:2273;gsime:2a8e;gsiml:2a90;gt:3e;gtcc:2aa7;gtcir:2a7a;gtdot:2",
      "2d7;gtlPar:2995;gtquest:2a7c;gtrapprox:2a86;gtrarr:2978;gtrdot:22d7;gtreqless:22db;gtreqqless:2",
      "a8c;gtrless:2277;gtrsim:2273;hArr:21d4;hairsp:200a;half:bd;hamilt:210b;hardcy:44a;harr:2194;har",
      "rcir:2948;harrw:21ad;hbar:210f;hcirc:125;hearts:2665;heartsuit:2665;hellip:2026;hercon:22b9;hfr",
      ":1d525;hksearow:2925;hkswarow:2926;hoarr:21ff;homtht:223b;hookleftarrow:21a9;hookrightarrow:21a",
      "a;hopf:1d559;horbar:2015;hscr:1d4bd;hslash:210f;hstrok:127;hybull:2043;hyphen:2010;iacute:ed;ic",
      ":2063;icirc:ee;icy:438;iecy:435;iexcl:a1;iff:21d4;ifr:1d526;igrave:ec;ii:2148;iiiint:2a0c;iiint",
      ":222d;iinfin:29dc;iiota:2129;ijlig:133;imacr:12b;image:2111;imagline:2110;imagpart:2111;imath:1",
      "31;imof:22b7;imped:1b5;in:2208;incare:2105;infin:221e;infintie:29dd;inodot:131;int:222b;intcal:",
      "22ba;integers:2124;intercal:22ba;intlarhk:2a17;intprod:2a3c;iocy:451;iogon:12f;iopf:1d55a;iota:",
      "3b9;iprod:2a3c;iquest:bf;iscr:1d4be;isin:2208;isinE:22f9;isindot:22f5;isins:22f4;isinsv:22f3;is",
      "inv:2208;it:2062;itilde:129;iukcy:456;iuml:ef;jcirc:135;jcy:439;jfr:1d527;jmath:237;jopf:1d55b;",
      "jscr:1d4bf;jsercy:458;jukcy:454;kappa:3ba;kappav:3f0;kcedil:137;kcy:43a;kfr:1d528;kgreen:138;kh",
      "cy:445;kjcy:45c;kopf:1d55c;kscr:1d4c0;lAarr:21da;lArr:21d0;lAtail:291b;lBarr:290e;lE:2266;lEg:2",
      "a8b;lHar:2962;lacute:13a;laemptyv:29b4;lagran:2112;lambda:3bb;lang:27e8;langd:2991;langle:27e8;",
      "lap:2a85;laquo:ab;larr:2190;larrb:21e4;larrbfs:291f;larrfs:291d;larrhk:21a9;larrlp:21ab;larrpl:",
      "2939;larrsim:2973;larrtl:21a2;lat:2aab;latail:2919;late:2aad;lbarr:290c;lbbrk:2772;lbrace:7b;lb",
      "rack:5b;lbrke:298b;lbrksld:298f;lbrkslu:298d;lcaron:13e;lcedil:13c;lceil:2308;lcub:7b;lcy:43b;l",
      "dca:2936;ldquo:201c;ldquor:201e;ldrdhar:2967;ldrushar:294b;ldsh:21b2;le:2264;leftarrow:2190;lef",
      "tarrowtail:21a2;leftharpoondown:21bd;leftharpoonup:21bc;leftleftarrows:21c7;leftrightarrow:2194",
      ";leftrightarrows:21c6;leftrightharpoons:21cb;leftrightsquigarrow:21ad;leftthreetimes:22cb;leg:2",
      "2da;leq:2264;leqq:2266;leqslant:2a7d;les:2a7d;lescc:2aa8;lesdot:2a7f;lesdoto:2a81;lesdotor:2a83",
      ";lesges:2a93;lessapprox:2a85;lessdot:22d6;lesseqgtr:22da;lesseqqgtr:2a8b;lessgtr:2276;lesssim:2",
      "272;lfisht:297c;lfloor:230a;lfr:1d529;lg:2276;lgE:2a91;lhard:21bd;lharu:21bc;lharul:296a;lhblk:",
      "2584;ljcy:459;ll:226a;llarr:21c7;llcorner:231e;llhard:296b;lltri:25fa;lmidot:140;lmoust:23b0;lm",
      "oustache:23b0;lnE:2268;lnap:2a89;lnapprox:2a89;lne:2a87;lneq:2a87;lneqq:2268;lnsim:22e6;loang:2",
      "7ec;loarr:21fd;lobrk:27e6;longleftarrow:27f5;longleftrightarrow:27f7;longmapsto:27fc;longrighta",
      "rrow:27f6;looparrowleft:21ab;looparrowright:21ac;lopar:2985;lopf:1d55d;loplus:2a2d;lotimes:2a34",
      ";lowast:2217;lowbar:5f;loz:25ca;lozenge:25ca;lozf:29eb;lpar:28;lparlt:2993;lrarr:21c6;lrcorner:",
      "231f;lrhar:21cb;lrhard:296d;lrm:200e;lrtri:22bf;lsaquo:2039;lscr:1d4c1;lsh:21b0;lsim:2272;lsime",
      ":2a8d;lsimg:2a8f;lsqb:5b;lsquo:2018;lsquor:201a;lstrok:142;lt:3c;ltcc:2aa6;ltcir:2a79;ltdot:22d",
      "6;lthree:22cb;ltimes:22c9;ltlarr:2976;ltquest:2a7b;ltrPar:2996;ltri:25c3;ltrie:22b4;ltrif:25c2;",
      "lurdshar:294a;luruhar:2966;mDDot:223a;macr:af;male:2642;malt:2720;maltese:2720;map:21a6;mapsto:",
      "21a6;mapstodown:21a7;mapstoleft:21a4;mapstoup:21a5;marker:25ae;mcomma:2a29;mcy:43c;mdash:2014;m",
      "easuredangle:2221;mfr:1d52a;mho:2127;micro:b5;mid:2223;midast:2a;midcir:2af0;middot:b7;minus:22",
      "12;minusb:229f;minusd:2238;minusdu:2a2a;mlcp:2adb;mldr:2026;mnplus:2213;models:22a7;mopf:1d55e;",
      "mp:2213;mscr:1d4c2;mstpos:223e;mu:3bc;multimap:22b8;mumap:22b8;nLeftarrow:21cd;nLeftrightarrow:",
      "21ce;nRightarrow:21cf;nVDash:22af;nVdash:22ae;nabla:2207;nacute:144;nap:2249;napos:149;napprox:",
      "2249;natur:266e;natural:266e;naturals:2115;nbsp:a0;ncap:2a43;ncaron:148;ncedil:146;ncong:2247;n",
      "cup:2a42;ncy:43d;ndash:2013;ne:2260;neArr:21d7;nearhk:2924;nearr:2197;nearrow:2197;nequiv:2262;",
      "nesear:2928;nexist:2204;nexists:2204;nfr:1d52b;nge:2271;ngeq:2271;ngsim:2275;ngt:226f;ngtr:226f",
      ";nhArr:21ce;nharr:21ae;nhpar:2af2;ni:220b;nis:22fc;nisd:22fa;niv:220b;njcy:45a;nlArr:21cd;nlarr",
      ":219a;nldr:2025;nle:2270;nleftarrow:219a;nleftrightarrow:21ae;nleq:2270;nless:226e;nlsim:2274;n",
      "lt:226e;nltri:22ea;nltrie:22ec;nmid:2224;nopf:1d55f;not:ac;notin:2209;notinva:2209;notinvb:22f7",
      ";notinvc:22f6;notni:220c;notniva:220c;notnivb:22fe;notnivc:22fd;npar:2226;nparallel:2226;npolin",
      "t:2a14;npr:2280;nprcue:22e0;nprec:2280;nrArr:21cf;nrarr:219b;nrightarrow:219b;nrtri:22eb;nrtrie",
      ":22ed;nsc:2281;nsccue:22e1;nscr:1d4c3;nshortmid:2224;nshortparallel:2226;nsim:2241;nsime:2244;n",
      "simeq:2244;nsmid:2224;nspar:2226;nsqsube:22e2;nsqsupe:22e3;nsub:2284;nsube:2288;nsubseteq:2288;",
      "nsucc:2281;nsup:2285;nsupe:2289;nsupseteq:2289;ntgl:2279;ntilde:f1;ntlg:2278;ntriangleleft:22ea",
      ";ntrianglelefteq:22ec;ntriangleright:22eb;ntrianglerighteq:22ed;nu:3bd;num:23;numero:2116;numsp",
      ":2007;nvDash:22ad;nvHarr:2904;nvdash:22ac;nvinfin:29de;nvlArr:2902;nvrArr:2903;nwArr:21d6;nwarh",
      "k:2923;nwarr:2196;nwarrow:2196;nwnear:2927;oS:24c8;oacute:f3;oast:229b;ocir:229a;ocirc:f4;ocy:4",
      "3e;odash:229d;odblac:151;odiv:2a38;odot:2299;odsold:29bc;oelig:153;ofcir:29bf;ofr:1d52c;ogon:2d",
      "b;ograve:f2;ogt:29c1;ohbar:29b5;ohm:3a9;oint:222e;olarr:21ba;olcir:29be;olcross:29bb;oline:203e",
      ";olt:29c0;omacr:14d;omega:3c9;omicron:3bf;omid:29b6;ominus:2296;oopf:1d560;opar:29b7;operp:29b9",
      ";oplus:2295;or:2228;orarr:21bb;ord:2a5d;order:2134;orderof:2134;ordf:aa;ordm:ba;origof:22b6;oro",
      "r:2a56;orslope:2a57;orv:2a5b;oscr:2134;oslash:f8;osol:2298;otilde:f5;otimes:2297;otimesas:2a36;",
      "ouml:f6;ovbar:233d;par:2225;para:b6;parallel:2225;parsim:2af3;parsl:2afd;part:2202;pcy:43f;perc",
      "nt:25;period:2e;permil:2030;perp:22a5;pertenk:2031;pfr:1d52d;phi:3c6;phiv:3d5;phmmat:2133;phone",
      ":260e;pi:3c0;pitchfork:22d4;piv:3d6;planck:210f;planckh:210e;plankv:210f;plus:2b;plusacir:2a23;",
      "plusb:229e;pluscir:2a22;plusdo:2214;plusdu:2a25;pluse:2a72;plusmn:b1;plussim:2a26;plustwo:2a27;",
      "pm:b1;pointint:2a15;popf:1d561;pound:a3;pr:227a;prE:2ab3;prap:2ab7;prcue:227c;pre:2aaf;prec:227",
      "a;precapprox:2ab7;preccurlyeq:227c;preceq:2aaf;precnapprox:2ab9;precneqq:2ab5;precnsim:22e8;pre",
      "csim:227e;prime:2032;primes:2119;prnE:2ab5;prnap:2ab9;prnsim:22e8;prod:220f;profalar:232e;profl",
      "ine:2312;profsurf:2313;prop:221d;propto:221d;prsim:227e;prurel:22b0;pscr:1d4c5;psi:3c8;puncsp:2",
      "008;qfr:1d52e;qint:2a0c;qopf:1d562;qprime:2057;qscr:1d4c6;quaternions:210d;quatint:2a16;quest:3",
      "f;questeq:225f;quot:22;rAarr:21db;rArr:21d2;rAtail:291c;rBarr:290f;rHar:2964;racute:155;radic:2",
      "21a;raemptyv:29b3;rang:27e9;rangd:2992;range:29a5;rangle:27e9;raquo:bb;rarr:2192;rarrap:2975;ra",
      "rrb:21e5;rarrbfs:2920;rarrc:2933;rarrfs:291e;rarrhk:21aa;rarrlp:21ac;rarrpl:2945;rarrsim:2974;r",
      "arrtl:21a3;rarrw:219d;ratail:291a;ratio:2236;rationals:211a;rbarr:290d;rbbrk:2773;rbrace:7d;rbr",
      "ack:5d;rbrke:298c;rbrksld:298e;rbrkslu:2990;rcaron:159;rcedil:157;rceil:2309;rcub:7d;rcy:440;rd",
      "ca:2937;rdldhar:2969;rdquo:201d;rdquor:201d;rdsh:21b3;real:211c;realine:211b;realpart:211c;real",
      "s:211d;rect:25ad;reg:ae;rfisht:297d;rfloor:230b;rfr:1d52f;rhard:21c1;rharu:21c0;rharul:296c;rho",
      ":3c1;rhov:3f1;rightarrow:2192;rightarrowtail:21a3;rightharpoondown:21c1;rightharpoonup:21c0;rig",
      "htleftarrows:21c4;rightleftharpoons:21cc;rightrightarrows:21c9;rightsquigarrow:219d;rightthreet",
      "imes:22cc;ring:2da;risingdotseq:2253;rlarr:21c4;rlhar:21cc;rlm:200f;rmoust:23b1;rmoustache:23b1",
      ";rnmid:2aee;roang:27ed;roarr:21fe;robrk:27e7;ropar:2986;ropf:1d563;roplus:2a2e;rotimes:2a35;rpa",
      "r:29;rpargt:2994;rppolint:2a12;rrarr:21c9;rsaquo:203a;rscr:1d4c7;rsh:21b1;rsqb:5d;rsquo:2019;rs",
      "quor:2019;rthree:22cc;rtimes:22ca;rtri:25b9;rtrie:22b5;rtrif:25b8;rtriltri:29ce;ruluhar:2968;rx",
      ":211e;sacute:15b;sbquo:201a;sc:227b;scE:2ab4;scap:2ab8;scaron:161;sccue:227d;sce:2ab0;scedil:15",
      "f;scirc:15d;scnE:2ab6;scnap:2aba;scnsim:22e9;scpolint:2a13;scsim:227f;scy:441;sdot:22c5;sdotb:2",
      "2a1;sdote:2a66;seArr:21d8;searhk:2925;searr:2198;searrow:2198;sect:a7;semi:3b;seswar:2929;setmi",
      "nus:2216;setmn:2216;sext:2736;sfr:1d530;sfrown:2322;sharp:266f;shchcy:449;shcy:448;shortmid:222",
      "3;shortparallel:2225;shy:ad;sigma:3c3;sigmaf:3c2;sigmav:3c2;sim:223c;simdot:2a6a;sime:2243;sime",
      "q:2243;simg:2a9e;simgE:2aa0;siml:2a9d;simlE:2a9f;simne:2246;simplus:2a24;simrarr:2972;slarr:219",
      "0;smallsetminus:2216;smashp:2a33;smeparsl:29e4;smid:2223;smile:2323;smt:2aaa;smte:2aac;softcy:4",
      "4c;sol:2f;solb:29c4;solbar:233f;sopf:1d564;spades:2660;spadesuit:2660;spar:2225;sqcap:2293;sqcu",
      "p:2294;sqsub:228f;sqsube:2291;sqsubset:228f;sqsubseteq:2291;sqsup:2290;sqsupe:2292;sqsupset:229",
      "0;sqsupseteq:2292;squ:25a1;square:25a1;squarf:25aa;squf:25aa;srarr:2192;sscr:1d4c8;ssetmn:2216;",
      "ssmile:2323;sstarf:22c6;star:2606;starf:2605;straightepsilon:3f5;straightphi:3d5;strns:af;sub:2",
      "282;subE:2ac5;subdot:2abd;sube:2286;subedot:2ac3;submult:2ac1;subnE:2acb;subne:228a;subplus:2ab",
      "f;subrarr:2979;subset:2282;subseteq:2286;subseteqq:2ac5;subsetneq:228a;subsetneqq:2acb;subsim:2",
      "ac7;subsub:2ad5;subsup:2ad3;succ:227b;succapprox:2ab8;succcurlyeq:227d;succeq:2ab0;succnapprox:",
      "2aba;succneqq:2ab6;succnsim:22e9;succsim:227f;sum:2211;sung:266a;sup:2283;sup1:b9;sup2:b2;sup3:",
      "b3;supE:2ac6;supdot:2abe;supdsub:2ad8;supe:2287;supedot:2ac4;suphsol:27c9;suphsub:2ad7;suplarr:",
      "297b;supmult:2ac2;supnE:2acc;supne:228b;supplus:2ac0;supset:2283;supseteq:2287;supseteqq:2ac6;s",
      "upsetneq:228b;supsetneqq:2acc;supsim:2ac8;supsub:2ad4;supsup:2ad6;swArr:21d9;swarhk:2926;swarr:",
      "2199;swarrow:2199;swnwar:292a;szlig:df;target:2316;tau:3c4;tbrk:23b4;tcaron:165;tcedil:163;tcy:",
      "442;tdot:20db;telrec:2315;tfr:1d531;there4:2234;therefore:2234;theta:3b8;thetasym:3d1;thetav:3d",
      "1;thickapprox:2248;thicksim:223c;thinsp:2009;thkap:2248;thksim:223c;thorn:fe;tilde:2dc;times:d7",
      ";timesb:22a0;timesbar:2a31;timesd:2a30;tint:222d;toea:2928;top:22a4;topbot:2336;topcir:2af1;top",
      "f:1d565;topfork:2ada;tosa:2929;tprime:2034;trade:2122;triangle:25b5;triangledown:25bf;trianglel",
      "eft:25c3;trianglelefteq:22b4;triangleq:225c;triangleright:25b9;trianglerighteq:22b5;tridot:25ec",
      ";trie:225c;triminus:2a3a;triplus:2a39;trisb:29cd;tritime:2a3b;trpezium:23e2;tscr:1d4c9;tscy:446",
      ";tshcy:45b;tstrok:167;twixt:226c;twoheadleftarrow:219e;twoheadrightarrow:21a0;uArr:21d1;uHar:29",
      "63;uacute:fa;uarr:2191;ubrcy:45e;ubreve:16d;ucirc:fb;ucy:443;udarr:21c5;udblac:171;udhar:296e;u",
      "fisht:297e;ufr:1d532;ugrave:f9;uharl:21bf;uharr:21be;uhblk:2580;ulcorn:231c;ulcorner:231c;ulcro",
      "p:230f;ultri:25f8;umacr:16b;uml:a8;uogon:173;uopf:1d566;uparrow:2191;updownarrow:2195;upharpoon",
      "left:21bf;upharpoonright:21be;uplus:228e;upsi:3c5;upsih:3d2;upsilon:3c5;upuparrows:21c8;urcorn:",
      "231d;urcorner:231d;urcrop:230e;uring:16f;urtri:25f9;uscr:1d4ca;utdot:22f0;utilde:169;utri:25b5;",
      "utrif:25b4;uuarr:21c8;uuml:fc;uwangle:29a7;vArr:21d5;vBar:2ae8;vBarv:2ae9;vDash:22a8;vangrt:299",
      "c;varepsilon:3f5;varkappa:3f0;varnothing:2205;varphi:3d5;varpi:3d6;varpropto:221d;varr:2195;var",
      "rho:3f1;varsigma:3c2;vartheta:3d1;vartriangleleft:22b2;vartriangleright:22b3;vcy:432;vdash:22a2",
      ";vee:2228;veebar:22bb;veeeq:225a;vellip:22ee;verbar:7c;vert:7c;vfr:1d533;vltri:22b2;vopf:1d567;",
      "vprop:221d;vrtri:22b3;vscr:1d4cb;vzigzag:299a;wcirc:175;wedbar:2a5f;wedge:2227;wedgeq:2259;weie",
      "rp:2118;wfr:1d534;wopf:1d568;wp:2118;wr:2240;wreath:2240;wscr:1d4cc;xcap:22c2;xcirc:25ef;xcup:2",
      "2c3;xdtri:25bd;xfr:1d535;xhArr:27fa;xharr:27f7;xi:3be;xlArr:27f8;xlarr:27f5;xmap:27fc;xnis:22fb",
      ";xodot:2a00;xopf:1d569;xoplus:2a01;xotime:2a02;xrArr:27f9;xrarr:27f6;xscr:1d4cd;xsqcup:2a06;xup",
      "lus:2a04;xutri:25b3;xvee:22c1;xwedge:22c0;yacute:fd;yacy:44f;ycirc:177;ycy:44b;yen:a5;yfr:1d536",
      ";yicy:457;yopf:1d56a;yscr:1d4ce;yucy:44e;yuml:ff;zacute:17a;zcaron:17e;zcy:437;zdot:17c;zeetrf:",
      "2128;zeta:3b6;zfr:1d537;zhcy:436;zigrarr:21dd;zopf:1d56b;zscr:1d4cf;zwj:200d;zwnj:200c").mkString
    packed.split(';').iterator.map { s =>
      val i = s.lastIndexOf(':')
      s.substring(0, i) -> new String(Character.toChars(Integer.parseInt(s.substring(i + 1), 16)))
    }.toMap
  }

  /** The 93 HTML5 multi-codepoint named references (`&NotGreaterFullEqual;`
    * → U+2267 U+0338, `&fjlig;` → "fj", the variant-selector forms, ...),
    * packed as "name:hex.hex;..." — same provenance and validation as
    * [[Html5SingleCodepoint]]. Completes semicolon-form named-reference
    * coverage: every name html.unescape decodes, this table decodes to the
    * identical string.
    */
  private lazy val Html5MultiCodepoint: Map[String, String] = {
    // Seq(...).mkString, not a `+` chain: scalac types a long `+` chain by
    // deep recursion and overflows its stack on cold (un-JIT-ed) compiles
    val packed = Seq(
      "NotEqualTilde:2242.338;NotGreaterFullEqual:2267.338;NotGreaterGreater:226b.338;NotGreaterSlantEqu",
      "al:2a7e.338;NotHumpDownHump:224e.338;NotHumpEqual:224f.338;NotLeftTriangleBar:29cf.338;NotLessLes",
      "s:226a.338;NotLessSlantEqual:2a7d.338;NotNestedGreaterGreater:2aa2.338;NotNestedLessLess:2aa1.338",
      ";NotPrecedesEqual:2aaf.338;NotRightTriangleBar:29d0.338;NotSquareSubset:228f.338;NotSquareSuperse",
      "t:2290.338;NotSubset:2282.20d2;NotSucceedsEqual:2ab0.338;NotSucceedsTilde:227f.338;NotSuperset:22",
      "83.20d2;ThickSpace:205f.200a;acE:223e.333;bne:3d.20e5;bnequiv:2261.20e5;caps:2229.fe00;cups:222a.",
      "fe00;fjlig:66.6a;gesl:22db.fe00;gvertneqq:2269.fe00;gvnE:2269.fe00;lates:2aad.fe00;lesg:22da.fe00",
      ";lvertneqq:2268.fe00;lvnE:2268.fe00;nGg:22d9.338;nGt:226b.20d2;nGtv:226b.338;nLl:22d8.338;nLt:226",
      "a.20d2;nLtv:226a.338;nang:2220.20d2;napE:2a70.338;napid:224b.338;nbump:224e.338;nbumpe:224f.338;n",
      "congdot:2a6d.338;nedot:2250.338;nesim:2242.338;ngE:2267.338;ngeqq:2267.338;ngeqslant:2a7e.338;nge",
      "s:2a7e.338;nlE:2266.338;nleqq:2266.338;nleqslant:2a7d.338;nles:2a7d.338;notinE:22f9.338;notindot:",
      "22f5.338;nparsl:2afd.20e5;npart:2202.338;npre:2aaf.338;npreceq:2aaf.338;nrarrc:2933.338;nrarrw:21",
      "9d.338;nsce:2ab0.338;nsubE:2ac5.338;nsubset:2282.20d2;nsubseteqq:2ac5.338;nsucceq:2ab0.338;nsupE:",
      "2ac6.338;nsupset:2283.20d2;nsupseteqq:2ac6.338;nvap:224d.20d2;nvge:2265.20d2;nvgt:3e.20d2;nvle:22",
      "64.20d2;nvlt:3c.20d2;nvltrie:22b4.20d2;nvrtrie:22b5.20d2;nvsim:223c.20d2;race:223d.331;smtes:2aac",
      ".fe00;sqcaps:2293.fe00;sqcups:2294.fe00;varsubsetneq:228a.fe00;varsubsetneqq:2acb.fe00;varsupsetn",
      "eq:228b.fe00;varsupsetneqq:2acc.fe00;vnsub:2282.20d2;vnsup:2283.20d2;vsubnE:2acb.fe00;vsubne:228a",
      ".fe00;vsupnE:2acc.fe00;vsupne:228b.fe00").mkString
    packed.split(';').iterator.map { s =>
      val i = s.indexOf(':')
      val sb = new java.lang.StringBuilder(2)
      s.substring(i + 1).split('.').foreach(h => sb.appendCodePoint(Integer.parseInt(h, 16)))
      s.substring(0, i) -> sb.toString
    }.toMap
  }

  /** Decode character references the way BeautifulSoup hands text to the
    * extractor: `&#NN;`, `&#xHH;`, and named refs from the HTML4 table;
    * anything unrecognized passes through verbatim.
    */
  def decodeEntities(s: String): String = {
    var amp = s.indexOf('&')
    if (amp < 0) return s
    val sb = new java.lang.StringBuilder(s.length) // 3-arg append(CharSequence,int,int)
    var i = 0
    while (amp >= 0) {
      sb.append(s, i, amp)
      val semi = s.indexOf(';', amp + 1)
      // entity names are bounded; the longest HTML5 name is 31 chars
      // ("CounterClockwiseContourIntegral") — a more distant ';' means this
      // '&' is literal
      if (semi > amp && semi - amp <= 32) {
        val body = s.substring(amp + 1, semi)
        val decoded: Option[String] =
          if (body.startsWith("#x") || body.startsWith("#X"))
            try Some(Character.toString(Integer.parseInt(body.drop(2), 16)))
            catch { case _: Exception => None }
          else if (body.startsWith("#"))
            try Some(Character.toString(Integer.parseInt(body.drop(1))))
            catch { case _: Exception => None }
          else NamedRefs.get(body)
        decoded match {
          case Some(d) => sb.append(d); i = semi + 1
          case None => sb.append('&'); i = amp + 1
        }
      } else { sb.append('&'); i = amp + 1 }
      amp = s.indexOf('&', i)
    }
    sb.append(s, i, s.length)
    sb.toString
  }

  /** Implied end tags: an opening tag in the KEY set pops any open tag in
    * the VALUE set first (the html.parser-builder behavior for messy pages
    * that omit `</li>`, `</td>`, `</dd>`, `</option>`, ...).
    */
  private val ImpliedClose: Map[String, Set[String]] = Map(
    "li" -> Set("li"), "p" -> Set("p"),
    "dd" -> Set("dd", "dt"), "dt" -> Set("dd", "dt"),
    "td" -> Set("td", "th"), "th" -> Set("td", "th"),
    "tr" -> Set("td", "th", "tr"),
    "thead" -> Set("td", "th", "tr", "tbody", "thead", "tfoot"),
    "tbody" -> Set("td", "th", "tr", "tbody", "thead", "tfoot"),
    "tfoot" -> Set("td", "th", "tr", "tbody", "thead", "tfoot"),
    "option" -> Set("option"),
    "optgroup" -> Set("option", "optgroup"))

  /** Element node; children hold elements and text runs in document order.
    * `childPos` = position among the parent's children (text runs count —
    * the sibling walks in surrounding-text need string siblings, mirroring
    * NavigableString handling in helper_classes.py:58-63).
    */
  final class Node(val tag: String, val attrs: Map[String, String],
                   val parent: Node, val childPos: Int) {
    val children: ArrayBuffer[Either[Node, String]] = ArrayBuffer.empty
    var index: Int = -1 // preorder document position

    /** BeautifulSoup get_text(strip=True): stripped non-empty descendant
      * strings joined with "". Memoized — the tree is immutable after
      * parse, and the extraction passes (summary fallback, links, content
      * spans, per-image surrounding-text walks) hit the same nodes
      * repeatedly.
      */
    private var textStripCache: String = null
    def textStrip: String = {
      if (textStripCache == null) {
        val sb = new StringBuilder
        def walk(n: Node): Unit = n.children.foreach {
          case Right(s) => val t = s.trim; if (t.nonEmpty) sb.append(t)
          case Left(c) => walk(c)
        }
        walk(this)
        textStripCache = sb.toString
      }
      textStripCache
    }

    /** Descendant elements with any of `tags`, document order (like
      * find_all: nested matches included).
      */
    def findAll(tags: Set[String]): Vector[Node] = {
      val out = Vector.newBuilder[Node]
      def walk(n: Node): Unit = n.children.foreach {
        case Left(c) => if (tags(c.tag)) out += c; walk(c)
        case _ => ()
      }
      walk(this)
      out.result()
    }

    /** All descendant elements, document order. */
    def elements: Vector[Node] = {
      val out = Vector.newBuilder[Node]
      def walk(n: Node): Unit = n.children.foreach {
        case Left(c) => out += c; walk(c)
        case _ => ()
      }
      walk(this)
      out.result()
    }

    /** Nearest ancestor with one of `tags` (find_parent). */
    def ancestor(tags: Set[String]): Option[Node] = {
      var p = parent
      while (p != null && !tags(p.tag)) p = p.parent
      Option(p)
    }
  }

  /** HTML void elements (never pushed on the open stack). */
  val Void: Set[String] = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "param", "source", "track", "wbr")

  def parse(html: String): Node = {
    val root = new Node("[document]", Map.empty, null, 0)
    var stack: List[Node] = List(root)
    var i = 0

    def addText(s: String): Unit =
      if (s.nonEmpty) stack.head.children += Right(decodeEntities(s))

    /** '>' terminating a tag, skipping quoted attribute values. */
    def tagEnd(from: Int): Int = {
      var j = from
      var quote: Char = 0
      while (j < html.length) {
        val c = html.charAt(j)
        if (quote != 0) { if (c == quote) quote = 0 }
        else if (c == '"' || c == '\'') quote = c
        else if (c == '>') return j
        j += 1
      }
      -1
    }

    while (i < html.length) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { addText(html.substring(i)); i = html.length }
      else {
        addText(html.substring(i, lt))
        if (html.startsWith("<!--", lt)) {
          val end = html.indexOf("-->", lt)
          i = if (end < 0) html.length else end + 3
        } else if (lt + 1 < html.length && (html.charAt(lt + 1) == '!' || html.charAt(lt + 1) == '?')) {
          val end = html.indexOf('>', lt)
          i = if (end < 0) html.length else end + 1
        } else if (html.startsWith("</", lt)) {
          val end = html.indexOf('>', lt)
          val name = html.substring(lt + 2, if (end < 0) html.length else end).trim.toLowerCase
          if (stack.exists(_.tag == name)) {
            while (stack.head.tag != name) stack = stack.tail
            if (stack.head.tag != "[document]") stack = stack.tail
          }
          i = if (end < 0) html.length else end + 1
        } else {
          val end = tagEnd(lt + 1)
          if (end < 0) { addText(html.substring(lt)); i = html.length }
          else {
            val inner = html.substring(lt + 1, end).trim
            val selfClose = inner.endsWith("/")
            val body = if (selfClose) inner.dropRight(1) else inner
            val sp = body.indexWhere(Character.isWhitespace)
            val name = (if (sp < 0) body else body.take(sp)).toLowerCase
            if (name.isEmpty || !name.head.isLetter) {
              addText(html.substring(lt, end + 1)); i = end + 1
            } else {
              val attrs = parseAttrs(if (sp < 0) "" else body.drop(sp))
              // implied end tags (messy pages omit </li>, </td>, </dd>, ...):
              // pop every open tag the new tag implicitly closes
              ImpliedClose.get(name).foreach { closes =>
                while (closes(stack.head.tag)) stack = stack.tail
              }
              val node = new Node(name, attrs, stack.head, stack.head.children.length)
              stack.head.children += Left(node)
              if (name == "script" || name == "style") {
                val close = html.indexOf(s"</$name", end + 1)
                if (close >= 0) {
                  node.children += Right(html.substring(end + 1, close))
                  val cEnd = html.indexOf('>', close)
                  i = if (cEnd < 0) html.length else cEnd + 1
                } else i = html.length
              } else {
                if (!selfClose && !Void(name)) stack = node :: stack
                i = end + 1
              }
            }
          }
        }
      }
    }

    var idx = 0
    def number(n: Node): Unit = {
      n.index = idx; idx += 1
      n.children.foreach { case Left(c) => number(c); case _ => () }
    }
    number(root)
    root
  }

  private def parseAttrs(s: String): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var i = 0
    while (i < s.length) {
      while (i < s.length && (s.charAt(i).isWhitespace || s.charAt(i) == '/')) i += 1
      val start = i
      while (i < s.length && !s.charAt(i).isWhitespace && s.charAt(i) != '=' && s.charAt(i) != '/') i += 1
      val name = s.substring(start, i).toLowerCase
      if (name.nonEmpty) {
        var j = i
        while (j < s.length && s.charAt(j).isWhitespace) j += 1
        if (j < s.length && s.charAt(j) == '=') {
          j += 1
          while (j < s.length && s.charAt(j).isWhitespace) j += 1
          if (j < s.length && (s.charAt(j) == '"' || s.charAt(j) == '\'')) {
            val q = s.charAt(j)
            val vEnd = s.indexOf(q, j + 1)
            val v = if (vEnd < 0) s.substring(j + 1) else s.substring(j + 1, vEnd)
            out += name -> decodeEntities(v)
            i = if (vEnd < 0) s.length else vEnd + 1
          } else {
            val vStart = j
            while (j < s.length && !s.charAt(j).isWhitespace) j += 1
            out += name -> decodeEntities(s.substring(vStart, j))
            i = j
          }
        } else { out += name -> ""; i = i.max(j) }
      } else if (i == start) i += 1
    }
    out.result()
  }
}
