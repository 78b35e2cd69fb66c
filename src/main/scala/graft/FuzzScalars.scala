package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-engine scalar-function fuzzer (round 12).
  *
  * The oracle gate proves every registered query cross-engine-exact at
  * sf0.01 — but only on the testdata's tame value distributions. This
  * harness attacks the SAME Spark↔DuckDB idiom pairs the oracles are
  * built from (the `oracleSql` spellings: md5 hex-cast keys, guarded
  * ln/sqrt, pmod spellings, regexp 'g' flags, date arithmetic) with an
  * adversarial fixture: empty/whitespace/combining/astral/CJK strings,
  * regex metacharacters, numeric strings in every format, ±0.0, NaN,
  * ±Infinity, denormals, int/long extremes, leap days and month-end
  * dates, and a deterministic random fill. Every catalog entry is a
  * (Spark Column, DuckDB SQL, policy) triple evaluated over the same
  * parquet fixture; `scripts/fuzz_scalars.py` replays the SQL in DuckDB
  * and compares per row (exact by default; `ulp:N` for transcendental
  * functions whose last-place rounding legitimately differs between
  * libm implementations — the report prints the worst observed ulp so
  * the band is measured, not assumed).
  *
  * Divergences this harness DISCOVERED are documented in
  * FUZZ_SCALARS.md with the agreeing spelling the catalog now carries —
  * the same role the fsum/hex-cast idioms play for the oracle gate.
  *
  * Usage:
  *   sbt "runMain graft.FuzzScalars /tmp/fuzz_out"
  *   python3 scripts/fuzz_scalars.py /tmp/fuzz_out
  */
object FuzzScalars {

  /** One fuzz pair: the Spark expression, the DuckDB spelling of the
    * SAME semantics, and the compare policy ("exact" or "ulp:N"). */
  final case class FuzzPair(name: String, spark: Column, duck: String,
      policy: String = "exact")

  // ---------------------------------------------------------------
  // Fixture
  // ---------------------------------------------------------------

  /** Edge strings: every class that has bitten (or could bite) a
    * string function cross-engine — empty/whitespace, precomposed vs
    * combining accents, special-casing letters (ß, İ), CJK, Hangul,
    * emoji + astral (surrogate-pair) text, control chars, regex and
    * LIKE metacharacters, quote styles, numeric strings in every
    * format Spark's cast grammar distinguishes, unicode digits, and a
    * long repeated tail. */
  private val EdgeStrings: Seq[String] = Seq(
    "", " ", "  \t ", "\n", "a", "A", "abc", "Hello, World!",
    "café", "café", "ß", "straße", "İstanbul",
    "ısparta", "ΣΙΣΥΦΟΣ",
    "σίσυφος",
    "日本語のテキスト",
    "中文文本", "한국어",
    "🦀🚀", "𝒜stral𐍈",
    "a\nb", "a\tb", "a,b,,c,", ",,,", "a.b*c+d?e",
    "[bracket](paren){brace}", "%percent_underscore\\",
    "'single' \"double\"", "null", "NULL", "-", "0", "123", "-456",
    "+789", " 42 ", "3.14", "-2.5e3", "1e309", "0x1A", "Infinity",
    "NaN", "true", "F", "2023-01-15", "99999999999999999999",
    "٠١٢", "Ⅶ", "龍龍龍",
    "x" * 500, "mixed 日本 ascii 123", "ẞ",
    // round 14: ligature + titlecase-digraph — FULL casing expands ﬁ
    // to "FI" and knows the three-way ǅ forms; SIMPLE 1:1 mappings
    // don't (the casing wave's home turf)
    "ﬁle ǅungla", "ǉeto",
    // round 15 (regex + rendering waves): a trailing-newline string
    // (the $-anchor divergence zone), nested-bracket text for lazy
    // quantifiers, key=value text for anchored extracts, and doubled
    // letters for the backreference fence
    "tail\n", "a<xx>b<yy>", "a=1;bar=22", "xx yz zz ab",
    // round 15 (parsing wave): valid leap day, invalid calendar day,
    // unpadded fields and leading whitespace (the strict-vs-lenient
    // parser boundary), and a d/m/y + time shape
    "2024-02-29", "2023-02-30", "2023-1-5", " 2023-01-15",
    "15/01/2023 13:45",
    // round 16 (collation wave + the #24 VT fence): a vertical-tab
    // string (Java \s matches U+000B, RE2 does not — the fence's
    // exercise row) and a no-break-space string (NBSP is NOT \s in
    // either dialect and NOT trimmed by either trim — worth pinning)
    "v\u000bt", "a\u00a0b")
  // pool size MUST stay coprime with the null stride's modulus 13:
  // at 52 (= 4·13) entries the every-13th-row null pattern deleted
  // the SAME four strings from s1 in every edge cycle (café-NFC,
  // "a\nb", "-456", "٠١٢" were never tested on s1 at all — found by
  // auditing the fixture, round 12)
  require(EdgeStrings.size % 13 != 0, s"string pool ${EdgeStrings.size}")

  private val EdgeInts: Seq[Int] = Seq(
    0, 1, -1, 2, -2, 7, -7, 17, 100, 255, 256, 65535, 1000000,
    -1000000, Int.MaxValue, Int.MinValue + 1, Int.MinValue)

  private val EdgeLongs: Seq[Long] = Seq(
    0L, 1L, -1L, 255L, -256L, 1L << 31, -(1L << 31), 1L << 62,
    -(1L << 62), Long.MaxValue, Long.MinValue + 1, Long.MinValue)

  private val EdgeDoubles: Seq[Double] = Seq(
    0.0, -0.0, 1.0, -1.0, 0.5, -0.5, 1.5, 2.5, -2.5, 0.1, -0.1,
    1.0 / 3.0, math.Pi, math.E, 1e-300, -1e-300, 1e300, -1e300,
    java.lang.Double.MIN_VALUE, java.lang.Double.MAX_VALUE,
    -java.lang.Double.MAX_VALUE, 1e15 + 0.5, 1e15 - 0.5,
    // "pretty" decimals whose binary value sits just under the
    // rendered halfway point (0.285 = 0.28499999999999998…): the
    // shortest-rendering-vs-exact-binary rounding trap's home turf
    2.675, 0.285, 1.005, -1.005, 8.835, 0.145,
    Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)

  /** Edge dates as epoch days: epoch boundary, pre-epoch, leap days,
    * century non-leap (1900-02-28), month ends that clamp under
    * add_months, and a post-Gregorian-reform anchor (both engines use
    * the proleptic Gregorian calendar, but staying modern keeps the
    * probe about arithmetic, not calendrology). */
  private val EdgeDates: Seq[java.time.LocalDate] = Seq(
    "1970-01-01", "1969-12-31", "2000-02-29", "2001-02-28",
    "1900-02-28", "1900-03-01", "2024-01-31", "2024-03-31",
    "2024-12-31", "1999-12-31", "2024-02-29", "1987-06-05",
    "1600-02-29", "2038-01-19").map(java.time.LocalDate.parse)
  // same null-stride coprimality rule as the string pool (a 13-sized
  // date pool pinned "1600-02-29" to dt's null residue forever)
  require(EdgeDates.size % 13 != 0 && EdgeDoubles.size % 13 != 0 &&
    EdgeInts.size % 13 != 0 && EdgeLongs.size % 13 != 0)

  /** Edge JSON documents (round 17, json-path wave): scalar types in
    * every literal format (preserved-text numbers like 1.50, >int64
    * integers, exponents), nesting, arrays (incl. of objects), root
    * arrays and scalar roots, duplicate keys, keys needing quoted
    * path syntax, escaped surrogate pairs, interior whitespace — and
    * the MALFORMED class (truncated, single-quoted, trailing comma,
    * bare text, empty) where Spark's get_json_object returns NULL but
    * DuckDB's JSON cast ERRORS, so every oracle spelling must carry a
    * json_valid guard. */
  private val EdgeJsons: Seq[String] = Seq(
    """{"s":"abc","n":1,"b":true,"z":null}""",
    """{"s":"","n":0}""",
    """{"s":"café \"q\" \\ line\nbreak\ttab","n":-2.5}""",
    """{"n":1.50}""", """{"n":1e3}""", """{"n":1E+308}""",
    """{"n":0.1}""", """{"n":99999999999999999999}""",
    """{"n":-0.0}""",
    """{"a":{"b":{"c":"deep"}}}""",
    """{"arr":[1,2,3]}""", """{"arr":["x","y"],"n":7}""",
    """{"arr":[]}""", """{"arr":[{"k":1},{"k":2}]}""",
    """{"o":{"y":2,"x":1}}""",
    """{"d":1,"d":2}""",
    """{ "s" : "spaced" , "n" : 5 }""",
    """{"s":"日本語 🦀"}""",
    """{"dot.key":"v1","sp key":"v2"}""",
    """["a","b","c"]""", """[]""", """{}""",
    """ {"s":"lead-ws"} """,
    "5", "\"bare\"", "true", "null", "",
    "not json", """{"s":"trunc""", """{'s':'single'}""",
    """{"s":"a",}""", """{"n":+5}""",
    """{"nested":{"arr":[[1,2],[3]]}}""",
    """{"u":"🦀"}""",
    // the ESCAPED-surrogate spelling of the same astral char (JSON
    // 🦀) — built with runtime backslashes because Scala 2
    // processes \ u escapes even inside triple quotes
    "{\"u\":\"\\ud83e\\udd80\"}",
    """{"b":false,"z":null,"s":"mix","n":3.14,"arr":[null,true,"t",2]}""")
  require(EdgeJsons.size % 13 != 0, s"json pool ${EdgeJsons.size}")

  final case class FuzzRow(id: Long, s1: Option[String],
      s2: Option[String], i1: Option[Int], i2: Option[Int],
      l1: Option[Long], d1: Option[Double], d2: Option[Double],
      pr: Option[Double], dt: Option[java.sql.Date],
      dt2: Option[java.sql.Date], ts: Option[java.sql.Timestamp],
      js: Option[String])

  /** Deterministic fixture: first an edge sweep (each pool cycled at
    * coprime strides so edge×edge combinations vary per row), then a
    * seeded random fill (strings over a mixed ASCII/accent/CJK/astral
    * alphabet; numerics spanning magnitudes). Every ~13th value per
    * column is NULL — null propagation is part of every pair's
    * contract. */
  def fixture(spark: SparkSession, rows: Int = 4096,
      seed: Long = 20260815L): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val alphabet: IndexedSeq[String] =
      (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')).map(_.toString) ++
        Seq(" ", ",", ".", "-", "+", "e", "E", "*", "%", "_", "'",
          "é", "ü", "ß", "́", "日", "本",
          "🦀", "𝒜")
    def rndString(): String = {
      val len = rnd.nextInt(21)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString
    }
    def rndDouble(): Double = {
      val mag = rnd.nextInt(40) - 20 // 1e-20 .. 1e19
      (rnd.nextDouble() - 0.5) * 2 * math.pow(10.0, mag)
    }
    val data = (0 until rows).map { i =>
      val id = i.toLong
      def nul(k: Int): Boolean = (i + k * 5) % 13 == 0
      // edge sweep for the first 3 pools' LCM-ish span; random after
      val s1 = if (i < EdgeStrings.size * 4) EdgeStrings(i % EdgeStrings.size)
        else rndString()
      val s2 = if (i < EdgeStrings.size * 4)
        EdgeStrings((i * 7 + 3) % EdgeStrings.size) else rndString()
      val i1 = if (i < EdgeInts.size * 16) EdgeInts(i % EdgeInts.size)
        else rnd.nextInt(2000001) - 1000000
      val i2 = if (i < EdgeInts.size * 16)
        EdgeInts((i * 5 + 1) % EdgeInts.size)
        else rnd.nextInt(201) - 100
      val l1 = if (i < EdgeLongs.size * 16) EdgeLongs(i % EdgeLongs.size)
        else rnd.nextLong()
      val d1 = if (i < EdgeDoubles.size * 8) EdgeDoubles(i % EdgeDoubles.size)
        else rndDouble()
      val d2 = if (i < EdgeDoubles.size * 8)
        EdgeDoubles((i * 11 + 5) % EdgeDoubles.size) else rndDouble()
      // price-shaped: an exact-two-decimal rendering (cents/100), the
      // shape TPC-H money columns ship as DOUBLE — halfway-at-scale-1
      // values (cents ending in 5) oversampled 1-in-4
      val cents = if (i % 4 == 0) rnd.nextInt(1100000).toLong * 10 + 5
        else rnd.nextInt(11000000).toLong
      val pr = cents.toDouble / 100.0
      val dtL = if (i < EdgeDates.size * 8) EdgeDates(i % EdgeDates.size)
        else java.time.LocalDate.ofEpochDay(rnd.nextInt(73000) - 10000L)
      val dt2L = if (i < EdgeDates.size * 8)
        EdgeDates((i * 3 + 2) % EdgeDates.size)
        else java.time.LocalDate.ofEpochDay(rnd.nextInt(73000) - 10000L)
      val tsI = java.time.Instant.ofEpochSecond(
        dtL.toEpochDay * 86400L + rnd.nextInt(86400),
        rnd.nextInt(1000000) * 1000L) // micros resolution
      // random JSON fill: [a-z0-9]-only embedded words keep the docs
      // valid without an escaper; shape 4 is usually-malformed bare
      // text so the json_valid guards stay exercised past the edges
      def rndWord(): String = {
        val len = 1 + rnd.nextInt(8)
        (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      }
      val js = if (i < EdgeJsons.size * 4) EdgeJsons(i % EdgeJsons.size)
        else rnd.nextInt(6) match {
          case 0 => s"""{"n":${rnd.nextInt(2001) - 1000},"s":"${rndWord()}"}"""
          case 1 => s"""{"arr":[${Seq.fill(rnd.nextInt(4))(
            rnd.nextInt(100)).mkString(",")}]}"""
          case 2 => s"""{"a":{"b":${rnd.nextInt(10)}}}"""
          case 3 => s"""{"n":${rnd.nextDouble()}}"""
          case 4 => rndWord()
          case 5 => s"""{"b":${rnd.nextBoolean()},"z":null}"""
        }
      FuzzRow(id,
        if (nul(1)) None else Some(s1),
        if (nul(2)) None else Some(s2),
        if (nul(3)) None else Some(i1),
        if (nul(4)) None else Some(i2),
        if (nul(5)) None else Some(l1),
        if (nul(6)) None else Some(d1),
        if (nul(7)) None else Some(d2),
        if (nul(11)) None else Some(pr),
        if (nul(8)) None else Some(java.sql.Date.valueOf(dtL)),
        if (nul(9)) None else Some(java.sql.Date.valueOf(dt2L)),
        if (nul(10)) None else Some(java.sql.Timestamp.from(tsI)),
        if (nul(12)) None else Some(js))
    }
    data.toDF()
  }

  // ---------------------------------------------------------------
  // Catalog
  // ---------------------------------------------------------------

  private val s1 = col("s1"); private val s2 = col("s2")
  private val i1 = col("i1"); private val l1 = col("l1")
  private val d1 = col("d1"); private val d2 = col("d2")
  private val dt = col("dt"); private val dt2 = col("dt2")
  private val ts = col("ts")

  /** DuckDB spelling of pmod(x, m) for possibly-negative x. */
  private def dpmod(x: String, m: Int): String = s"((($x % $m) + $m) % $m)"

  def catalog: Seq[FuzzPair] = strings ++ hashes ++ regexes ++ maths ++
    bits ++ casts ++ dates ++ conditionals ++ arrays ++ windows ++
    decimals ++ tsArith ++ maps ++ structs ++ arraySorts ++ casings ++
    renders ++ regexes2 ++ strftimes ++ parses ++ intervals2 ++
    collations ++ jsonPaths ++ structRenders

  private def strings: Seq[FuzzPair] = Seq(
    FuzzPair("len_cp", length(s1), "length(s1)"),
    // FOUND divergence (FUZZ_SCALARS.md #1): Spark lowercases with
    // Java's FULL Unicode mappings — İ (U+0130) → "i" + combining dot
    // (2 code points) and contextual Final_Sigma (trailing Σ → ς) —
    // while DuckDB's utf8proc applies SIMPLE 1:1 mappings (İ → i,
    // Σ → σ always). The agreeing pair guards those two code points;
    // oracle SQL lowercasing text that may contain them must do the
    // same (the shipped corpus oracles lowercase ASCII-dominated text).
    FuzzPair("lower_u",
      when(!s1.rlike("[İΣ]"), lower(s1)),
      "CASE WHEN NOT regexp_matches(s1, '[İΣ]') THEN lower(s1) END"),
    // FOUND divergence (#2): Java FULL uppercase expands ß → "SS";
    // utf8proc's simple mapping gives the capital ẞ (U+1E9E).
    // Extended r14 (#17): the same full-vs-simple split hits the
    // LIGATURES — Java upper('ﬁ') → "FI", DuckDB keeps ﬁ (measured;
    // the titlecase digraphs ǅ/ǆ/ǉ AGREE — both map 1:1 to Ǆ/Ǆ/Ǉ).
    // Guard the expanding class: ß + the U+FB00-FB06 ligature block.
    FuzzPair("upper_u",
      when(!s1.rlike("[ßﬀ-ﬆ]"), upper(s1)),
      "CASE WHEN NOT regexp_matches(s1, '[ßﬀ-ﬆ]') " +
        "THEN upper(s1) END"),
    FuzzPair("substr_mid", substring(s1, 2, 3), "substr(s1, 2, 3)"),
    FuzzPair("substr_from", substring(s1, 3, Int.MaxValue),
      "substr(s1, 3)"),
    FuzzPair("trim_ws", trim(s1), "trim(s1)"),
    FuzzPair("ltrim_ws", ltrim(s1), "ltrim(s1)"),
    FuzzPair("rtrim_ws", rtrim(s1), "rtrim(s1)"),
    FuzzPair("lpad_pad", lpad(s1, 10, "*#"), "lpad(s1, 10, '*#')"),
    FuzzPair("rpad_cut", rpad(s1, 3, "-"), "rpad(s1, 3, '-')"),
    // FOUND divergence (#3): Spark reverses CODE POINTS (a combining
    // accent detaches from its base: "café"+U+0301 → "́efac"); DuckDB
    // reverses GRAPHEMES (the pair travels together). Equal on any
    // string with no combining marks — the guard below; queries that
    // reverse user text cross-engine must normalize (NFC) first.
    FuzzPair("reverse_cp",
      when(!s1.rlike("[\\x{0300}-\\x{036F}]"), reverse(s1)),
      "CASE WHEN NOT regexp_matches(s1, '[\\x{0300}-\\x{036F}]') " +
        "THEN reverse(s1) END"),
    FuzzPair("repeat3", repeat(s1, 3), "repeat(s1, 3)"),
    FuzzPair("left2", expr("left(s1, 2)"), "left(s1, 2)"),
    FuzzPair("right2", expr("right(s1, 2)"), "right(s1, 2)"),
    FuzzPair("instr_comma", instr(s1, ","),
      "CAST(strpos(s1, ',') AS INTEGER)"),
    FuzzPair("translate_x", translate(s1, "abc", "XYZ"),
      "translate(s1, 'abc', 'XYZ')"),
    FuzzPair("concat_pipe", concat(s1, s2), "(s1 || s2)"),
    FuzzPair("concat_ws_d", concat_ws("-", s1, s2),
      "concat_ws('-', s1, s2)"),
    FuzzPair("split_size", size(split(s1, ",", -1)),
      "CAST(len(string_split(s1, ',')) AS INTEGER)"),
    FuzzPair("split_first", element_at(split(s1, ",", -1), 1),
      "string_split(s1, ',')[1]"),
    FuzzPair("ascii_cp", ascii(s1),
      "CASE WHEN s1 = '' THEN 0 ELSE ord(s1) END"),
    FuzzPair("chr_ascii",
      expr("chr(32 + pmod(i1, 95))"),
      s"chr(CAST(32 + ${dpmod("i1", 95)} AS INTEGER))"),
    FuzzPair("substr_neg", substring(s1, -2, 2), "substr(s1, -2, 2)"),
    FuzzPair("like_pct", s1.like("%a_c%"), "(s1 LIKE '%a_c%')"),
    FuzzPair("chr_latin1", expr("chr(1 + pmod(i1, 255))"),
      s"chr(CAST(1 + ${dpmod("i1", 255)} AS INTEGER))"),
    // DuckDB concat() SKIPS NULL arguments (Spark's concat propagates
    // them — the concat_pipe pair above); Spark's null-skipping
    // spelling is concat_ws with an empty separator.
    FuzzPair("concat_skipnull", concat_ws("", s1, s2),
      "concat(s1, s2)"),
    FuzzPair("try_elem2", expr("try_element_at(split(s1, ',', -1), 2)"),
      "string_split(s1, ',')[2]"),
    FuzzPair("lev_ascii",
      levenshtein(regexp_replace(s1, "[^\\x20-\\x7E]", ""),
        regexp_replace(s2, "[^\\x20-\\x7E]", "")),
      "CAST(levenshtein(regexp_replace(s1, '[^\\x20-\\x7E]', '', 'g'), " +
        "regexp_replace(s2, '[^\\x20-\\x7E]', '', 'g')) AS INTEGER)"))

  private def hashes: Seq[FuzzPair] = Seq(
    FuzzPair("md5_hex", md5(s1), "md5(s1)"),
    FuzzPair("md5_key48",
      conv(substring(md5(s1), 1, 8), 16, 10).cast("long"),
      "CAST(('0x' || substr(md5(s1), 1, 8)) AS BIGINT)"),
    FuzzPair("sha256_hex", sha2(s1, 256), "sha256(s1)"))

  private def regexes: Seq[FuzzPair] = Seq(
    FuzzPair("re_extract", regexp_extract(s1, "([0-9]+)", 1),
      "regexp_extract(s1, '([0-9]+)', 1)"),
    FuzzPair("re_replace_g", regexp_replace(s1, "[0-9]", "#"),
      "regexp_replace(s1, '[0-9]', '#', 'g')"),
    // FOUND divergence (#18, r15 — the trailing-newline fixture row
    // exposed THIS pre-existing pair): Java's '$' also matches before
    // a FINAL newline ('tail\n' ~ '^[a-z]+$' → true), RE2's only at
    // end of text (→ false). \z anchors the absolute end IDENTICALLY
    // in both dialects — the agreeing spelling for any
    // whole-string-shaped oracle regex.
    FuzzPair("re_like", s1.rlike("^[A-Za-z0-9]+\\z"),
      "regexp_matches(s1, '^[A-Za-z0-9]+\\z')"),
    // dialect probes — every oracle SHARES its regex text across
    // engines (Java regex in Spark, RE2 in DuckDB), so the shared
    // subset's SEMANTICS must agree, not just its syntax:
    // '.' excludes \n in both default modes
    FuzzPair("re_dot_nl", s1.rlike("a.b"),
      "regexp_matches(s1, 'a.b')"),
    // \d and \w are ASCII-only in BOTH dialects (Arabic-Indic ٠١٢
    // must NOT match — the try_cast grammar fence leans on this)
    FuzzPair("re_digit_ascii", s1.rlike("^\\d+$"),
      "regexp_matches(s1, '^\\d+$')"),
    // \b word boundary around a unicode letter neighborhood
    FuzzPair("re_word_b", s1.rlike("\\babc\\b"),
      "regexp_matches(s1, '\\babc\\b')"),
    // \p{L} unicode letter class on CJK/Greek/astral
    FuzzPair("re_uniletter", regexp_replace(s1, "\\p{L}", "*"),
      "regexp_replace(s1, '\\p{L}', '*', 'g')"),
    // (?i) case-insensitive fold on ASCII + the ß/K special-casing
    // zone — simple folding in both dialects
    FuzzPair("re_ci", s1.rlike("(?i)^stra"),
      "regexp_matches(s1, '(?i)^stra')"))

  private def maths: Seq[FuzzPair] = Seq(
    FuzzPair("pmod7", pmod(i1, lit(7)), s"CAST(${dpmod("i1", 7)} AS INTEGER)"),
    FuzzPair("mod_trunc", i1 % 7, "(i1 % 7)"),
    FuzzPair("abs_l",
      when(l1 =!= Long.MinValue, abs(l1)),
      "CASE WHEN l1 <> -9223372036854775808 THEN abs(l1) END"),
    // FOUND divergence (#4): signum(NaN) = NaN in Spark (Java
    // Math.signum); sign(NaN) = 0 in DuckDB. Guard NaN; a query whose
    // sign() input can be NaN must decide which contract it wants.
    FuzzPair("sign_d", when(!isnan(d1), signum(d1)),
      "CASE WHEN NOT isnan(d1) THEN CAST(sign(d1) AS DOUBLE) END"),
    FuzzPair("floor_g", when(abs(d1) < 1e15, floor(d1)),
      "CASE WHEN abs(d1) < 1e15 THEN CAST(floor(d1) AS BIGINT) END"),
    FuzzPair("ceil_g", when(abs(d1) < 1e15, ceil(d1)),
      "CASE WHEN abs(d1) < 1e15 THEN CAST(ceil(d1) AS BIGINT) END"),
    FuzzPair("sqrt_g", when(d1 >= 0, sqrt(d1)),
      "CASE WHEN d1 >= 0 THEN sqrt(d1) END"),
    FuzzPair("exp_u", exp(d1), "exp(d1)", "ulp:4"),
    FuzzPair("ln_g", when(d1 > 0, log(d1)),
      "CASE WHEN d1 > 0 THEN ln(d1) END", "ulp:4"),
    FuzzPair("log10_g", when(d1 > 0, log10(d1)),
      "CASE WHEN d1 > 0 THEN log10(d1) END", "ulp:4"),
    FuzzPair("log2_g", when(d1 > 0, log2(d1)),
      "CASE WHEN d1 > 0 THEN log2(d1) END", "ulp:4"),
    FuzzPair("pow_sq", pow(d1, 2.0), "pow(d1, 2)", "ulp:2"),
    FuzzPair("pow_xy",
      when(d1 > 0 && abs(d2) < 100, pow(d1, d2)),
      "CASE WHEN d1 > 0 AND abs(d2) < 100 THEN pow(d1, d2) END", "ulp:4"),
    FuzzPair("cos_u", when(abs(d1) < 1e8, cos(d1)),
      "CASE WHEN abs(d1) < 1e8 THEN cos(d1) END", "ulp:4"),
    FuzzPair("sin_u", when(abs(d1) < 1e8, sin(d1)),
      "CASE WHEN abs(d1) < 1e8 THEN sin(d1) END", "ulp:4"),
    FuzzPair("atan2_u", atan2(d1, d2), "atan2(d1, d2)", "ulp:4"),
    FuzzPair("cbrt_u", cbrt(d1), "cbrt(d1)", "ulp:4"),
    FuzzPair("greatest_d", greatest(d1, d2), "greatest(d1, d2)"),
    FuzzPair("least_d", least(d1, d2), "least(d1, d2)"),
    // the fsum fixed-point term every double-sum oracle rides:
    // floor(x·1e6) as BIGINT — scientific literals on the DuckDB side
    // by the documented 864e2 rule (plain decimals parse as DECIMAL)
    FuzzPair("fsum_term", when(abs(d1) < 1e6, floor(d1 * 1e6)),
      "CASE WHEN abs(d1) < 1e6 THEN CAST(floor(d1 * 1e6) AS BIGINT) END"),
    FuzzPair("int_div", expr("i1 div 7"),
      "CAST(trunc(CAST(i1 AS DOUBLE) / 7) AS BIGINT)"),
    // FOUND divergence (#7): round(x, 2) disagrees two ways — Spark
    // rounds the SHORTEST DECIMAL RENDERING via BigDecimal (0.285
    // renders as "0.285" → HALF_UP → 0.29) while DuckDB rounds the
    // exact binary value (0.28499999999999998 → 0.28), and above
    // ~1e13 the engines' different scale-2 pipelines disagree in the
    // last ulp. The cross-engine-exact spelling composes IEEE-exact
    // primitives identically on both sides — the same reasoning as
    // the fsum idiom (oracles avoid round() entirely):
    FuzzPair("round_idiom",
      when(abs(d1) < 1e13, floor(d1 * 100 + 0.5) / 100),
      "CASE WHEN abs(d1) < 1e13 THEN floor(d1 * 100 + 0.5) / 100 END"),
    // …but round(x, 1) on PRICE-SHAPED doubles (exact two-decimal
    // renderings, the TPC-H money shape q22 rounds) is cross-engine
    // EXACT: exhaustively verified over every halfway value x.x5 in
    // 0.95..110,000 (1,099,910 values, 0 diverging — FUZZ_SCALARS.md),
    // because a two-decimal value's ·10 lands on-or-above the binary
    // halfway point wherever its shortest rendering says 5.
    FuzzPair("round_price1", round(col("pr"), 1), "round(pr, 1)"))

  private def bits: Seq[FuzzPair] = Seq(
    FuzzPair("bitcount_l", bit_count(l1),
      "CAST(bit_count(l1) AS INTEGER)"),
    FuzzPair("shl_masked", shiftleft(l1.bitwiseAND(lit(255L)), 3),
      "((l1 & 255) << 3)"),
    FuzzPair("shr_arith", shiftright(l1, 3), "(l1 >> 3)"),
    FuzzPair("xor_mask", l1.bitwiseXOR(lit(0x5DEECE66DL)),
      "xor(l1, 25214903917)"))

  private def casts: Seq[FuzzPair] = Seq(
    // FOUND divergence (#5): DuckDB's VARCHAR→INTEGER cast parses and
    // ROUNDS decimals ('3.14' → 3), accepts scientific notation
    // ('-2.5e3' → -2500) and hex ('0x1A' → 26); Spark's ANSI cast is
    // strict-integral (all three → NULL under try_cast). The agreeing
    // spelling pre-validates the integral grammar on the DuckDB side —
    // the idiom an oracle must use when casting free text to INT.
    FuzzPair("trycast_int", expr("try_cast(s1 AS INT)"),
      "CASE WHEN regexp_matches(s1, '^\\s*[+-]?[0-9]+\\s*$') " +
        "THEN TRY_CAST(s1 AS INTEGER) END"),
    // FOUND divergence (#6): Java's parseDouble accepts the 'd'/'f'
    // float-literal suffix ('3d' → 3.0) and hex-float syntax; DuckDB
    // rejects both. Both engines agree on 'Infinity'/'NaN'/overflow-
    // to-Infinity ('1e309'). Guard the suffix forms.
    FuzzPair("trycast_dbl",
      when(!s1.rlike("(?i)[dfx]"), expr("try_cast(s1 AS DOUBLE)")),
      "CASE WHEN NOT regexp_matches(s1, '(?i)[dfx]') " +
        "THEN TRY_CAST(s1 AS DOUBLE) END"),
    FuzzPair("dtoi_trunc",
      when(abs(d1) < 1e9, d1.cast("int")),
      "CASE WHEN abs(d1) < 1e9 THEN CAST(trunc(d1) AS INTEGER) END"),
    FuzzPair("itos", i1.cast("string"), "CAST(i1 AS VARCHAR)"),
    FuzzPair("ltos", l1.cast("string"), "CAST(l1 AS VARCHAR)"),
    // FOUND divergence (#10): Spark's to_json OMITS null struct
    // fields by default ({"a":1,"s":"x"}); DuckDB renders them
    // ("b":null). The agreeing spelling is Spark's
    // ignoreNullFields=false option — and it must ride a NULL
    // passthrough: DuckDB's struct_pack is never NULL, while Spark's
    // to_json of a null-free struct always renders, so null INPUTS
    // only agree because both sides render them as "null" literals
    FuzzPair("j_struct",
      to_json(struct(i1.as("i"), s1.as("s")),
        Map("ignoreNullFields" -> "false")),
      "to_json(struct_pack(i := i1, s := s1))::VARCHAR"),
    // FOUND divergence (#8), measured precisely: each engine accepts
    // special DATE strings the other rejects. DuckDB-only: 'infinity'
    // / '-infinity' (PostgreSQL special values — 'Infinity' from the
    // double pool parses as DATE infinity; Spark → NULL). Spark-only:
    // 'now' / 'today' / 'yesterday' / 'tomorrow' (DuckDB's TRY_CAST →
    // NULL) — and those are CLOCK-DEPENDENT, so casting free text to
    // DATE is nondeterministic in Spark: a document containing
    // "tomorrow" parses to a different date every day. 'epoch' agrees
    // (1970-01-01 in both) and stays compared. Any oracle casting
    // uncontrolled text to DATE needs this guard.
    FuzzPair("trycast_date",
      when(!lower(trim(s1)).rlike(
        "^(-?infinity|now|today|yesterday|tomorrow)$"),
        expr("try_cast(s1 AS DATE)")),
      "CASE WHEN NOT regexp_matches(lower(trim(s1)), " +
        "'^(-?infinity|now|today|yesterday|tomorrow)$') " +
        "THEN TRY_CAST(s1 AS DATE) END"))

  private def dates: Seq[FuzzPair] = Seq(
    FuzzPair("dtrunc_mon_us", unix_micros(date_trunc("month", ts)),
      "epoch_us(date_trunc('month', ts))"),
    FuzzPair("dtrunc_week_us", unix_micros(date_trunc("week", ts)),
      "epoch_us(date_trunc('week', ts))"),
    FuzzPair("dtrunc_day_us", unix_micros(date_trunc("day", ts)),
      "epoch_us(date_trunc('day', ts))"),
    FuzzPair("ddiff_days", datediff(dt2, dt),
      "CAST(datediff('day', dt, dt2) AS INTEGER)"),
    FuzzPair("dadd_i", date_add(dt, pmod(i1, lit(365))),
      s"(dt + CAST(${dpmod("i1", 365)} AS INTEGER))"),
    FuzzPair("ymd_int",
      year(dt) * 10000 + month(dt) * 100 + dayofmonth(dt),
      "CAST(year(dt) * 10000 + month(dt) * 100 + day(dt) AS INTEGER)"),
    FuzzPair("dow_sun1", dayofweek(dt),
      "CAST(dayofweek(dt) + 1 AS INTEGER)"),
    FuzzPair("last_day_m", last_day(dt), "last_day(dt)"),
    FuzzPair("add_months_c", add_months(dt, 13),
      "CAST(dt + INTERVAL 13 MONTH AS DATE)"),
    FuzzPair("unix_date_d", unix_date(dt),
      "CAST(dt - DATE '1970-01-01' AS INTEGER)"),
    FuzzPair("sec_of_day",
      hour(ts) * 3600 + minute(ts) * 60 + second(ts),
      "CAST(hour(ts) * 3600 + minute(ts) * 60 + " +
        "CAST(floor(date_part('second', ts)) AS INTEGER) AS INTEGER)"),
    FuzzPair("epoch_us_ts", unix_micros(ts), "epoch_us(ts)"),
    FuzzPair("date_fmt", date_format(ts, "yyyy-MM-dd HH:mm:ss"),
      "strftime(ts, '%Y-%m-%d %H:%M:%S')"))

  private def conditionals: Seq[FuzzPair] = Seq(
    FuzzPair("coalesce_sx", coalesce(s1, s2, lit("?")),
      "coalesce(s1, s2, '?')"),
    FuzzPair("nullif7", nullif(i1, lit(7)), "nullif(i1, 7)"),
    FuzzPair("cmp_gt01", when(d1 > d2, 1).otherwise(0),
      "CASE WHEN d1 > d2 THEN 1 ELSE 0 END"),
    FuzzPair("in_list", s1.isin("a", "abc",
      "日本語のテキスト"),
      "s1 IN ('a', 'abc', '日本語のテキスト')"),
    FuzzPair("between_d", d1.between(-1.0, 1.5),
      "(d1 BETWEEN -1.0 AND 1.5)"))

  /** Array / higher-order-function pairs, both sides deriving the
    * SAME array from the string columns (`split` on comma) so no
    * array column needs cross-engine parquet agreement. Outputs are
    * scalarized (sums/counts/joins/element picks) — it's the lambda
    * and list SEMANTICS under test, not array rendering. */
  private def arrays: Seq[FuzzPair] = Seq(
    FuzzPair("a_hof_sumlen",
      expr("aggregate(split(s1, ',', -1), 0, (a, x) -> a + length(x))"),
      "CAST(list_sum(list_transform(string_split(s1, ','), " +
        "x -> length(x))) AS INTEGER)"),
    FuzzPair("a_filter_cnt",
      size(expr("filter(split(s1, ',', -1), x -> length(x) > 1)")),
      "CAST(len(list_filter(string_split(s1, ','), " +
        "x -> length(x) > 1)) AS INTEGER)"),
    FuzzPair("a_max_len",
      expr("array_max(transform(split(s1, ',', -1), x -> length(x)))"),
      "CAST(list_max(list_transform(string_split(s1, ','), " +
        "x -> length(x))) AS INTEGER)"),
    // UTF-8-byte sort inside arrays — same collation law as min/max
    FuzzPair("a_sort_first",
      element_at(array_sort(split(s1, ",", -1)), 1),
      "list_sort(string_split(s1, ','))[1]"),
    FuzzPair("a_join_pipe", array_join(split(s1, ",", -1), "|"),
      "array_to_string(string_split(s1, ','), '|')"),
    FuzzPair("a_distinct_cnt", size(array_distinct(split(s1, ",", -1))),
      "CAST(len(list_distinct(string_split(s1, ','))) AS INTEGER)"),
    FuzzPair("a_contains", array_contains(split(s1, ",", -1), "a"),
      "list_contains(string_split(s1, ','), 'a')"),
    // FOUND divergence (#9): joining an EMPTY list yields '' in Spark
    // (array_join) but NULL in DuckDB (array_to_string) — invisible
    // until a slice/filter can empty the array (split itself never
    // returns []). Agreeing spelling: coalesce the DuckDB join to ''
    // behind an explicit IS NULL passthrough for the null-input row.
    FuzzPair("a_slice_join",
      array_join(slice(split(s1, ",", -1), 2, 2), "|"),
      "CASE WHEN s1 IS NULL THEN NULL ELSE coalesce(" +
        "array_to_string(list_slice(string_split(s1, ','), 2, 3), " +
        "'|'), '') END"))

  /** Window-function semantics over the whole fixture (the layer
    * q15–q17/q56/q91/q118's oracles ride, here driven over hostile
    * ordering keys: NULLs every 13th row, NaN/±Inf in d1, heavy ties
    * in i2). The one spelling rule this family exists to pin: Spark's
    * ascending sort defaults to NULLS FIRST, DuckDB's to NULLS LAST —
    * every DuckDB ORDER BY over a nullable key needs the explicit
    * NULLS FIRST the shipped oracles already carry (q78/q123/q56).
    * NaN needs no spelling: both engines order it above +Infinity. */
  private def windows: Seq[FuzzPair] = {
    import org.apache.spark.sql.expressions.Window
    val byId = Window.orderBy(col("id"))
    val cum = byId.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Seq(
      FuzzPair("w_rn_nulls",
        row_number().over(Window.orderBy(col("d1").asc, col("id"))),
        "CAST(row_number() OVER " +
          "(ORDER BY d1 ASC NULLS FIRST, id) AS INTEGER)"),
      FuzzPair("w_rank_ties",
        rank().over(Window.orderBy(col("i2").asc)),
        "CAST(rank() OVER (ORDER BY i2 ASC NULLS FIRST) AS INTEGER)"),
      FuzzPair("w_drank_ties",
        dense_rank().over(Window.orderBy(col("i2").asc)),
        "CAST(dense_rank() OVER (ORDER BY i2 ASC NULLS FIRST) AS INTEGER)"),
      FuzzPair("w_pctrank_ties",
        percent_rank().over(Window.orderBy(col("i2").asc)),
        "percent_rank() OVER (ORDER BY i2 ASC NULLS FIRST)"),
      FuzzPair("w_cumedist_ties",
        cume_dist().over(Window.orderBy(col("i2").asc)),
        "cume_dist() OVER (ORDER BY i2 ASC NULLS FIRST)"),
      FuzzPair("w_ntile7", ntile(7).over(byId),
        "CAST(ntile(7) OVER (ORDER BY id) AS INTEGER)"),
      FuzzPair("w_lag_def", lag(col("d1"), 2, -1.0).over(byId),
        "lag(d1, 2, -1.0) OVER (ORDER BY id)"),
      FuzzPair("w_lead_def", lead(col("s1"), 3, "?").over(byId),
        "lead(s1, 3, '?') OVER (ORDER BY id)"),
      FuzzPair("w_runsum", sum(col("i2").cast("long")).over(cum),
        "CAST(sum(CAST(i2 AS BIGINT)) OVER (ORDER BY id ROWS BETWEEN " +
          "UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"),
      FuzzPair("w_first_ign",
        first(col("d1"), ignoreNulls = true).over(cum),
        "first_value(d1 IGNORE NULLS) OVER (ORDER BY id ROWS BETWEEN " +
          "UNBOUNDED PRECEDING AND CURRENT ROW)"),
      // interval RANGE frame over the price key: peers resolve by
      // VALUE (each NULL-keyed row's frame is the whole NULL group in
      // both engines; NULLS FIRST only places the group)
      FuzzPair("w_range_pr",
        count(lit(1)).over(Window.orderBy(col("pr"))
          .rangeBetween(-1L, 1L)),
        "CAST(count(*) OVER (ORDER BY pr ASC NULLS FIRST RANGE BETWEEN " +
          "1 PRECEDING AND 1 FOLLOWING) AS BIGINT)")) ++ aggregates
  }

  /** Aggregate semantics probed through PARTITION BY windows (one
    * value per row rides the same keyed compare; the aggregates here
    * are order-INSENSITIVE, so partition-internal row order — the one
    * thing the engines never promise each other — cannot matter;
    * order-sensitive double sums stay behind the fsum idiom). What
    * this family pins, beyond the functions themselves: GROUPING-KEY
    * equality classes. Partitioning BY the hostile double column
    * directly asks whether -0.0 joins 0.0's group and all NaN
    * bit-patterns one group (both engines: yes — Spark normalizes on
    * write into the hash, DuckDB's grouping equality does the same),
    * and partitioning by raw strings asks whether either engine
    * Unicode-normalizes keys (neither does: café NFC and café NFD are
    * TWO groups in both — byte equality, the contract the exact-dedup
    * family assumes). */
  private def aggregates: Seq[FuzzPair] = {
    import org.apache.spark.sql.expressions.Window
    val g = Window.partitionBy(pmod(col("id"), lit(7)))
    Seq(
      FuzzPair("g_cnt_by_d1",
        count(lit(1)).over(Window.partitionBy(col("d1"))),
        "CAST(count(*) OVER (PARTITION BY d1) AS BIGINT)"),
      FuzzPair("g_cnt_by_s1",
        count(lit(1)).over(Window.partitionBy(col("s1"))),
        "CAST(count(*) OVER (PARTITION BY s1) AS BIGINT)"),
      FuzzPair("g_min_d", min(col("d2")).over(g),
        "min(d2) OVER (PARTITION BY (id % 7))"),
      FuzzPair("g_max_d", max(col("d2")).over(g),
        "max(d2) OVER (PARTITION BY (id % 7))"),
      FuzzPair("g_min_s", min(col("s1")).over(g),
        "min(s1) OVER (PARTITION BY (id % 7))"),
      FuzzPair("g_max_s", max(col("s1")).over(g),
        "max(s1) OVER (PARTITION BY (id % 7))"),
      FuzzPair("g_bool_or", expr("bool_or(i2 > 0)").over(g),
        "bool_or(i2 > 0) OVER (PARTITION BY (id % 7))"),
      FuzzPair("g_bit_and", expr("bit_and(l1)").over(g),
        "CAST(bit_and(l1) OVER (PARTITION BY (id % 7)) AS BIGINT)"),
      FuzzPair("g_bit_xor", expr("bit_xor(l1)").over(g),
        "CAST(bit_xor(l1) OVER (PARTITION BY (id % 7)) AS BIGINT)"),
      // integer-valued doubles sum exactly in ANY accumulation order,
      // so avg is the one safe raw-double aggregate (the general case
      // stays behind fsum)
      FuzzPair("g_avg_i2", avg(col("i2")).over(g),
        "avg(i2) OVER (PARTITION BY (id % 7))"))
  }

  /** DECIMAL precision/scale/rounding/overflow (round 13 — the first
    * of the three vocabularies the r12 verdict listed as uncovered).
    * Results are compared RENDERED (CAST AS STRING/VARCHAR): decimal
    * rendering carries the scale, so a scale-rule divergence reads as
    * a string mismatch instead of hiding behind a float compare.
    * Guards: NaN is excluded wherever a double reaches a DECIMAL cast
    * — DuckDB's TRY_CAST(NaN AS DECIMAL) is an ERROR, not NULL
    * (measured; ±Infinity → NULL in both) — and Spark's plain CAST
    * overflow THROWS under ANSI, so overflow probes ride TRY_CAST on
    * both sides. */
  private def decimals: Seq[FuzzPair] = {
    val prD = "CAST(pr AS DECIMAL(18,2))" // price-shaped: always fits
    Seq(
      // exact-2-decimal doubles cast losslessly and render with the
      // declared scale in both engines
      FuzzPair("dec_cast_pr", expr(s"CAST($prD AS STRING)"),
        s"CAST($prD AS VARCHAR)"),
      // FOUND divergence (#15): double → DECIMAL rounding of a value
      // INEXACT at the target scale is engine-specific in BOTH
      // direction and regime — Spark always rounds the SHORTEST
      // RENDERING (0.285 → 0.29, 878947987312.1365 → .137,
      // 1e15+0.5 → .500); DuckDB agrees at small magnitudes
      // (0.285 → 0.29) yet rounds the exact binary elsewhere
      // (…312.1365 → .136) and scales in binary at the top
      // (1e15+0.5 → .512) — no single rule reproduces it. The
      // agreeing domain is doubles EXACT at the target scale (x·10^k
      // integral — the price-column contract); anything else must be
      // rounded explicitly first via the domain-free
      // floor(x·10^k + 0.5)/10^k idiom (divergence #7). NaN guarded
      // null-safely: DuckDB's TRY_CAST(NaN AS DECIMAL) ERRORS, and
      // Spark's isnan(NULL) is false while DuckDB's is NULL.
      FuzzPair("dec_cast_d3",
        when(d1.isNotNull && !isnan(d1) && abs(d1) < 1e12 &&
          d1 * 1000 === floor(d1 * 1000),
          expr("CAST(TRY_CAST(d1 AS DECIMAL(20,3)) AS STRING)")),
        "CASE WHEN d1 IS NOT NULL AND NOT isnan(d1) AND abs(d1) < 1e12 " +
          "AND d1 * 1000 = floor(d1 * 1000) " +
          "THEN CAST(TRY_CAST(d1 AS DECIMAL(20,3)) AS VARCHAR) END"),
      FuzzPair("dec_add_i", expr(s"CAST($prD + CAST(i2 AS DECIMAL(10,0)) AS STRING)"),
        s"CAST($prD + CAST(i2 AS DECIMAL(10,0)) AS VARCHAR)"),
      FuzzPair("dec_mul_i", expr(s"CAST($prD * CAST(i2 AS DECIMAL(10,0)) AS STRING)"),
        s"CAST($prD * CAST(i2 AS DECIMAL(10,0)) AS VARCHAR)"),
      // FOUND divergence (#11): DECIMAL division disagrees on the
      // RESULT SCALE — Spark's rule gives scale 13 ("0.3333333333333"),
      // DuckDB scale 16 ("0.3333333333333333") — and POST-ROUNDING
      // does NOT repair it: round(q, 6) double-rounds through the two
      // scales and flips a measured halfway case (34660.35 / -96 →
      // -361.045313 vs -361.045312). The portable ratio idiom divides
      // as DOUBLE (bit-identical IEEE in both engines), which is what
      // every shipped oracle's ratio columns already do.
      FuzzPair("dec_div_dbl",
        expr(s"CAST($prD AS DOUBLE) / " +
          "nullif(CAST(CAST(i2 AS DECIMAL(10,0)) AS DOUBLE), 0.0)"),
        s"CAST($prD AS DOUBLE) / " +
          "nullif(CAST(CAST(i2 AS DECIMAL(10,0)) AS DOUBLE), 0.0)"),
      // round(DECIMAL, k) is HALF-AWAY-FROM-ZERO in both engines
      // (measured: -2.5 → -3 both) — unlike round(double, k), where
      // they diverge (#7); negated to cover the away-from-zero side
      FuzzPair("dec_round1", expr(s"CAST(round($prD, 1) AS STRING)"),
        s"CAST(round($prD, 1) AS VARCHAR)"),
      FuzzPair("dec_round_neg", expr(s"CAST(round(-$prD, 1) AS STRING)"),
        s"CAST(round(-$prD, 1) AS VARCHAR)"),
      // overflow posture: TRY_CAST → NULL in both (Spark's plain CAST
      // throws under ANSI; DuckDB's errors too). The NaN guard must be
      // null-safe: Spark's isnan(NULL) = false but DuckDB's = NULL,
      // so a bare NOT isnan(d1) guard itself diverges on NULL inputs
      // (found by this pair's first run)
      FuzzPair("dec_ovf_try",
        when(d1.isNotNull && !isnan(d1),
          expr("TRY_CAST(d1 * 1e12 AS DECIMAL(18,2)) IS NULL")),
        "CASE WHEN d1 IS NOT NULL AND NOT isnan(d1) THEN " +
          "TRY_CAST(d1 * 1e12 AS DECIMAL(18,2)) IS NULL END"),
      // decimal → double round-trip of an exactly-representable value
      FuzzPair("dec_to_dbl", expr(s"CAST($prD AS DOUBLE)"),
        s"CAST($prD AS DOUBLE)"),
      // exact decimal SUM — the aggregation every money column wants;
      // order-insensitive (integer arithmetic underneath), so it can
      // ride the raw partition window where double sums need fsum
      FuzzPair("dec_sum_w",
        expr(s"CAST(sum($prD) OVER (PARTITION BY (id % 7)) AS STRING)"),
        s"CAST(sum($prD) OVER (PARTITION BY (id % 7)) AS VARCHAR)"))
  }

  /** Timestamp/interval arithmetic beyond the DATE specials (round 13,
    * vocabulary 2 of 3). The fixture's `ts` is micros-resolution in a
    * UTC session (TIMESTAMP_NTZ-like semantics — no DST anywhere), so
    * these probe ARITHMETIC, not zone rules. */
  private def tsArith: Seq[FuzzPair] = Seq(
    // month addition clamps to month-end in BOTH engines (2024-01-31
    // + 1 month = 2024-02-29 10:00, measured); offset spans ±12
    FuzzPair("ts_add_mon",
      expr("timestampadd(MONTH, CAST(pmod(i1, 25) AS INT) - 12, ts)"),
      s"(ts + to_months(CAST(${dpmod("i1", 25)} - 12 AS INTEGER)))"),
    FuzzPair("ts_add_hr",
      expr("timestampadd(HOUR, CAST(pmod(i2, 1000) AS INT) - 500, ts)"),
      s"(ts + to_hours(CAST(${dpmod("i2", 1000)} - 500 AS BIGINT)))"),
    FuzzPair("ts_add_min",
      expr("timestampadd(MINUTE, CAST(pmod(l1, 10000) AS INT) - 5000, ts)"),
      s"(ts + to_minutes(CAST(${dpmod("l1", 10000)} - 5000 AS BIGINT)))"),
    // FOUND divergence (#12): Spark's timestampdiff counts COMPLETE
    // months (Jan-15 → Feb-14 = 0); DuckDB's datediff counts month
    // BOUNDARY CROSSINGS (= 1). The agreeing boundary-crossing
    // spelling is the year*12+month difference — the idiom the
    // shipped oracles' month bucketing already uses
    FuzzPair("mon_cross",
      (year(dt2) * 12 + month(dt2)) - (year(dt) * 12 + month(dt)),
      "CAST(datediff('month', dt, dt2) AS INTEGER)"),
    // day-grain diff at midnight anchors: complete days == crossings
    // when both ends are midnight, so date-cast inputs agree
    FuzzPair("ts_diff_day_mid",
      expr("timestampdiff(DAY, CAST(dt AS TIMESTAMP), " +
        "CAST(dt2 AS TIMESTAMP))"),
      "CAST(datediff('day', dt, dt2) AS BIGINT)"),
    // FOUND divergence (#13): Spark's unix_timestamp TRUNCATES the
    // fractional second TOWARD ZERO (1969-12-31 23:59:59.5 → 0);
    // DuckDB's floor(epoch()) floors (→ -1). They agree from the
    // epoch onward — the guard any oracle turning timestamps into
    // whole seconds needs when pre-epoch data is possible
    FuzzPair("unixsec_guard",
      when(ts >= lit("1970-01-01 00:00:00").cast("timestamp"),
        unix_timestamp(ts)),
      "CASE WHEN ts >= TIMESTAMP '1970-01-01 00:00:00' THEN " +
        "CAST(floor(epoch(ts)) AS BIGINT) END"),
    FuzzPair("dtrunc_q_us", unix_micros(date_trunc("quarter", ts)),
      "epoch_us(date_trunc('quarter', ts))"),
    FuzzPair("dtrunc_y_us", unix_micros(date_trunc("year", ts)),
      "epoch_us(date_trunc('year', ts))"),
    FuzzPair("quarter_i", quarter(dt), "CAST(quarter(dt) AS INTEGER)"),
    // ISO week-numbering year: Spark extract(YEAROFWEEK) == DuckDB
    // isoyear (2021-01-01 → 2020 in both)
    FuzzPair("isoyear_i", expr("extract(YEAROFWEEK FROM dt)"),
      "CAST(isoyear(dt) AS INTEGER)"),
    FuzzPair("weekiso_i", weekofyear(dt),
      "CAST(weekofyear(dt) AS INTEGER)"))

  /** Map functions (round 13, vocabulary 3 of 3). Maps are built from
    * the string column's comma tokens with an INDEX-SUFFIXED key
    * (`tok#i`) so keys are unique by construction: BOTH engines
    * reject duplicate keys at map construction (Spark
    * DUPLICATED_MAP_KEY under the default EXCEPTION dedup policy,
    * DuckDB "Map keys must be unique") — but they DIVERGE on
    * map_concat (FOUND #14): Spark throws on a duplicate ACROSS the
    * inputs, DuckDB last-wins silently, so cross-map dedup must be
    * resolved before map_concat in any portable pipeline. Extraction
    * differs in SHAPE, not semantics: Spark element_at → value/NULL;
    * DuckDB map[k] → LIST, so the agreeing spelling indexes it
    * (`m[k][1]`, OOB → NULL). Key ORDER is insertion order in both
    * (measured — map_keys never sorts). */
  private def maps: Seq[FuzzPair] = {
    // Spark: transform((x, i) => ...) exposes the 0-based index;
    // DuckDB list lambdas have no index param — ride range() instead
    val mSpark = "map_from_arrays(" +
      "transform(split(s1, ','), (x, i) -> concat(x, '#', i)), " +
      "sequence(1, size(split(s1, ','))))"
    val mDuck = "map(" +
      "list_transform(range(1, len(string_split(s1, ',')) + 1), " +
      "i -> string_split(s1, ',')[i] || '#' || CAST(i - 1 AS VARCHAR)), " +
      "list_transform(range(1, len(string_split(s1, ',')) + 1), i -> i))"
    Seq(
      FuzzPair("mp_card", expr(s"cardinality($mSpark)"),
        s"CAST(cardinality($mDuck) AS INTEGER)"),
      // present-key lookup: the first token's key always maps to 1,
      // so probe a VARYING key — 'a#0' hits only when s1 starts 'a,'
      FuzzPair("mp_get_a0", expr(s"element_at($mSpark, 'a#0')"),
        s"($mDuck['a#0'])[1]"),
      FuzzPair("mp_get_missing",
        expr(s"element_at($mSpark, 'zz#99') IS NULL"),
        s"(($mDuck['zz#99'])[1]) IS NULL"),
      // insertion order is the key order in both engines
      FuzzPair("mp_keys_join",
        expr(s"array_join(map_keys($mSpark), '|')"),
        s"array_to_string(map_keys($mDuck), '|')"),
      FuzzPair("mp_vals_sum",
        expr(s"aggregate(map_values($mSpark), 0, (a, x) -> a + x)"),
        s"CAST(list_sum(map_values($mDuck)) AS INTEGER)"),
      // concat with DISJOINT key spaces (suffix sets differ) — the
      // only portable map_concat (see the dochead divergence note)
      FuzzPair("mp_concat_card",
        expr("cardinality(map_concat(" +
          "map_from_arrays(array(concat(coalesce(s2, '~'), '#a')), array(1)), " +
          "map_from_arrays(array(concat(coalesce(s2, '~'), '#b')), array(2))))"),
        "CAST(cardinality(map_concat(" +
          "map([coalesce(s2, '~') || '#a'], [1]), " +
          "map([coalesce(s2, '~') || '#b'], [2]))) AS INTEGER)"))
  }

  /** Struct/row comparison and ordering (round 14, vocabulary 1 of 4
    * from the r13 verdict list). Both engines compare structs
    * lexicographically by field position; the axes probed here are
    * NULL-FIELD placement inside the comparison (Spark sorts a null
    * field FIRST like its ASC default; DuckDB's nested comparisons
    * treat NULL as the LARGEST value, like its NULLS-LAST default)
    * and null-field EQUALITY (both engines: null fields compare
    * EQUAL inside a struct — IS NOT DISTINCT semantics, unlike
    * top-level `=`). Struct-typed RESULTS never cross the compare
    * harness (dict-vs-Row rendering would diff spuriously) — every
    * pair extracts a scalar. */
  private def structs: Seq[FuzzPair] = Seq(
    // equality: agreeing domain is all-fields-non-null (DuckDB's
    // nested-null `=` returns NULL — measured; Spark's nested
    // comparison treats null fields as ordering values)
    FuzzPair("st_eq_cross",
      when(i1.isNotNull && col("i2").isNotNull,
        expr("named_struct('a', i1, 'b', i2) = named_struct('a', i2, 'b', i1)")),
      "CASE WHEN i1 IS NOT NULL AND i2 IS NOT NULL THEN " +
        "({'a': i1, 'b': i2} = {'a': i2, 'b': i1}) END"),
    // ordering comparison: agreeing domain is all-fields-non-null
    // (see the null-placement law in the dochead)
    FuzzPair("st_lt_nn",
      when(i1.isNotNull && col("i2").isNotNull && l1.isNotNull,
        expr("named_struct('a', i2, 'b', l1) < named_struct('a', i1, 'b', l1)")),
      "CASE WHEN i1 IS NOT NULL AND i2 IS NOT NULL AND l1 IS NOT NULL " +
        "THEN ({'a': i2, 'b': l1} < {'a': i1, 'b': l1}) END"),
    // the deterministic ARGMIN idiom: min over a (key, tiebreak)
    // struct, then extract — the portable replacement for min_by's
    // unspecified ties; key guarded non-null (null-field placement
    // diverges, dochead)
    FuzzPair("st_argmin_w",
      expr("(min(CASE WHEN i2 IS NOT NULL THEN " +
        "named_struct('k', i2, 'id', id) END) " +
        "OVER (PARTITION BY (id % 7))).id"),
      "(min(CASE WHEN i2 IS NOT NULL THEN {'k': i2, 'id': id} END) " +
        "OVER (PARTITION BY (id % 7))).id"),
    FuzzPair("st_argmax_w",
      expr("(max(CASE WHEN pr IS NOT NULL THEN " +
        "named_struct('k', pr, 'id', id) END) " +
        "OVER (PARTITION BY (id % 7))).id"),
      "(max(CASE WHEN pr IS NOT NULL THEN {'k': pr, 'id': id} END) " +
        "OVER (PARTITION BY (id % 7))).id"),
    // ORDER BY a struct key end-to-end: rank by (i2, id) through a
    // struct vs the flat two-key spelling on the DuckDB side — pins
    // that struct ordering is exactly field-lexicographic. The
    // trailing bare `id` key is load-bearing: the NULL-struct rows
    // (null i2) are 315 EQUAL keys, and row_number among ties is
    // nondeterministic in both engines (measured: Spark scattered
    // them) — every rank oracle needs a total order
    FuzzPair("st_rank_w",
      expr("row_number() OVER (ORDER BY CASE WHEN i2 IS NOT NULL THEN " +
        "named_struct('k', i2, 'id', id) END ASC NULLS FIRST, id ASC)"),
      "CAST(row_number() OVER (ORDER BY (i2 IS NOT NULL) ASC, i2 ASC, " +
        "id ASC) AS INTEGER)"))

  /** array_sort null-ordering + comparator lambdas (round 14,
    * vocabulary 2 of 4). The null-ordering law: Spark's array_sort
    * puts nulls LAST, sort_array(asc) puts them FIRST,
    * sort_array(desc) LAST — DuckDB's list_sort takes both modifiers
    * explicitly, so every portable spelling writes them out. The
    * comparator form has no DuckDB counterpart; the agreeing spelling
    * sorts a struct-keyed transform (composite-key law pinned by the
    * structs wave) and extracts. */
  private def arraySorts: Seq[FuzzPair] = {
    // comma tokens with '' → NULL so the arrays carry real nulls
    val aS = "transform(split(s1, ',', -1), x -> nullif(x, ''))"
    val aD = "list_transform(string_split(s1, ','), x -> nullif(x, ''))"
    Seq(
      FuzzPair("as_nulls_last",
        expr(s"array_join(transform(array_sort($aS), " +
          "x -> coalesce(x, '?')), '|')"),
        s"array_to_string(list_transform(list_sort($aD, 'ASC', " +
          "'NULLS LAST'), x -> coalesce(x, '?')), '|')"),
      FuzzPair("sa_asc_nulls_first",
        expr(s"array_join(transform(sort_array($aS), " +
          "x -> coalesce(x, '?')), '|')"),
        s"array_to_string(list_transform(list_sort($aD, 'ASC', " +
          "'NULLS FIRST'), x -> coalesce(x, '?')), '|')"),
      FuzzPair("sa_desc_nulls_last",
        expr(s"array_join(transform(sort_array($aS, false), " +
          "x -> coalesce(x, '?')), '|')"),
        s"array_to_string(list_transform(list_sort($aD, 'DESC', " +
          "'NULLS LAST'), x -> coalesce(x, '?')), '|')"),
      // comparator by (length, value) — the composite-key emulation
      FuzzPair("as_cmp_len",
        expr("array_join(array_sort(split(s1, ',', -1), (l, r) -> " +
          "CASE WHEN length(l) < length(r) THEN -1 " +
          "WHEN length(l) > length(r) THEN 1 " +
          "WHEN l < r THEN -1 WHEN l > r THEN 1 ELSE 0 END), '|')"),
        "array_to_string(list_transform(list_sort(" +
          "list_transform(string_split(s1, ','), " +
          "x -> {'k': length(x), 'v': x})), s -> s.v), '|')"),
      // descending comparator ≡ explicit DESC modifier
      FuzzPair("as_cmp_desc",
        expr("array_join(array_sort(split(s1, ',', -1), (l, r) -> " +
          "CASE WHEN l < r THEN 1 WHEN l > r THEN -1 ELSE 0 END), '|')"),
        "array_to_string(list_sort(string_split(s1, ','), 'DESC', " +
          "'NULLS LAST'), '|')"))
  }

  /** Unicode casing beyond the lower_u/upper_u pairs (round 14,
    * vocabulary 3 of 4): initcap, case-insensitive LIKE, and the
    * ligature/digraph rows added to the fixture for this wave. */
  private def casings: Seq[FuzzPair] = Seq(
    // DuckDB has NO initcap (measured) — the portable spelling is the
    // split-space/title-each-word/rejoin emulation, valid on the
    // ASCII+space-delimited domain (Spark's initcap lowercases the
    // tail and treats only ' ' as the word break)
    FuzzPair("icap_ascii",
      when(s1.rlike("^[\\x00-\\x7F]*$"), initcap(s1)),
      "CASE WHEN regexp_matches(s1, '^[\\x00-\\x7F]*$') THEN " +
        "array_to_string(list_transform(string_split(s1, ' '), " +
        "w -> upper(substr(w, 1, 1)) || lower(substr(w, 2))), ' ') END"),
    FuzzPair("ilike_ascii", s1.ilike("%AB%"), "(s1 ILIKE '%AB%')"),
    FuzzPair("ilike_meta", s1.ilike("%A_C%"), "(s1 ILIKE '%A_C%')"),
    FuzzPair("upr_len",
      when(!s1.rlike("[ßﬁﬂǅǆǉ]"), length(upper(s1))),
      "CASE WHEN NOT regexp_matches(s1, '[ßﬁﬂǅǆǉ]') " +
        "THEN length(upper(s1)) END"))

  /** format_number / printf rendering (round 14, vocabulary 4 of 4).
    * Spark's formatter is java.util.Formatter (HALF_UP at the last
    * rendered digit); DuckDB's printf/format is the fmt library
    * (IEEE round-half-even) — so fractional rendering agrees only
    * where no rounding happens: values EXACT at the rendered scale
    * (the price-column shape). Integer rendering agrees broadly. */
  private def renders: Seq[FuzzPair] = Seq(
    // grouped thousands over exact-2-decimal prices. DuckDB's fmt
    // rejects '{:,}' on floats (measured: "Thousand separators are
    // not supported for floating point numbers") — the portable
    // spelling groups the integer part and re-attaches exact cents
    FuzzPair("fmtnum_pr", format_number(col("pr"), 2),
      "(format('{:,}', CAST(floor(pr) AS BIGINT)) || '.' || " +
        "lpad(CAST(CAST(round((pr - floor(pr)) * 100) AS BIGINT) " +
        "AS VARCHAR), 2, '0'))"),
    // grouped integers, negatives included
    FuzzPair("fmtnum_long", format_number(l1, 0), "format('{:,}', l1)"),
    // FOUND divergence (#16): a NULL argument renders as the literal
    // string "null" in Spark's format_string (java.util.Formatter
    // semantics — '%d' of null → "null", so the whole result is
    // non-null), while DuckDB's printf propagates NULL to the result.
    // Every portable printf spelling guards its arguments non-null —
    // the guard below is the agreeing form, and any oracle formatting
    // a nullable column needs it (or an explicit coalesce).
    FuzzPair("printf_f2_pr",
      when(col("pr").isNotNull, format_string("<%.2f>", col("pr"))),
      "CASE WHEN pr IS NOT NULL THEN printf('<%.2f>', pr) END"),
    // integer paddings/signs
    FuzzPair("printf_d_pad",
      when(i1.isNotNull, format_string("%05d|%+d", i1, i1)),
      "CASE WHEN i1 IS NOT NULL THEN printf('%05d|%+d', i1, i1) END"),
    // %x/%o: agree on the NON-NEGATIVE domain (Java renders an int
    // arg's 32-bit two's complement for negatives; DuckDB promotes
    // varargs to 64-bit first — 8 vs 16 f's for -1)
    FuzzPair("printf_hex_oct",
      when(i1 >= 0, format_string("%x|%o|%X", i1, i1, i1)),
      "CASE WHEN i1 >= 0 THEN printf('%x|%o|%X', i1, i1, i1) END"),
    // string width padding (ASCII-guarded: pad accounting for
    // non-ASCII is formatter-specific)
    FuzzPair("printf_s_width",
      when(s2.rlike("^[\\x00-\\x7F]*$"),
        format_string("[%6s][%-6s]", s2, s2)),
      "CASE WHEN regexp_matches(s2, '^[\\x00-\\x7F]*$') " +
        "THEN printf('[%6s][%-6s]', s2, s2) END"),
    FuzzPair("printf_pct",
      when(i1.isNotNull, format_string("%d%%", i1)),
      "CASE WHEN i1 IS NOT NULL THEN printf('%d%%', i1) END"))

  /** Regex dialect-edge wave (round 15): the quantifier / anchor /
    * flag / escape surface the r12 `regexes` wave didn't reach. Java
    * regex (Spark) and RE2 (DuckDB) share a large dialect, but the
    * boundary has two ERROR-class members — lookarounds and
    * backreferences are Java-only, RE2 REJECTS the pattern outright —
    * so any oracle regex using them doesn't diverge quietly, it
    * cannot run at all. The catalog carries the mechanical rewrites. */
  private def regexes2: Seq[FuzzPair] = Seq(
    // lazy quantifiers: RE2 supports +?/​*?/.+? with Perl leftmost-
    // FIRST match priority, same as Java (measured: '<(.+?)>' on
    // 'a<xx>b<yy>' → 'xx' in both)
    FuzzPair("re2_lazy_extract", regexp_extract(s1, "<(.+?)>", 1),
      "regexp_extract(s1, '<(.+?)>', 1)"),
    FuzzPair("re2_lazy_replace", regexp_replace(s1, "[0-9]+?", "#"),
      "regexp_replace(s1, '[0-9]+?', '#', 'g')"),
    // alternation priority: leftmost-FIRST (Perl), not POSIX
    // leftmost-longest — '(ab|a)' on 'xabb' picks 'ab' in both
    FuzzPair("re2_alt_first", regexp_extract(s1, "(ab|a)", 1),
      "regexp_extract(s1, '(ab|a)', 1)"),
    // bounded repeats + greedy backtracking equivalence
    FuzzPair("re2_bounded", regexp_extract(s1, "a{2,3}", 0),
      "regexp_extract(s1, 'a{2,3}')"),
    // FOUND divergence (#19): empty-match replacement agrees ONLY on
    // the simple domain. Two distinct mechanisms measured: (a) Spark
    // iterates UTF-16 CODE UNITS — an astral char is split between
    // its surrogate halves ('🦀🚀' → '-?-?-?-?-', corrupted), DuckDB
    // iterates code points ('-🦀-🚀-'); (b) after a NON-EMPTY match
    // Java permits an adjacent empty match at the same position
    // ('0x1A' ~ s/x*/-/g → '-0--1-A-'), RE2 suppresses it
    // ('-0-1-A-'). Agreeing domain: no astral chars AND no occurrence
    // of the repeated token; oracles must not run zero-width-capable
    // replacements outside it.
    FuzzPair("re2_empty_rep",
      when(!s1.contains("x") &&
        !s1.rlike("[\\x{10000}-\\x{10FFFF}]"),
        regexp_replace(s1, "x*", "-")),
      "CASE WHEN NOT contains(s1, 'x') AND NOT " +
        "regexp_matches(s1, '[\\x{10000}-\\x{10FFFF}]') " +
        "THEN regexp_replace(s1, 'x*', '-', 'g') END"),
    // \s/\S whitespace classes over tab/newline/ideographic space.
    // FENCE (#24, r15 ADVICE): Java's \s matches VERTICAL TAB U+000B,
    // RE2's does not (measured: DuckDB regexp_matches(chr(11),'\s') =
    // false, Java "".matches("\\s") = true) — the divergence was
    // only masked because no fixture string contained VT. Agreeing
    // domain: strings without U+000B; oracles needing VT must spell
    // the class explicitly ([ \t\n\x0B\f\r] Java / [ \t\n\v\f\r] RE2).
    FuzzPair("re2_space_cls",
      when(!s1.contains("\u000b"), s1.rlike("^\\s+\\S")),
      "CASE WHEN NOT contains(s1, chr(11)) " +
        "THEN regexp_matches(s1, '^\\s+\\S') END"),
    // \p{Lu} unicode-uppercase category ([[:upper:]] is the POSIX
    // spelling DuckDB also takes, but Java parses [[:upper:]] as a
    // literal bracket class — \p{Lu} is the shared spelling)
    FuzzPair("re2_upper_cat", regexp_replace(s1, "\\p{Lu}", "^"),
      "regexp_replace(s1, '\\p{Lu}', '^', 'g')"),
    // inline flags (?m)/(?s) exist in both dialects
    FuzzPair("re2_multiline", s1.rlike("(?m)^b$"),
      "regexp_matches(s1, '(?m)^b$')"),
    FuzzPair("re2_dotall", s1.rlike("(?s)a.b"),
      "regexp_matches(s1, '(?s)a.b')"),
    // FOUND divergence (#18, see re_like): '$' before a FINAL NEWLINE matches in
    // Java (find() treats a trailing line terminator as optional) but
    // NOT in RE2 ('ab\n' vs 'b$' → false; measured). Two agreeing
    // spellings: guard the trailing-newline zone out, or anchor with
    // \z (absolute end of text — SAME semantics in both dialects).
    FuzzPair("re2_dollar_guard",
      when(!s1.endsWith("\n"), s1.rlike("[b2]$")),
      "CASE WHEN s1 NOT LIKE '%' || chr(10) THEN " +
        "regexp_matches(s1, '[b2]$') END"),
    FuzzPair("re2_eot_z", s1.rlike("[b2]\\z"),
      "regexp_matches(s1, '[b2]\\z')"),
    // FENCE (#20): lookarounds are Java-only — RE2 rejects '(?=' as
    // an invalid perl operator (ERROR, not a wrong answer). A
    // lookahead that brackets a literal rewrites to the literal
    // concatenation; oracle regexes must ship the rewrite.
    FuzzPair("re2_lookahead_rw", s1.rlike("a(?=b)"),
      "regexp_matches(s1, 'ab')"),
    // FENCE (#21): backreferences are Java-only — RE2 rejects '\1'
    // as an invalid escape (ERROR). A bounded-alphabet backreference
    // expands to the explicit alternation; oracles over open
    // alphabets must drop to a non-regex spelling.
    FuzzPair("re2_backref_rw", s1.rlike("([a-z])\\1"),
      "regexp_matches(s1, '" +
        ('a' to 'z').map(c => s"$c$c").mkString("|") + "')"))

  /** Temporal-rendering wave (round 15): the date_format↔strftime
    * token grammar the oracle surface uses for bucketing and labels.
    * Java patterns (yyyy/MM/dd/HH...) and C-style strftime (%Y/%m/%d/
    * %H...) are DIFFERENT GRAMMARS over the same field set — each
    * pair pins one token correspondence, measured over the fixture's
    * leap/century/pre-epoch dates. Both engines are proleptic
    * Gregorian and the session is UTC, so the fields themselves
    * agree; the grammar mapping is what can silently drift. */
  private def strftimes: Seq[FuzzPair] = Seq(
    // day-of-year: DDD (Java, zero-padded to 3) ↔ %j
    FuzzPair("fmt_doy", date_format(dt, "DDD"), "strftime(dt, '%j')"),
    // 12-hour clock + meridiem: hh a ↔ %I %p (midnight → '12 AM',
    // noon → '12 PM' in both)
    FuzzPair("fmt_12h", date_format(ts, "hh a"), "strftime(ts, '%I %p')"),
    // full weekday/month names: EEEE MMMM ↔ %A %B (Spark renders
    // Locale.US; DuckDB's names are English — they coincide)
    FuzzPair("fmt_names", date_format(dt, "EEEE MMMM"),
      "strftime(dt, '%A %B')"),
    FuzzPair("fmt_abbrev", date_format(dt, "EEE"), "strftime(dt, '%a')"),
    // two-digit year: yy ↔ %y
    FuzzPair("fmt_yy", date_format(dt, "yy"), "strftime(dt, '%y')"),
    // milliseconds: SSS (fraction-of-second, 3 digits) ↔ %g
    FuzzPair("fmt_millis", date_format(ts, "HHmmssSSS"),
      "strftime(ts, '%H%M%S%g')"),
    // unpadded month/day: M/d ↔ %-m/%-d (the GNU no-pad extension —
    // DuckDB implements it; POSIX strftime would render %-m literally)
    FuzzPair("fmt_nopad", date_format(dt, "M/d"),
      "strftime(dt, '%-m/%-d')"),
    // FENCE (#22): interval→string rendering NEVER agrees — Spark
    // casts a day-time interval to "INTERVAL '1 02:02:02' DAY TO
    // SECOND", DuckDB to "1 day 02:02:02" (measured). Durations that
    // reach output columns must be rendered NUMERICALLY; this pair is
    // the agreeing numeric spelling (epoch micros of the difference).
    FuzzPair("iv_numeric_render",
      expr("unix_micros(timestampadd(HOUR, CAST(pmod(i1, 48) AS INT), " +
        "ts)) - unix_micros(ts)"),
      s"epoch_us((ts + to_hours(CAST(${dpmod("i1", 48)} AS BIGINT))) - ts)"))

  /** Timestamp-PARSING wave (round 15): the inverse grammar —
    * try_to_timestamp(s, javaPattern) ↔ try_strptime(s, cPattern).
    * FOUND divergence (#23): the parsers sit on opposite strictness
    * regimes. Spark's new parser is STRICT — 'MM' demands two digits,
    * leading whitespace fails, missing fields fail; DuckDB's strptime
    * is LENIENT — '%m' takes '1', leading whitespace is skipped, and
    * missing fields DEFAULT (year → 1900: '%B' alone parses 'JANUARY'
    * to 1900-01-01; '%y' of '99' → 1999 while Java 'yy' → 2099).
    * Agreeing domain: shape-guard the input to the exact padded form
    * of the pattern (the regexes below) — inside it both engines also
    * agree on CALENDAR validation (2024-02-29 parses, 2023-02-30 is
    * NULL in both). Oracles parsing user-shaped text must carry the
    * shape guard or pre-normalize. */
  private def parses: Seq[FuzzPair] = Seq(
    FuzzPair("parse_iso_date",
      when(s1.rlike("^\\d{4}-\\d{2}-\\d{2}\\z"),
        expr("unix_micros(try_to_timestamp(s1, 'yyyy-MM-dd'))")),
      "CASE WHEN regexp_matches(s1, '^\\d{4}-\\d{2}-\\d{2}\\z') THEN " +
        "epoch_us(try_strptime(s1, '%Y-%m-%d')) END"),
    FuzzPair("parse_dmy_hm",
      when(s1.rlike("^\\d{2}/\\d{2}/\\d{4} \\d{2}:\\d{2}\\z"),
        expr("unix_micros(try_to_timestamp(s1, 'dd/MM/yyyy HH:mm'))")),
      "CASE WHEN regexp_matches(s1, " +
        "'^\\d{2}/\\d{2}/\\d{4} \\d{2}:\\d{2}\\z') THEN " +
        "epoch_us(try_strptime(s1, '%d/%m/%Y %H:%M')) END"),
    // definitely-garbage inputs (letters only): NULL in both regimes —
    // EXCEPT DuckDB's special timestamp literals (found by this wave,
    // part of #23's lenient regime): try_strptime('infinity'|'epoch',
    // fmt) bypasses the format and yields the all-defaults timestamp
    // (1900-01-01) instead of NULL, case-insensitively. Spark returns
    // NULL for both. The guard excludes the special-literal set.
    FuzzPair("parse_garbage",
      when(s1.rlike("^[A-Za-z]+\\z") &&
        !lower(s1).isin("infinity", "epoch"),
        expr("unix_micros(try_to_timestamp(s1, 'yyyy-MM-dd'))")),
      "CASE WHEN regexp_matches(s1, '^[A-Za-z]+\\z') AND " +
        "lower(s1) NOT IN ('infinity', 'epoch') THEN " +
        "epoch_us(try_strptime(s1, '%Y-%m-%d')) END"))

  /** Interval ARITHMETIC (round 16, wave 1 of 2 — r15 verdict item
    * 5). The rendering fence (#22) pushed intervals out of output
    * columns; this wave pins the ARITHMETIC laws an oracle may lean
    * on — interval × integer, interval ÷ integer, field extraction
    * from a timestamp difference, multi-unit construction,
    * fractional-second construction, and interval comparison — all
    * rendered numerically (epoch micros / plain fields) per the
    * iv_numeric_render discipline. */
  private def intervals2: Seq[FuzzPair] = Seq(
    // day-time interval × integer column, then add
    FuzzPair("iv2_mul_hr",
      unix_micros(expr(
        "ts + (CAST(pmod(i1, 1000) AS INT) - 500) * INTERVAL '1' HOUR")),
      s"epoch_us(ts + (CAST(${dpmod("i1", 1000)} - 500 AS BIGINT) " +
        "* INTERVAL 1 HOUR))"),
    // year-month interval × integer column: month-end clamping under
    // MULTIPLIED months (the add_months_c law, lifted to ×k)
    FuzzPair("iv2_mul_mon",
      expr("CAST(dt + (CAST(pmod(i1, 24) AS INT)) * INTERVAL '1' MONTH " +
        "AS DATE)"),
      s"CAST(dt + to_months(CAST(${dpmod("i1", 24)} AS INTEGER)) AS DATE)"),
    // FOUND divergence (#25): interval ÷ integer divides PER
    // COMPONENT integerwise in DuckDB (INTERVAL 1 DAY / 7 → days
    // 1//7 = 0, micros 0//7 = 0 — a ZERO interval; measured) while
    // Spark divides the day-time interval's TOTAL MICROS with
    // HALF_UP (86400e6/7 = 12342857142.857 → 12342857143 µs;
    // measured). Agreeing spelling: do the division in micros space
    // explicitly with the same rounding — the numeric-render
    // discipline extended to division.
    FuzzPair("iv2_div7",
      unix_micros(expr("ts + INTERVAL '1' DAY / 7")),
      "epoch_us(ts + to_microseconds(CAST(round(864e8 / 7) AS BIGINT)))"),
    // subtraction form
    FuzzPair("iv2_sub_min",
      unix_micros(expr("ts - INTERVAL '90' MINUTE")),
      "epoch_us(ts - INTERVAL 90 MINUTE)"),
    // multi-unit day-time construction (days + hours + minutes)
    FuzzPair("iv2_make_dt",
      unix_micros(expr("ts + make_dt_interval(CAST(pmod(i2, 30) AS INT), " +
        "CAST(pmod(i1, 24) AS INT), 5, 0)")),
      s"epoch_us(ts + to_days(CAST(${dpmod("i2", 30)} AS INTEGER)) " +
        s"+ to_hours(CAST(${dpmod("i1", 24)} AS BIGINT)) " +
        "+ to_minutes(5))"),
    // fractional-second construction on the EXACT-at-micros domain
    // (sixteenths: d·10⁶ is integral, so neither engine's sub-micro
    // rounding regime is exercised — same stay-on-domain law as the
    // printf/#7 rendering pairs)
    FuzzPair("iv2_sec_frac",
      unix_micros(expr("ts + make_dt_interval(0, 0, 0, " +
        "CAST(pmod(i1, 1000) AS INT) / 16.0)")),
      s"epoch_us(ts + to_microseconds(CAST(${dpmod("i1", 1000)} " +
        "* 62500 AS BIGINT)))"),
    // day field of a timestamp difference (sign carries through)
    FuzzPair("iv2_day_field",
      expr("extract(DAY FROM (CAST(dt2 AS TIMESTAMP) " +
        "- CAST(dt AS TIMESTAMP)))"),
      "CAST(date_part('day', CAST(dt2 AS TIMESTAMP) " +
        "- CAST(dt AS TIMESTAMP)) AS BIGINT)"),
    // interval comparison (day-time)
    FuzzPair("iv2_cmp_30d",
      expr("(CAST(dt2 AS TIMESTAMP) - CAST(dt AS TIMESTAMP)) " +
        "> INTERVAL '30' DAY"),
      "((CAST(dt2 AS TIMESTAMP) - CAST(dt AS TIMESTAMP)) " +
        "> INTERVAL 30 DAY)"))

  /** Collation / grouping-key equality laws (round 16, wave 2 of 2).
    * Every GROUP BY / JOIN on a string key leans on the engines
    * agreeing about EQUALITY and ORDER; every float grouping key
    * leans on the NaN/−0.0 equality classes. Pins: binary (UTF-8
    * byte) string order — which equals code-point order by UTF-8's
    * design — least/greatest under it, null-safe equality, the
    * case-folded-key law on the FULL-casing-guarded domain (the
    * #1/#2/#17 fences), and the two float classes. */
  private def collations: Seq[FuzzPair] = Seq(
    FuzzPair("col_lt_bin", s1 < s2, "(s1 < s2)"),
    FuzzPair("col_lte_bin", s1 <= s2, "(s1 <= s2)"),
    FuzzPair("col_least_s", least(s1, s2), "least(s1, s2)"),
    FuzzPair("col_greatest_s", greatest(s1, s2), "greatest(s1, s2)"),
    FuzzPair("col_nseq", s1 <=> s2, "(s1 IS NOT DISTINCT FROM s2)"),
    // case-insensitive key equality via lower(): valid ONLY outside
    // the full-vs-simple casing split (#1 İ/Σ, #2 ß, #17 ligatures)
    FuzzPair("col_icase_eq",
      when(!s1.rlike("[İΣßﬀ-ﬆ]") && !s2.rlike("[İΣßﬀ-ﬆ]"),
        lower(s1) === lower(s2)),
      "CASE WHEN NOT regexp_matches(s1, '[İΣßﬀ-ﬆ]') " +
        "AND NOT regexp_matches(s2, '[İΣßﬀ-ﬆ]') " +
        "THEN lower(s1) = lower(s2) END"),
    // float grouping-key classes: −0.0 = +0.0 (one group), NaN = NaN
    // (one group, and NaN sorts above +∞) — in BOTH engines
    FuzzPair("col_negzero_eq", d1 === lit(-0.0), "(d1 = -0e0)"),
    FuzzPair("col_nan_eq", d1 === lit(Double.NaN),
      "(d1 = 'nan'::DOUBLE)"),
    FuzzPair("col_nan_top", d1 > lit(Double.PositiveInfinity),
      "(d1 > 'infinity'::DOUBLE)"),
    // neither engine trims NBSP (U+00A0) or VT (U+000B) with plain
    // trim — the new fixture rows exercise this
    FuzzPair("col_trim_ctl", length(trim(s1)), "length(trim(s1))"))

  /** JSON path/extract grammar (round 17, vocabulary 1 of 2 — r16
    * verdict item 7). q24 and every kafka-envelope parse ride
    * get_json_object ↔ json_extract_string; this wave pins the shared
    * path grammar (child / nested / array-index access, scalar
    * unquoting, missing-key NULLs) over the EdgeJsons pool and
    * measures the edges: malformed docs (Spark → NULL; DuckDB's JSON
    * cast ERRORS, so every DuckDB spelling here carries the
    * json_valid guard — the guard IS the portable idiom), JSON-null
    * scalars, object re-rendering, duplicate keys, and numeric-text
    * preservation. */
  private def jsonPaths: Seq[FuzzPair] = {
    // the load-bearing guard: DuckDB auto-casts VARCHAR→JSON inside
    // ->> and json_* and that cast throws on malformed input; CASE
    // evaluates lazily per-row so the guard fences the error class
    def g(d: String) = s"CASE WHEN json_valid(js) THEN $d END"
    // fence #26: the malformed-JSON frontier differs — Jackson
    // accepts single-quoted strings but rejects trailing commas,
    // yyjson the exact opposite — so json_valid alone cannot align
    // the domains; pairs whose result depends on PARSE SUCCESS
    // (rather than a field lookup both engines agree is absent)
    // textually guard out both lenient classes on both sides
    val strictS: Column = !col("js").rlike("'") &&
      !col("js").rlike(",\\s*[}\\]]")
    val strictD = "NOT regexp_matches(js, '''') " +
      "AND NOT regexp_matches(js, ',\\s*[}\\]]')"
    Seq(
      FuzzPair("jx_str",
        when(strictS, expr("get_json_object(js, '$.s')")),
        s"CASE WHEN $strictD AND json_valid(js) THEN js ->> '$$.s' END"),
      // fence #27: numeric token re-rendering — portable only on the
      // plain int64-safe decimal domain (beyond it DuckDB promotes to
      // double text, Spark preserves the literal); numeric COMPARISON
      // is portable via TRY_CAST AS DOUBLE (jx_num_cast, ulp:0)
      // the guard reads the RAW DOC text, not the extracted token:
      // DuckDB re-renders an exponent token into plain decimal, so a
      // token-level guard is asymmetric (caught by the seed-7 rerun)
      FuzzPair("jx_num_text",
        when(!col("js").rlike("[0-9][eE][-+]?[0-9]") &&
          !col("js").rlike("[0-9]{19}"),
          expr("get_json_object(js, '$.n')")),
        g("CASE WHEN NOT regexp_matches(js, '[0-9][eE][-+]?[0-9]') " +
          "AND NOT regexp_matches(js, '[0-9]{19}') " +
          "THEN js ->> '$.n' END")),
      FuzzPair("jx_bool", expr("get_json_object(js, '$.b')"),
        g("js ->> '$.b'")),
      FuzzPair("jx_jsonnull", expr("get_json_object(js, '$.z')"),
        g("js ->> '$.z'")),
      FuzzPair("jx_missing", expr("get_json_object(js, '$.absent')"),
        g("js ->> '$.absent'")),
      FuzzPair("jx_nested", expr("get_json_object(js, '$.a.b.c')"),
        g("js ->> '$.a.b.c'")),
      FuzzPair("jx_arr_idx", expr("get_json_object(js, '$.arr[1]')"),
        g("js ->> '$.arr[1]'")),
      FuzzPair("jx_arr_obj", expr("get_json_object(js, '$.arr[0].k')"),
        g("js ->> '$.arr[0].k'")),
      FuzzPair("jx_root_arr", expr("get_json_object(js, '$[1]')"),
        g("js ->> '$[1]'")),
      FuzzPair("jx_obj_out", expr("get_json_object(js, '$.o')"),
        g("js ->> '$.o'")),
      // fence #28: whole-document re-rendering is NOT portable —
      // Spark \u-escapes non-BMP chars where DuckDB emits raw UTF-8,
      // the #27 number classes re-render, and a JSON-null ROOT gives
      // the STRING 'null' in Spark vs NULL in DuckDB. Extract fields,
      // not documents; the agreeing domain pinned here is ASCII docs
      // with in-domain numbers, no escape sequences, non-null root,
      // strict syntax (#26)
      FuzzPair("jx_root",
        when(strictS && col("js").rlike("^[\\x20-\\x7E]*$") &&
          !col("js").rlike("[0-9]{19}") &&
          !col("js").rlike("[0-9][eE][-+]?[0-9]") &&
          !col("js").contains("\\") && trim(col("js")) =!= "null",
          expr("get_json_object(js, '$')")),
        s"CASE WHEN $strictD " +
          "AND regexp_matches(js, '^[ -~]*$') " +
          "AND NOT regexp_matches(js, '[0-9]{19}') " +
          "AND NOT regexp_matches(js, '[0-9][eE][-+]?[0-9]') " +
          "AND NOT contains(js, '\\') AND trim(js) != 'null' " +
          "AND json_valid(js) THEN js ->> '$' END"),
      FuzzPair("jx_arrlen",
        expr("cast(json_array_length(get_json_object(js, '$.arr')) as bigint)"),
        g("json_array_length(js, '$.arr')")),
      // fence #29 carrier: DuckDB's array_to_string of an EMPTY list
      // is NULL (measured) where Spark's array_join is '' — the
      // coalesce is the portable spelling; strict-syntax guard (#26)
      // because key ENUMERATION depends on parse success
      FuzzPair("jx_keys",
        when(strictS, expr("array_join(json_object_keys(js), '|')")),
        s"CASE WHEN $strictD AND json_valid(js) " +
          "AND json_type(js) = 'OBJECT' THEN " +
          "coalesce(array_to_string(json_keys(js), '|'), '') END"),
      FuzzPair("jx_num_cast",
        expr("try_cast(get_json_object(js, '$.n') as double)"),
        g("TRY_CAST((js ->> '$.n') AS DOUBLE)"), "ulp:0"),
      // fence #29 pinned directly: the empty-list join law outside
      // any JSON context — array_join('') vs coalesce(a2s, '')
      FuzzPair("aj_empty_list",
        expr("array_join(filter(array(i1), x -> false), '|')"),
        "coalesce(array_to_string(list_filter([i1], " +
          "x -> false), '|'), '')"))
  }

  /** Struct comparison-and-rendering semantics (round 17, vocabulary
    * 2 of 2). The r14 structs wave pinned guarded equality/ordering;
    * this one pins the RENDERING surface (to_json over structs — the
    * portable struct-to-text spelling, since CAST(struct AS STRING)
    * renders `{1, a}` in Spark vs `{'a': 1, 'b': a}` in DuckDB) and
    * the null-safe equality laws on nested values. */
  private def structRenders: Seq[FuzzPair] = Seq(
    // to_json with null fields: Spark DROPS null fields by default
    // (spark.sql.jsonGenerator.ignoreNullFields) — the portable
    // spelling passes ignoreNullFields=false so both render "k":null
    FuzzPair("sr_tojson_nulls",
      expr("to_json(named_struct('a', i1, 'b', i2), " +
        "map('ignoreNullFields', 'false'))"),
      "to_json({'a': i1, 'b': i2})::VARCHAR"),
    // nested struct + int array
    FuzzPair("sr_tojson_nested",
      expr("to_json(named_struct('o', named_struct('k', i1), " +
        "'arr', array(i2, i1)), map('ignoreNullFields', 'false'))"),
      "to_json({'o': {'k': i1}, 'arr': [i2, i1]})::VARCHAR"),
    // string-field escaping (quotes, backslash, newline, unicode)
    FuzzPair("sr_tojson_esc",
      expr("to_json(named_struct('s', s1), " +
        "map('ignoreNullFields', 'false'))"),
      "to_json({'s': s1})::VARCHAR"),
    // the portable struct-to-text spelling where CAST diverges:
    // explicit concat of the fields
    FuzzPair("sr_concat_render",
      concat_ws("|", col("i1"), s1),
      "concat_ws('|', i1, s1)"),
    // null-safe equality over structs WITH null fields — unguarded
    // on purpose: measures whether <=> and IS NOT DISTINCT FROM
    // agree about nested nulls
    FuzzPair("sr_nseq_cross",
      expr("named_struct('a', i1, 'b', s1) <=> " +
        "named_struct('a', i2, 'b', s2)"),
      "({'a': i1, 'b': s1} IS NOT DISTINCT FROM {'a': i2, 'b': s2})"),
    FuzzPair("sr_nseq_self",
      expr("named_struct('a', i1, 'b', s1) <=> " +
        "named_struct('a', i1, 'b', s1)"),
      "({'a': i1, 'b': s1} IS NOT DISTINCT FROM {'a': i1, 'b': s1})"),
    // field access through a NULL struct value → NULL, both engines
    FuzzPair("sr_field_nullst",
      expr("(CASE WHEN i1 > i2 THEN named_struct('a', i1) END).a"),
      "(CASE WHEN i1 > i2 THEN {'a': i1} END).a"))

  // ---------------------------------------------------------------
  // Main
  // ---------------------------------------------------------------

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/fuzz_out")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // default seed is pinned (reproducible gate); override to re-roll
    // the random fill locally — the edge sweep never changes
    val seed = sys.env.get("SPARK_GRAFT_FUZZ_SEED").map(_.toLong)
      .getOrElse(20260815L)
    val fix = fixture(spark, seed = seed)
    fix.coalesce(1).write.mode("overwrite").parquet(s"$outDir/fuzz_input")
    // re-read so both engines evaluate over the identical parquet bytes
    val onDisk = spark.read.parquet(s"$outDir/fuzz_input")
    val cat = catalog
    require(cat.map(_.name).distinct.size == cat.size, "duplicate names")
    onDisk.select(col("id") +: cat.map(p => p.spark.as(p.name)): _*)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/fuzz_spark")

    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = cat.map { p =>
      s"${q(p.name)}: {${q("sql")}: ${q(p.duck)}, " +
        s"${q("policy")}: ${q(p.policy)}}"
    }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/fuzz_sql.json"), json)
    println(s"[fuzz] wrote ${cat.size} pairs over " +
      s"${onDisk.count()} fixture rows to $outDir")
    spark.stop()
  }
}
