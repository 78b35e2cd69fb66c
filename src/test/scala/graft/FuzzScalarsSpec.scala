package graft

import org.apache.spark.sql.functions._

/** Spark-side pins for the cross-engine scalar fuzzer
  * (`graft.FuzzScalars` + `scripts/fuzz_scalars.py`; findings in
  * FUZZ_SCALARS.md). The DuckDB half of each discovered divergence
  * can't run in the JVM, so this spec pins the SPARK behavior each
  * guard in the catalog depends on — if an engine upgrade changes one
  * of these, the corresponding guard (and any oracle leaning on it)
  * must be re-audited. Also sanity-runs the whole catalog so a
  * refactor can't ship an expression that throws at runtime. */
class FuzzScalarsSpec extends SparkTestBase {

  test("catalog is well-formed and every pair evaluates over the fixture") {
    val cat = FuzzScalars.catalog
    assert(cat.map(_.name).distinct.size == cat.size)
    assert(cat.size >= 120)
    assert(cat.forall(p => p.policy == "exact" ||
      p.policy.matches("ulp:[0-9]+")))
    val fix = FuzzScalars.fixture(spark, rows = 512)
    val out = fix.select(col("id") +: cat.map(p => p.spark.as(p.name)): _*)
    assert(out.count() == 512) // forces evaluation of every expression
  }

  test("divergence #1/#2 pins: Spark case mapping is FULL Unicode — " +
    "İ gains a combining dot, final sigma is contextual, ß uppercases " +
    "to SS (DuckDB's utf8proc uses simple 1:1 mappings)") {
    val r = spark.range(1).select(
      lower(lit("İstanbul")).as("li"),
      lower(lit("ΣΙΣΥΦΟΣ")).as("ls"),
      upper(lit("straße")).as("us")).head()
    assert(r.getString(0) == "i̇stanbul") // i + U+0307, 2 code points
    assert(r.getString(1) == "σίσυφος".replace("ί", "ι")) // final ς
    assert(r.getString(1).last == 'ς')
    assert(r.getString(2) == "STRASSE")
  }

  test("divergence #3 pin: Spark reverse() works on CODE POINTS — a " +
    "combining accent detaches from its base (DuckDB reverses graphemes)") {
    val r = spark.range(1)
      .select(reverse(lit("café"))).head().getString(0)
    assert(r == "́efac")
  }

  test("divergence #4 pin: signum(NaN) is NaN in Spark (DuckDB sign " +
    "returns 0)") {
    val r = spark.range(1)
      .select(signum(lit(Double.NaN))).head().getDouble(0)
    assert(r.isNaN)
  }

  test("divergence #5/#6 pins: Spark try_cast parses INT strictly " +
    "(no decimals/scientific/hex — DuckDB rounds '3.14' to 3 and " +
    "reads '0x1A') but DOUBLE through Java's grammar (the 'd'/'f' " +
    "literal suffix parses — DuckDB rejects it)") {
    val r = spark.range(1).select(
      expr("try_cast('3.14' AS INT)").as("a"),
      expr("try_cast('-2.5e3' AS INT)").as("b"),
      expr("try_cast('0x1A' AS INT)").as("c"),
      expr("try_cast('3d' AS DOUBLE)").as("d"),
      expr("try_cast('1e309' AS DOUBLE)").as("e"),
      expr("try_cast('Infinity' AS DOUBLE)").as("f")).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    assert(r.getDouble(3) == 3.0)
    assert(r.getDouble(4).isPosInfinity) // overflow-to-Infinity agrees
    assert(r.getDouble(5).isPosInfinity)
  }

  test("divergence #7 pin: Spark round() rounds the SHORTEST DECIMAL " +
    "RENDERING (0.285 -> 0.29) where DuckDB rounds the exact binary " +
    "value (-> 0.28); the floor(x*100+0.5)/100 idiom follows the " +
    "binary value identically in both engines") {
    val r = spark.range(1).select(
      round(lit(0.285), 2).as("r"),
      (floor(lit(0.285) * 100 + 0.5) / 100).as("i")).head()
    assert(r.getDouble(0) == 0.29) // shortest-rendering HALF_UP
    assert(r.getDouble(1) == 0.28) // exact binary: 28.499… + 0.5 < 29
  }

  test("divergence #8 pin: Spark try_cast to DATE rejects DuckDB's " +
    "'infinity' specials but accepts 'epoch' AND the CLOCK-DEPENDENT " +
    "'now'/'today'/'tomorrow' keywords (nondeterministic on free text " +
    "— the fuzz catalog guards them; DuckDB rejects all four)") {
    val r = spark.range(1).select(
      expr("try_cast('Infinity' AS DATE)").as("a"),
      expr("try_cast('epoch' AS DATE)").as("b"),
      expr("try_cast('tomorrow' AS DATE)").as("c"),
      expr("try_cast('2023-01-15' AS DATE)").as("d")).head()
    assert(r.isNullAt(0))
    assert(r.getDate(1).toString == "1970-01-01") // agrees cross-engine
    assert(!r.isNullAt(2)) // parses — value depends on the wall clock
    assert(r.getDate(3).toString == "2023-01-15")
  }

  test("divergence #9 pin: Spark array_join of an EMPTY array is '' " +
    "(DuckDB's array_to_string is NULL — q46's oracle coalesces for " +
    "exactly this)") {
    val r = spark.range(1).select(
      array_join(slice(split(lit("a"), ",", -1), 2, 2), "|")).head()
    assert(!r.isNullAt(0) && r.getString(0) == "")
  }

  test("divergence #10 pin: Spark's to_json OMITS null struct fields " +
    "by default (DuckDB renders them) — ignoreNullFields=false is the " +
    "agreeing spelling the j_struct pair carries") {
    val s = struct(lit(1).as("a"), lit(null).cast("int").as("b"))
    val r = spark.range(1).select(
      to_json(s).as("dflt"),
      to_json(s, java.util.Collections.singletonMap(
        "ignoreNullFields", "false")).as("keep")).head()
    assert(r.getString(0) == """{"a":1}""")
    assert(r.getString(1) == """{"a":1,"b":null}""")
  }

  test("why fsum exists: a raw double sum is ACCUMULATION-ORDER-" +
    "dependent (1e16 + 1 - 1e16 is 0.0 or 1.0 by ordering), so only " +
    "the floored-BIGINT fold is a lawful cross-engine aggregate") {
    val spark2 = spark; import spark2.implicits._
    // 2^53: the first double whose +1 is absorbed (spacing 2), while
    // -(2^53) + 1 = -(2^53 - 1) is still exactly representable
    val big = 9007199254740992.0
    val vals = Seq(big, 1.0, -big)
    def sumInOrder(xs: Seq[Double]): Double =
      xs.toDF("v").coalesce(1).agg(sum(col("v"))).head().getDouble(0)
    val asc = sumInOrder(vals.sorted) // -2^53 + 1.0 survives -> 1.0
    val given = sumInOrder(vals) // 2^53 + 1.0 absorbs the 1.0 -> 0.0
    assert(asc == 1.0 && given == 0.0)
    // the fsum idiom is order-immune: BIGINT partials are exact (the
    // idiom's floor(x*1e6) bound keeps magnitudes inside Long)
    val l = Seq(1e10, 1.0, -1e10).map(v => (v * 1e6).toLong)
    assert(l.sum == l.reverse.sum && l.sum == 1000000L)
  }

  test("agreement pins the catalog leans on: chr() matches DuckDB " +
    "code points on 1..255, ascii() is the true code point (== ord), " +
    "and element_at under try_ returns NULL out of bounds (== DuckDB " +
    "list indexing)") {
    val r = spark.range(1).select(
      expr("chr(233)").as("a"), // é — Latin-1 range, not mod-ASCII
      ascii(lit("𝒜x")).as("b"), // astral: true code point U+1D49C
      expr("try_element_at(split('a,b', ',', -1), 5)").as("c")).head()
    assert(r.getString(0) == "é")
    assert(r.getInt(1) == 0x1D49C)
    assert(r.isNullAt(2))
  }

  test("divergence #11 pin (round 13): Spark DECIMAL division yields " +
    "scale 13 for (18,2)/(10,0)-class inputs (DuckDB expands to 16) " +
    "and post-rounding double-rounds — ratios must divide as DOUBLE") {
    val r = spark.range(1).select(
      expr("CAST(CAST(1 AS DECIMAL(10,2)) / CAST(3 AS DECIMAL(10,2)) " +
        "AS STRING)").as("q"),
      // the measured double-rounding flip: 34660.35 / -96 rounds to
      // -361.045313 through Spark's scale-13 quotient but -361.045312
      // through DuckDB's scale-16 one
      expr("CAST(round(CAST(34660.35 AS DECIMAL(18,2)) / " +
        "CAST(-96 AS DECIMAL(10,0)), 6) AS DOUBLE)").as("d")).head()
    assert(r.getString(0) == "0.3333333333333") // 13 decimals
    assert(r.getDouble(1) == -361.045313)
  }

  test("divergence #12 pin (round 13): timestampdiff counts COMPLETE " +
    "months (DuckDB datediff counts boundary crossings) — month " +
    "bucketing must ride year*12+month differences") {
    val r = spark.range(1).select(
      expr("timestampdiff(MONTH, TIMESTAMP '2024-01-15 00:00:00', " +
        "TIMESTAMP '2024-02-14 00:00:00')").as("complete"),
      expr("(year(DATE '2024-02-14') * 12 + month(DATE '2024-02-14')) - " +
        "(year(DATE '2024-01-15') * 12 + month(DATE '2024-01-15'))")
        .as("crossings")).head()
    assert(r.getLong(0) == 0L) // Jan-15 -> Feb-14: no complete month
    assert(r.getInt(1) == 1) // but one month boundary crossed
  }

  test("divergence #13 pin (round 13): unix_timestamp TRUNCATES the " +
    "fractional second toward zero — pre-epoch it disagrees with " +
    "floor(epoch()) (DuckDB), so whole-second oracles guard ts >= " +
    "epoch (both shipped uses are post-epoch/order-only — swept r13)") {
    val r = spark.range(1).select(
      unix_timestamp(expr("TIMESTAMP '1969-12-31 23:59:59.5'")).as("pre"),
      unix_timestamp(expr("TIMESTAMP '1970-01-01 00:00:00.5'")).as("post"))
      .head()
    assert(r.getLong(0) == 0L) // floor would be -1
    assert(r.getLong(1) == 0L)
  }

  test("divergence #14 pin (round 13): map duplicate keys THROW in " +
    "Spark (construction AND map_concat, default EXCEPTION policy) — " +
    "DuckDB's map_concat silently last-wins, so portable pipelines " +
    "resolve cross-map duplicates before concatenating") {
    intercept[Exception] {
      spark.range(1)
        .select(expr("map_from_arrays(array('a','a'), array(1,2))"))
        .head()
    }
    intercept[Exception] {
      spark.range(1)
        .select(expr("map_concat(map('a', 1), map('a', 2))")).head()
    }
    // within-engine agreement the catalog leans on: missing-key
    // lookup is NULL (not an ANSI error), key order is insertion order
    val r = spark.range(1).select(
      expr("map_from_arrays(array('b','a'), array(1,2))['z']").as("m"),
      expr("array_join(map_keys(map_from_arrays(array('b','a'), " +
        "array(1,2))), '|')").as("k")).head()
    assert(r.isNullAt(0) && r.getString(1) == "b|a")
  }

  test("divergence #15 pin (round 13): double -> DECIMAL rounds the " +
    "SHORTEST RENDERING in Spark at every magnitude (DuckDB's rule " +
    "varies by regime) — casts are portable only on exact-at-scale " +
    "doubles; everything else rounds via floor(x*10^k + 0.5)/10^k " +
    "first") {
    val r = spark.range(1).select(
      expr("CAST(CAST(878947987312.1365 AS DOUBLE) AS DECIMAL(20,3)) " +
        "AS STRING").cast("string").as("a"),
      expr("CAST(CAST(1000000000000000.5 AS DOUBLE) AS DECIMAL(20,3))")
        .cast("string").as("b")).head()
    assert(r.getString(0) == "878947987312.137") // DuckDB: .136
    assert(r.getString(1) == "1000000000000000.500") // DuckDB: .512
  }

  test("divergence #16 pin (round 14): format_string renders a NULL " +
    "argument as the literal string 'null' (java.util.Formatter) — " +
    "DuckDB's printf propagates NULL, so portable printf spellings " +
    "guard their arguments non-null") {
    val r = spark.range(1).select(
      format_string("%d%%", lit(null).cast("int")).as("a"),
      format_string("<%.2f>", lit(null).cast("double")).as("b")).head()
    assert(r.getString(0) == "null%")
    // the conversion's PRECISION applies to the rendered "null"
    // string: %.2f of null is "nu" (measured) — doubly unportable
    assert(r.getString(1) == "<nu>")
  }

  test("divergence #17 pin (round 14): Spark upper() applies FULL " +
    "mappings to the U+FB00-FB06 ligatures (fi-ligature -> 'FI'); " +
    "DuckDB's simple mapping keeps them — while the titlecase " +
    "digraphs AGREE cross-engine (1:1)") {
    val r = spark.range(1).select(
      upper(lit("ﬁle")).as("a"),
      upper(lit("ǅungla ǉeto")).as("b")).head()
    assert(r.getString(0) == "FILE") // DuckDB: ﬁLE
    assert(r.getString(1) == "ǄUNGLA ǇETO") // agrees (1:1 digraphs)
  }

  test("divergence #26 pin (round 17): Jackson's malformed-JSON " +
    "frontier — get_json_object ACCEPTS single-quoted strings and " +
    "REJECTS trailing commas (yyjson is the exact opposite, so " +
    "json_valid can't align the domains; parse-success-dependent " +
    "oracles guard both classes textually)") {
    val r = spark.range(1).select(
      get_json_object(lit("{'s':'single'}"), "$.s").as("a"),
      get_json_object(lit("""{"s":"a",}"""), "$.s").as("b")).head()
    assert(r.getString(0) == "single") // DuckDB: invalid -> NULL
    assert(r.isNullAt(1)) // DuckDB: valid -> 'a'
  }

  test("divergence #27 pin (round 17): get_json_object PRESERVES " +
    "the literal number token beyond the int64/plain-decimal domain " +
    "(DuckDB re-renders through double) — numeric comparison is the " +
    "portable spelling (TRY_CAST AS DOUBLE, exact at ulp:0)") {
    val r = spark.range(1).select(
      get_json_object(lit("""{"n":99999999999999999999}"""), "$.n").as("a"),
      get_json_object(lit("""{"n":1E+308}"""), "$.n").as("b"),
      get_json_object(lit("""{"n":1.50}"""), "$.n").as("c")).head()
    assert(r.getString(0) == "99999999999999999999") // DuckDB: 1e20.0-text
    assert(r.getString(1) == "1.0E308") // DuckDB: 1e308
    assert(r.getString(2) == "1.5") // in-domain: both re-render 1.5
  }

  test("divergence #28 pin (round 17): whole-doc extraction — Spark " +
    "backslash-u-escapes non-BMP on re-render and returns the STRING " +
    "'null' for a JSON-null ROOT (field-level JSON null is NULL in " +
    "both engines — jx_jsonnull)") {
    val r = spark.range(1).select(
      get_json_object(lit("""{"u":"🦀"}"""), "$").as("a"),
      get_json_object(lit("null"), "$").as("b"),
      get_json_object(lit("""{"z":null}"""), "$.z").as("c")).head()
    assert(r.getString(0) == "{\"u\":\"\\uD83E\\uDD80\"}") // DuckDB: raw 🦀
    assert(r.getString(1) == "null") // DuckDB: NULL
    assert(r.isNullAt(2)) // field-level: agrees
  }

  test("divergence #29 pin (round 17): array_join of an EMPTY array " +
    "is '' in Spark (DuckDB's array_to_string gives NULL — portable " +
    "spellings coalesce), and json_object_keys of '{}' is the empty " +
    "array, not NULL") {
    val r = spark.range(1).select(
      array_join(expr("filter(array(1), x -> false)"), "|").as("a"),
      array_join(expr("json_object_keys('{}')"), "|").as("b")).head()
    assert(r.getString(0) == "")
    assert(r.getString(1) == "")
  }
}
