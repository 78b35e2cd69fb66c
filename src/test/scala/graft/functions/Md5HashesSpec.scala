package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.scalatest.funsuite.AnyFunSuite

/** The md5-basis kernels (r16) against INDEPENDENTLY derived golden
  * values: every constant below was computed with Python's hashlib
  * (md5 of the UTF-8 bytes, first-hex-chars big-endian integers) —
  * a third implementation, so a transcription bug in the Scala
  * byte-folding cannot self-confirm. The DuckDB side of the same
  * contract is exercised by the driver's oracle gate (q37/q38/q41/
  * q47 re-derive these signatures in SQL). */
class Md5HashesSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName("Md5HashesSpec")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(s)
    s
  }

  private def oneString(fnSql: String, input: Any): Any = {
    import spark.implicits._
    val df = Seq(Option(input.asInstanceOf[String])).toDF("s")
    df.selectExpr(s"$fnSql(s) AS r").collect()(0).get(0)
  }

  test("md5_simhash64 golden values (hashlib-derived)") {
    assert(oneString("md5_simhash64", "hello world") == 6719652267731058694L)
    // empty string: split yields one empty token; md5('') still votes
    assert(oneString("md5_simhash64", "") == -3162216497309240828L)
    // null in, null out
    import spark.implicits._
    val r = Seq[Option[String]](None).toDF("s")
      .selectExpr("md5_simhash64(s) AS r").collect()(0)
    assert(r.isNullAt(0))
  }

  test("md5_minhash_sigs golden values + whole-string shingle for short input") {
    import spark.implicits._
    val df = Seq("abcdefgh", "ab").toDF("s")
    val rows = df.selectExpr("md5_minhash_sigs(s, 5, 4) AS sig")
      .collect().map(_.getSeq[Long](0))
    assert(rows(0) == Seq(697744405L, 626797378L, 513489204L, 879419311L))
    // len < k: the single whole-string shingle, mirroring
    // sequence(0, greatest(len - k, 0))'s always-one-window clamp
    assert(rows(1) == Seq(1768331594L, 1470966101L, 1905882299L, 742406938L))
  }

  test("md5_minhash_sigs Carter-Wegman constants are md5-derived " +
    "(a_j in [1, 2^30), b_j in [0, 2^31))") {
    val e = Md5MinHashSigs(
      org.apache.spark.sql.catalyst.expressions.Literal("x"),
      org.apache.spark.sql.catalyst.expressions.Literal(5),
      org.apache.spark.sql.catalyst.expressions.Literal(4))
    // first four (a, b) pairs, hashlib-derived
    val a = Seq(262007657L, 725540012L, 151427375L, 478958469L)
    val b = Seq(369545067L, 1459014281L, 2080530685L, 1526659845L)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(s: String): Long = {
      val d = md.digest(s.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    (0 until 4).foreach { j =>
      assert(h32(s"mh_a:$j") % 1073741823L + 1L == a(j))
      assert(h32(s"mh_b:$j") % 2147483648L == b(j))
    }
    assert(e.dataType.typeName == "array")
  }

  test("Md5RhpBucket golden value, non-64-dim collapse, and " +
    "Md5RhpSignatures(tables=1) coherence") {
    import spark.implicits._
    val v = (0 until 64).map(i =>
      (0.01f * (i + 1)) * (if (i % 2 == 1) -1f else 1f)).toArray
    val df = Seq(Tuple1(v), Tuple1(Array(1.0f, 2.0f))).toDF("e")
    val bucketCol = Bridge.column(Md5RhpBucket(Bridge.expr(col("e")), 8, 64))
    val sigsCol = Bridge.column(Md5RhpSignatures(Bridge.expr(col("e")), 8, 3, 64))
    val rows = df.select(bucketCol.as("b"), sigsCol.as("s")).collect()
    assert(rows(0).getLong(0) == 251L, "hashlib-derived golden bucket")
    // tables = 1 block of the multi-table kernel IS the single bucket
    assert(rows(0).getSeq[Long](1).head == 251L)
    assert(rows(0).getSeq[Long](1).length == 3)
    // wrong-dims arrays collapse to 0 in BOTH kernels (the oracle
    // mirrors with a len() guard)
    assert(rows(1).getLong(0) == 0L)
    assert(rows(1).getSeq[Long](1) == Seq(0L, 0L, 0L))
  }

  test("kernels agree between codegen and interpreted eval") {
    import spark.implicits._
    val strs = Seq("a b c", "  leading", "one", "", "x y x y z",
      "tab\tsep", "ünïcödé tökens")
    val df = strs.toDF("s")
    val viaDf = df.selectExpr("md5_simhash64(s) AS h",
      "md5_minhash_sigs(s, 5, 16) AS m").collect()
    strs.zip(viaDf).foreach { case (s, row) =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      val direct = Md5SimHash64(
        org.apache.spark.sql.catalyst.expressions.Literal("")).compute(u)
      assert(direct == row.getLong(0), s"simhash mismatch on '$s'")
      val mh = Md5MinHashSigs(
        org.apache.spark.sql.catalyst.expressions.Literal(""),
        org.apache.spark.sql.catalyst.expressions.Literal(5),
        org.apache.spark.sql.catalyst.expressions.Literal(16))
        .compute(u).toLongArray().toSeq
      assert(mh == row.getSeq[Long](1), s"minhash mismatch on '$s'")
    }
  }
}
