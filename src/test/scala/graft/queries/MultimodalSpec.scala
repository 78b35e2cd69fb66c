package graft.queries

import graft.SparkTestBase

/** Multimodal plumbing: real header construct/parse agreement between
  * the expression program (q88) and the partition-wise ByteBuffer
  * decoder, plus batch-shape invariants. */
class MultimodalSpec extends SparkTestBase {

  test("mapPartitions decode covers every document exactly once") {
    val decoded = MultimodalOps.decodePartitions(spark, Sf, numPartitions = 7)
    val n = graft.Tables.documents(spark, Sf).count()
    assert(decoded.count() == n)
    assert(decoded.select("doc_id").distinct().count() == n)
  }

  test("decode output is deterministic and within construction ranges") {
    val a = MultimodalOps.decodePartitions(spark, Sf, numPartitions = 3)
      .collect().map(d => d.doc_id -> d).toMap
    val b = MultimodalOps.decodePartitions(spark, Sf, numPartitions = 11)
      .collect().map(d => d.doc_id -> d).toMap
    // partitioning must not change per-row results (decoder is pure)
    assert(a == b)
    a.values.foreach { d =>
      assert(d.width >= 1 && d.width <= 64)
      assert(d.height >= 1 && d.height <= 48)
      assert(d.bpp == 24)
      assert(d.n_bytes == 54 + ((3 * d.width + 3) / 4 * 4) * d.height)
    }
  }

  test("ByteBuffer decode agrees field-for-field with the q88 expression parse") {
    val fromExpr = MultimodalOps.q88MediaHeaders(spark, Sf)
      .select("doc_id", "bmp_file_size", "width", "height", "bpp").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toMap
    val fromPartitions = MultimodalOps.decodePartitions(spark, Sf)
      .collect()
      .map(d => d.doc_id -> (d.n_bytes.toLong, d.width, d.height, d.bpp)).toMap
    assert(fromExpr == fromPartitions)
  }

  test("q88 header checks all pass (valid magic, sizes, PCM tags)") {
    val rows = MultimodalOps.q88MediaHeaders(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("bmp_ok"), s"bmp_ok false for ${r.getLong(0)}")
      assert(r.getAs[Boolean]("wav_ok"), s"wav_ok false for ${r.getLong(0)}")
      val rate = r.getAs[Long]("wav_rate")
      assert(Set(8000L, 16000L, 44100L, 48000L).contains(rate))
      val durMs = r.getAs[Double]("wav_duration_ms")
      assert(durMs == r.getAs[Long]("wav_data_len") * 1000.0 /
        (rate * r.getAs[Int]("wav_channels") * 2))
    }
  }

  test("q141 audio features read real signed PCM samples") {
    val rows = MultimodalOps.q141AudioFeatures(spark, Sf).collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val s = ((id % 1000 + 1) * (id % 2 + 1)).toInt
      assert(r.getAs[Int]("n_samples") == s)
      // alternating +1000/-1000: peak exact, DC cancels pairwise,
      // energy = S * 1000^2 — a sign bug (unsigned read) would blow
      // dc_sum and peak far past these
      assert(r.getAs[Long]("peak") == 1000L)
      assert(r.getAs[Long]("dc_sum") == (if (s % 2 == 0) 0L else 1000L))
      assert(r.getAs[Long]("energy") == s.toLong * 1000000L)
    }
  }

  test("q141 kernel is bit-equal to the declarative substr/hex/conv twin") {
    val kernel = MultimodalOps.q141AudioFeatures(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val twin = MultimodalOps.audioFeaturesTwin(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(kernel == twin)
  }

  test("q141 sample parse agrees with a JVM ByteBuffer decode") {
    // independent third parser for the audio path, mirroring the BMP
    // imageio check: little-endian ShortBuffer over the data chunk
    val blobs = MultimodalOps.mediaBlobs(spark, Sf)
      .select("doc_id", "wav").limit(10).collect()
    blobs.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("wav")
      val bb = java.nio.ByteBuffer.wrap(bytes, 44, bytes.length - 44)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var peak = 0L; var dc = 0L; var energy = 0L; var n = 0
      while (bb.remaining() >= 2) {
        val v = bb.getShort.toLong
        peak = math.max(peak, math.abs(v)); dc += v; energy += v * v; n += 1
      }
      assert(peak == 1000L && energy == n.toLong * 1000000L)
      assert(dc == (if (n % 2 == 0) 0L else 1000L))
    }
  }

  test("q173 pixel sums match the closed form and skip the 0xFF padding") {
    val rows = MultimodalOps.q173ImageStats(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val w = id % 64 + 1
      val h = id % 48 + 1
      val a = (w + 1) / 2
      val b = w / 2
      assert(r.getAs[Long]("n_pixels") == w * h)
      // padding is 0xFF: a walk that reads pad bytes inflates sum_b
      // (the channel nearest the row end) far past this exact value
      assert(r.getAs[Long]("sum_b") == (a + 55 * b) * h)
      assert(r.getAs[Long]("sum_g") == (55 * a + b) * h)
      assert(r.getAs[Long]("sum_r") == (a + 55 * b) * h)
    }
  }

  test("q173 kernel is bit-equal to the declarative per-pixel twin") {
    graft.functions.GraftFunctions.register(spark)
    val ids = org.apache.spark.sql.functions.col("doc_id") < 40
    val kernel = MultimodalOps.q173ImageStats(spark, Sf).filter(ids)
      .select("doc_id", "n_pixels", "sum_b", "sum_g", "sum_r").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val twin = MultimodalOps.imageStatsTwin(spark, Sf).filter(ids).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(kernel.nonEmpty && kernel == twin)
  }

  test("bmp_stats rejects non-BMP and truncated input instead of guessing") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val junk = Seq(
      "not an image at all".getBytes("UTF-8"),
      Array.fill[Byte](10)(0x42),
      "BM".getBytes("UTF-8") ++ Array.fill[Byte](40)(0)) // truncated header
    val out = junk.toDF("b")
      .select(org.apache.spark.sql.functions
        .call_function("bmp_stats", $"b").as("st")).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("constructed blobs decode with the JDK's own image reader") {
    // javax.imageio is a PUBLIC JDK API and reads BMP: the strongest
    // possible validity check for the constructed bytes — a third,
    // fully independent parser agrees on the dimensions
    val blobs = MultimodalOps.mediaBlobs(spark, Sf)
      .select("doc_id", "bmp").limit(20).collect()
    assert(blobs.nonEmpty)
    blobs.foreach { r =>
      val id = r.getLong(0)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bmp")))
      assert(img != null, s"ImageIO rejected doc $id's BMP")
      assert(img.getWidth == (id % 64 + 1).toInt)
      assert(img.getHeight == (id % 48 + 1).toInt)
      // pixel pattern (restarts per row, so every row is identical):
      // x even → BGR 01,37,01; x odd → 37,01,37 — the JDK reader must
      // see exactly what the q173 kernel sums
      for (x <- 0 until img.getWidth) {
        val want = if (x % 2 == 0) 0xFF013701 else 0xFF370137
        assert(img.getRGB(x, 0) == want,
          f"doc $id pixel $x: ${img.getRGB(x, 0)}%08x != $want%08x")
      }
    }
  }
}
