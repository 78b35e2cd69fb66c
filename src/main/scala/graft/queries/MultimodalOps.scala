package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.Tables

/** Multimodal columns: image/audio/video treated as opaque `binary`
  * payloads with typed metadata alongside.
  *
  * Two tiers:
  *   - q88 + [[decodePartitions]] are REAL byte-level decodes: genuine
  *     little-endian BMP (BITMAPINFOHEADER) and PCM WAV (RIFF) blobs
  *     are built bytewise per document, then parsed back by an
  *     independent expression program (substr + hex + conv byte
  *     arithmetic) — width/height/sample-rate/duration come from the
  *     actual bytes, and the construct→parse roundtrip is
  *     DuckDB-oracle-checked against the closed-form parameters.
  *   - q43 is a REAL big-endian PNG decode: a genuine signature + IHDR
  *     chunk (with its actual CRC-32, computed over the real bytes by
  *     the engine's `crc32`, the same CRC-32/ISO-HDLC polynomial PNG
  *     specifies) + IEND is built per document, parsed back by an
  *     independent substr/hex/conv program, and validated by
  *     javax.imageio in MultimodalSpec. Full pixel decode (IDAT
  *     inflate) needs a codec this environment lacks — header-level
  *     decode is the honest boundary, and the frame-sample plumbing
  *     runs over the same real bytes.
  */
object MultimodalOps {

  /** q42 — binary payload plumbing: utf8 bytes of `text` stand in for a
    * media blob. Byte length + content digests are real binary ops and
    * DuckDB-oracle-checked. */
  def q42BinaryMeta(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(col("doc_id"),
        octet_length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("digest_md5"),
        sha2(col("payload"), 256).as("digest_sha256"))
      .orderBy("doc_id")

  /** q43 — REAL PNG header decode, oracle-checked: parses the signature,
    * IHDR length/type, big-endian dimensions, depth and color type out
    * of the raw bytes of [[mediaBlobs]]' PNG column with an expression
    * program independent of the construction, and re-verifies the IHDR
    * chunk's CRC-32 over the actual type+data bytes (`crc32` — the
    * CRC-32/ISO-HDLC polynomial PNG specifies). `png_ok` folds every
    * check, so an offset/endianness/CRC bug in EITHER construct or
    * parse breaks the hash match against the closed-form oracle.
    * "Frame sampling" keeps every 4th 16-byte window of the same real
    * bytes, surfaced as a count + digest. One narrow codegen'd
    * projection — no shuffle, scales linearly. */
  def q43PngDecode(s: SparkSession, dir: String): DataFrame = {
    val png = col("png")
    val sigOk = hex(png.substr(lit(1), lit(8))) === "89504E470D0A1A0A"
    val ihdrOk = (beVal(png, 9, 4) === 13L) &&
      (png.substr(lit(13), lit(4)).cast("string") === "IHDR") &&
      (png.substr(lit(38), lit(4)).cast("string") === "IEND")
    // stored CRC (bytes 30-33) must equal a fresh CRC-32 of the 17
    // type+data bytes — parse-side recomputation, not a byte copy
    val crcOk = beVal(png, 30, 4) === crc32(png.substr(lit(13), lit(17)))
    mediaBlobs(s, dir)
      .select(col("doc_id"),
        (sigOk && ihdrOk && crcOk).as("png_ok"),
        beVal(png, 17, 4).cast(IntegerType).as("width"),
        beVal(png, 21, 4).cast(IntegerType).as("height"),
        beVal(png, 25, 1).cast(IntegerType).as("bit_depth"),
        beVal(png, 26, 1).cast(IntegerType).as("color_type"),
        octet_length(png).as("n_bytes"),
        frameSamples(png).as("frames"))
      .select(col("doc_id"), col("png_ok"), col("width"), col("height"),
        col("bit_depth"), col("color_type"), col("n_bytes"),
        size(col("frames")).as("n_frames"),
        md5(array_join(transform(col("frames"), f => hex(f)), "")
          .cast("binary")).as("frames_md5"))
      .orderBy("doc_id")
  }

  /** Every 4th 16-byte window of a binary payload — the "frame
    * sampling" plumbing a real decoder would feed. */
  private def frameSamples(payload: org.apache.spark.sql.Column) =
    transform(
      sequence(lit(0),
        greatest(floor(octet_length(payload) / 64).cast(IntegerType) - 1, lit(0))),
      i => payload.substr(i * 64 + 1, lit(16)))

  // ------------------------------------------ real header construct/parse

  /** Hex rendering of `v`'s low `n` bytes, little-endian byte order —
    * the building block for writing genuine BMP/WAV integer fields. */
  private def leHex(v: Column, n: Int): Column =
    concat((0 until n).map(i =>
      lpad(hex(shiftright(v, 8 * i).bitwiseAND(255)), 2, "0")): _*)

  /** Little-endian unsigned integer read from `n` bytes of `bin` at
    * 1-based byte offset `pos` — pure substr/hex/conv byte arithmetic,
    * the parse-side inverse of [[leHex]] with no shared code path. */
  private def leVal(bin: Column, pos: Int, n: Int): Column =
    (0 until n).map(i =>
      conv(hex(bin.substr(lit(pos + i), lit(1))), 16, 10).cast("long")
        * lit(1L << (8 * i))).reduce(_ + _)

  /** Big-endian (network-order) hex of `v`'s low `n` bytes — PNG's
    * multi-byte integers are big-endian, unlike BMP/WAV's. */
  private def beHex(v: Column, n: Int): Column =
    concat((n - 1 to 0 by -1).map(i =>
      lpad(hex(shiftright(v, 8 * i).bitwiseAND(255)), 2, "0")): _*)

  /** Big-endian unsigned integer read from `n` bytes of `bin` at
    * 1-based byte offset `pos` — the parse-side inverse of [[beHex]]. */
  private def beVal(bin: Column, pos: Int, n: Int): Column =
    (0 until n).map(i =>
      conv(hex(bin.substr(lit(pos + i), lit(1))), 16, 10).cast("long")
        * lit(1L << (8 * (n - 1 - i)))).reduce(_ + _)

  /** Pixel-byte pool for BMP rows: bytes alternate 0x01/0x37 with the
    * pattern RESTARTING at each row start, and row padding is 0xFF —
    * real non-constant image content whose per-channel sums have a
    * closed form for the q173 oracle (with ⌈w/2⌉ even and ⌊w/2⌋ odd
    * row-local offsets per channel), while the 0xFF padding makes any
    * stride/pad bug in a pixel walk corrupt the sums loudly instead of
    * silently. 192 bytes covers the widest row (64 px × 3). */
  private val PixHex = "0137" * 96
  private val PadHex = "FFFFFF"

  /** PCM sample pool for the WAV data chunk: 16-bit LE samples
    * alternating +1000 / −1000 (`E8 03`, `18 FC`) — real non-silent
    * audio content so feature extraction (q141) has actual samples to
    * read, with closed-form peak/sum/energy for the oracle. 4000 bytes
    * covers the largest data chunk. */
  private val PcmHex = "E80318FC" * 1000

  /** (doc_id, bmp, wav, png): genuine media blobs built BYTEWISE from
    * closed-form per-document parameters — a valid 24bpp
    * BITMAPINFOHEADER BMP (54-byte header + padded pixel rows), a
    * valid PCM WAV (RIFF/fmt/data, 44-byte header + sample data), and
    * a valid PNG prefix (8-byte signature + IHDR chunk with its REAL
    * CRC-32 computed over the chunk bytes + IEND — enough for any
    * header-level reader, javax.imageio included, to identify the
    * format and dimensions). Multi-byte fields go through [[leHex]] /
    * [[beHex]], so each format's endianness is real, not simulated.
    * One codegen'd projection. */
  private[graft] def mediaBlobs(s: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    // BMP: width 1-64, height 1-48, rows padded to 4-byte boundaries
    val w = pmod(d, lit(64)) + 1
    val h = pmod(d, lit(48)) + 1
    val rowBytes = (w * 3 + 3) - pmod(w * 3 + 3, lit(4))
    val imgSize = rowBytes * h
    val bmpHex = concat(
      lit("424D"),                // 'BM'
      leHex(imgSize + 54, 4),     // file size
      lit("00000000"),            // reserved
      leHex(lit(54), 4),          // pixel data offset
      leHex(lit(40), 4),          // BITMAPINFOHEADER size
      leHex(w, 4), leHex(h, 4),   // width, height (LE i32)
      leHex(lit(1), 2),           // planes
      leHex(lit(24), 2),          // bits per pixel
      leHex(lit(0), 4),           // compression = BI_RGB
      leHex(imgSize, 4),          // image size
      leHex(lit(2835), 4), leHex(lit(2835), 4), // 72 DPI in px/metre
      leHex(lit(0), 4), leHex(lit(0), 4),       // palette counts
      array_join(transform(sequence(lit(1), h.cast(IntegerType)),
        _ => concat(lit(PixHex).substr(lit(1), w * 6),
          lit(PadHex).substr(lit(1), (rowBytes - w * 3) * 2))),
        ""))                      // pixel rows: patterned + 0xFF pad
    // WAV: PCM, doc-derived rate/channels/sample count, 16-bit samples
    val rate = element_at(
      array(lit(8000L), lit(16000L), lit(44100L), lit(48000L)),
      (pmod(d, lit(4)) + 1).cast(IntegerType))
    val channels = pmod(d, lit(2)) + 1
    val nSamples = pmod(d, lit(1000)) + 1
    val dataLen = nSamples * channels * 2
    val wavHex = concat(
      lit("52494646"),            // 'RIFF'
      leHex(dataLen + 36, 4),     // riff chunk size
      lit("57415645"),            // 'WAVE'
      lit("666D7420"),            // 'fmt '
      leHex(lit(16), 4),          // fmt chunk size
      leHex(lit(1), 2),           // audio format = PCM
      leHex(channels, 2),
      leHex(rate, 4),
      leHex(rate * channels * 2, 4), // byte rate
      leHex(channels * 2, 2),     // block align
      leHex(lit(16), 2),          // bits per sample
      lit("64617461"),            // 'data'
      leHex(dataLen, 4),
      lit(PcmHex).substr(lit(1), dataLen * 2))
    // PNG: width 1-1024, height 1-768, 8-bit truecolor, no interlace.
    // IHDR CRC is the real CRC-32/ISO-HDLC of the 17 type+data bytes
    // (crc32 implements exactly the polynomial PNG specifies).
    val pw = pmod(d, lit(1024)) + 1
    val ph = pmod(d, lit(768)) + 1
    val ihdrTypeData = concat(
      lit("49484452"),            // 'IHDR'
      beHex(pw, 4), beHex(ph, 4), // width, height (BE u32)
      lit("08"),                  // bit depth
      lit("02"),                  // color type = truecolor
      lit("000000"))              // compression, filter, interlace
    val pngHex = concat(
      lit("89504E470D0A1A0A"),    // PNG signature
      lit("0000000D"),            // IHDR data length = 13
      ihdrTypeData,
      beHex(crc32(unhex(ihdrTypeData)), 4),
      lit("00000000"),            // IEND data length = 0
      lit("49454E44"),            // 'IEND'
      lit("AE426082"))            // IEND CRC (constant: crc of 'IEND')
    Tables.documents(s, dir)
      .select(d, unhex(bmpHex).as("bmp"), unhex(wavHex).as("wav"),
        unhex(pngHex).as("png"))
  }

  /** q88 — REAL media header decode, oracle-checked: parses the BMP and
    * WAV headers of [[mediaBlobs]] back out of the raw bytes (magic
    * strings, little-endian dims, sample rate, data length, duration)
    * with an expression program independent of the construction. The
    * DuckDB oracle recomputes every field closed-form from doc_id, so
    * an endianness/offset bug in EITHER construct or parse breaks the
    * hash match. Scales as one narrow projection — no shuffle. */
  def q88MediaHeaders(s: SparkSession, dir: String): DataFrame = {
    val bmp = col("bmp")
    val wav = col("wav")
    val bmpOk = (bmp.substr(lit(1), lit(2)).cast("string") === "BM") &&
      (leVal(bmp, 3, 4) === octet_length(bmp).cast("long")) &&
      (leVal(bmp, 11, 4) === 54L) && (leVal(bmp, 15, 4) === 40L) &&
      (leVal(bmp, 27, 2) === 1L)
    val dataLen = leVal(wav, 41, 4)
    val wavOk = (wav.substr(lit(1), lit(4)).cast("string") === "RIFF") &&
      (wav.substr(lit(9), lit(4)).cast("string") === "WAVE") &&
      (wav.substr(lit(13), lit(4)).cast("string") === "fmt ") &&
      (leVal(wav, 21, 2) === 1L) &&
      (leVal(wav, 5, 4) === octet_length(wav).cast("long") - 8) &&
      (octet_length(wav).cast("long") === dataLen + 44)
    mediaBlobs(s, dir)
      .select(col("doc_id"),
        bmpOk.as("bmp_ok"),
        leVal(bmp, 19, 4).cast(IntegerType).as("width"),
        leVal(bmp, 23, 4).cast(IntegerType).as("height"),
        leVal(bmp, 29, 2).cast(IntegerType).as("bpp"),
        leVal(bmp, 3, 4).as("bmp_file_size"),
        wavOk.as("wav_ok"),
        leVal(wav, 25, 4).as("wav_rate"),
        leVal(wav, 23, 2).cast(IntegerType).as("wav_channels"),
        leVal(wav, 35, 2).cast(IntegerType).as("wav_bits"),
        dataLen.as("wav_data_len"),
        ((dataLen * 1000).cast("double") / leVal(wav, 29, 4))
          .as("wav_duration_ms"))
      .orderBy("doc_id")
  }

  /** q141 — audio feature extraction over REAL PCM bytes: reads every
    * 16-bit little-endian SIGNED sample out of the WAV data chunk of
    * [[mediaBlobs]] (2 bytes at offset 45 + 2i, sign reconstructed
    * from the unsigned read), then aggregates peak amplitude, DC sum
    * and total energy as exact BIGINTs — the decode→feature-extract
    * stage of a multimodal pipeline, on actual bytes rather than
    * metadata. The oracle knows the alternating ±1000 sample pattern
    * closed-form, so a sign/offset/stride bug in the byte read breaks
    * the hash match. Per-row work is a codegen'd higher-order fold
    * over ≤ 2000 samples — narrow projection, no shuffle, scales
    * linearly. */
  def q141AudioFeatures(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    // native one-pass byte walk (functions/PcmStats): the declarative
    // per-sample substr/hex/conv twin below interprets its lambda per
    // sample — measured ~106 s at sf0.1 vs ~1 s for the kernel
    // (bit-equality asserted in MultimodalSpec)
    mediaBlobs(s, dir)
      .select(col("doc_id"),
        call_function("pcm16_stats", col("wav")).as("st"))
      .select(col("doc_id"),
        element_at(col("st"), 1).cast(IntegerType).as("n_samples"),
        element_at(col("st"), 2).as("peak"),
        element_at(col("st"), 3).as("dc_sum"),
        element_at(col("st"), 4).as("energy"))
      .orderBy("doc_id")
  }

  /** The declarative twin of the q141 kernel — a per-sample signed LE
    * read via substr/hex/conv lambdas. Semantically identical, ~100×
    * slower (interpreted lambda per sample); kept as the spec's
    * reference implementation. */
  private[graft] def audioFeaturesTwin(s: SparkSession, dir: String): DataFrame = {
    val wav = col("wav")
    val nS = ((octet_length(wav) - 44) / 2).cast(IntegerType)
    val samples = transform(sequence(lit(0), nS - lit(1)), i => {
      val u = conv(hex(wav.substr(lit(45) + i * 2, lit(1))), 16, 10)
        .cast("long") +
        conv(hex(wav.substr(lit(46) + i * 2, lit(1))), 16, 10)
          .cast("long") * 256L
      when(u >= 32768L, u - 65536L).otherwise(u)
    })
    mediaBlobs(s, dir)
      .select(col("doc_id"), samples.as("smp"))
      .select(col("doc_id"),
        size(col("smp")).as("n_samples"),
        array_max(transform(col("smp"), x => abs(x))).as("peak"),
        aggregate(col("smp"), lit(0L), (a, x) => a + x).as("dc_sum"),
        aggregate(col("smp"), lit(0L), (a, x) => a + x * x).as("energy"))
      .orderBy("doc_id")
  }

  /** q173 — image feature extraction over REAL pixel bytes: decodes
    * every 24bpp pixel of the [[mediaBlobs]] BMPs (offset/width/height
    * read from the header, rows walked at the 4-byte-aligned stride,
    * 0xFF padding skipped) and aggregates per-channel byte sums + the
    * mean pixel byte — actual image decoding, possible without codecs
    * because BMP stores raw samples. The pixel pattern restarts each
    * row, so the oracle knows every sum closed-form from doc_id: a
    * sign/stride/pad bug in the walk breaks the hash match, and
    * MultimodalSpec cross-checks pixel values against the JDK's own
    * ImageIO reader. Per-row work is the codegen'd [[graft.functions.BmpStats]]
    * byte loop (the declarative lambda twin below is the spec's
    * reference); a pure narrow projection — no shuffle, linear scale. */
  def q173ImageStats(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val st = col("st")
    mediaBlobs(s, dir)
      .select(col("doc_id"), call_function("bmp_stats", col("bmp")).as("st"))
      .select(col("doc_id"),
        element_at(st, 1).as("n_pixels"),
        element_at(st, 2).as("sum_b"),
        element_at(st, 3).as("sum_g"),
        element_at(st, 4).as("sum_r"),
        ((element_at(st, 2) + element_at(st, 3) + element_at(st, 4))
          .cast("double")
          / (element_at(st, 1) * 3).cast("double")).as("mean_byte"))
      .orderBy("doc_id")
  }

  /** Declarative per-pixel twin of [[graft.functions.BmpStats]] — the
    * same walk as substr/hex/conv lambdas over a pixel-index sequence.
    * Spec-only reference implementation (interpreted lambda per pixel,
    * orders of magnitude slower than the kernel). */
  private[graft] def imageStatsTwin(s: SparkSession, dir: String): DataFrame = {
    val bmp = col("bmp")
    val off = leVal(bmp, 11, 4)
    val w = leVal(bmp, 19, 4)
    val h = leVal(bmp, 23, 4)
    val stride = (w * 3 + 3) - pmod(w * 3 + 3, lit(4))
    def byteAt(p: Column): Column =
      conv(hex(bmp.substr((p + 1).cast(IntegerType), lit(1))), 16, 10)
        .cast("long")
    def chanSum(c: Int): Column =
      aggregate(sequence(lit(0L), w * h - 1), lit(0L), (acc, i) => {
        // Column./ is double division — recover the exact integer
        // row index from the remainder instead
        val x = pmod(i, w)
        val y = ((i - x) / w).cast("long")
        acc + byteAt(off + y * stride + x * 3 + c)
      })
    mediaBlobs(s, dir)
      .select(col("doc_id"),
        (w * h).as("n_pixels"),
        chanSum(0).as("sum_b"),
        chanSum(1).as("sum_g"),
        chanSum(2).as("sum_r"))
      .orderBy("doc_id")
  }

  /** One decoded media record from [[decodePartitions]]. */
  case class DecodedMeta(doc_id: Long, n_bytes: Int, width: Int,
      height: Int, bpp: Int)

  /** Partition-wise batch decode over binary payloads via
    * `mapPartitions` — the JVM shape of an Arrow-batched decode worker
    * (`mapInPandas` in PySpark): the decoder is instantiated ONCE per
    * partition (amortizing codec setup over the whole batch, exactly
    * why media pipelines batch by partition), then streams the
    * partition's rows through it. The decode is REAL: a little-endian
    * `ByteBuffer` view reads the BMP magic, dimensions and depth from
    * the actual header bytes of [[mediaBlobs]] — asserted
    * field-for-field against q88's independent expression parse in
    * MultimodalSpec. Input is repartitioned so batch size (and
    * therefore decoder memory) is controlled by the caller, not file
    * layout. */
  def decodePartitions(s: SparkSession, dir: String,
      numPartitions: Int = 32): org.apache.spark.sql.Dataset[DecodedMeta] = {
    import s.implicits._
    mediaBlobs(s, dir)
      .select(col("doc_id"), col("bmp"))
      .repartition(numPartitions, col("doc_id"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder setup happens HERE (once per batch)
        val order = java.nio.ByteOrder.LITTLE_ENDIAN
        rows.map { case (id, bytes) =>
          require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
            s"doc $id: not a BMP payload")
          val bb = java.nio.ByteBuffer.wrap(bytes).order(order)
          DecodedMeta(id, bytes.length,
            bb.getInt(18), bb.getInt(22), bb.getShort(28).toInt)
        }
      }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q42_binary_meta" -> (q42BinaryMeta _),
    "q43_png_decode" -> (q43PngDecode _),
    "q88_media_headers" -> (q88MediaHeaders _),
    "q141_audio_features" -> (q141AudioFeatures _),
    "q173_image_stats" -> (q173ImageStats _),
  )

  val oracles: Map[String, String] = Map(
    "q42_binary_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  md5(text) AS digest_md5,
        |  sha256(text) AS digest_sha256
        |FROM documents ORDER BY doc_id""".stripMargin,
    // every field recomputed CLOSED-FORM from doc_id — the Spark side
    // must roundtrip construct→bytes→parse (including the CRC
    // recomputation folded into png_ok) to the same values, so the
    // oracle catches offset/endianness/CRC bugs in either direction.
    // The single 16-byte frame is the constant PNG prefix
    // (signature + IHDR length + type), hence the literal digest.
    "q43_png_decode" ->
      """SELECT doc_id,
        |  TRUE AS png_ok,
        |  CAST(doc_id%1024+1 AS INTEGER) AS width,
        |  CAST(doc_id%768+1 AS INTEGER) AS height,
        |  CAST(8 AS INTEGER) AS bit_depth,
        |  CAST(2 AS INTEGER) AS color_type,
        |  CAST(45 AS INTEGER) AS n_bytes,
        |  CAST(1 AS INTEGER) AS n_frames,
        |  md5('89504E470D0A1A0A0000000D49484452') AS frames_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the data chunk holds S = ns*ch samples alternating +1000/−1000
    // (odd S ends on +1000) — peak/DC/energy follow closed-form, while
    // the Spark side must READ the signed LE samples out of the bytes
    // closed form: rows restart the 01/37 pattern; per row the B and R
    // channels hit ⌈w/2⌉ even offsets (0x01) + ⌊w/2⌋ odd (0x37), the
    // G channel the reverse; h rows scale the sums.
    "q173_image_stats" ->
      """SELECT doc_id,
        |  CAST(w * h AS BIGINT) AS n_pixels,
        |  CAST((a + 55 * b) * h AS BIGINT) AS sum_b,
        |  CAST((55 * a + b) * h AS BIGINT) AS sum_g,
        |  CAST((a + 55 * b) * h AS BIGINT) AS sum_r,
        |  CAST((2 * (a + 55 * b) + (55 * a + b)) * h AS DOUBLE)
        |    / CAST(w * h * 3 AS DOUBLE) AS mean_byte
        |FROM (SELECT doc_id, doc_id % 64 + 1 AS w, doc_id % 48 + 1 AS h,
        |        (doc_id % 64 + 2) // 2 AS a, (doc_id % 64 + 1) // 2 AS b
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q141_audio_features" ->
      """SELECT doc_id,
        |  CAST(s AS INTEGER) AS n_samples,
        |  CAST(1000 AS BIGINT) AS peak,
        |  CAST(CASE WHEN s % 2 = 0 THEN 0 ELSE 1000 END AS BIGINT) AS dc_sum,
        |  CAST(s * 1000000 AS BIGINT) AS energy
        |FROM (SELECT doc_id, (doc_id%1000+1) * (doc_id%2+1) AS s
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    // every field recomputed CLOSED-FORM from doc_id — the Spark side
    // must roundtrip construct→bytes→parse to the same values, so the
    // oracle catches offset/endianness bugs in either direction
    "q88_media_headers" ->
      """SELECT doc_id,
        |  TRUE AS bmp_ok,
        |  CAST(w AS INTEGER) AS width,
        |  CAST(h AS INTEGER) AS height,
        |  CAST(24 AS INTEGER) AS bpp,
        |  CAST(54 + ((3*w+3) - (3*w+3)%4) * h AS BIGINT) AS bmp_file_size,
        |  TRUE AS wav_ok,
        |  CAST(rate AS BIGINT) AS wav_rate,
        |  CAST(ch AS INTEGER) AS wav_channels,
        |  CAST(16 AS INTEGER) AS wav_bits,
        |  CAST(ns*ch*2 AS BIGINT) AS wav_data_len,
        |  CAST(ns*ch*2*1000 AS DOUBLE) / (rate*ch*2) AS wav_duration_ms
        |FROM (SELECT doc_id, doc_id%64+1 AS w, doc_id%48+1 AS h,
        |        CASE doc_id%4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |          WHEN 2 THEN 44100 ELSE 48000 END AS rate,
        |        doc_id%2+1 AS ch, doc_id%1000+1 AS ns
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
  )
}
