package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.Tables

/** Multimodal columns: image/audio/video treated as opaque `binary`
  * payloads with typed metadata alongside. No media codecs exist in
  * this environment, so the *decode* step is a clearly-marked
  * deterministic STUB (hash-derived pseudo-metadata); everything
  * Spark-side — binary columns, schema, partitioning, batch shape —
  * is real and oracle-checked where expressible.
  *
  * In production the stubbed expressions are replaced by a vectorized
  * decode over `mapPartitions` (JVM codec) or Arrow-batched python
  * workers; the surrounding plan (pruned scan → per-partition decode →
  * metadata aggregate) is unchanged.
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

  /** q43 — STUBBED media decode: width/height/duration are derived from
    * a hash of the payload (NOT a real codec — deterministic fake so
    * the pipeline shape is testable). "Frame sampling" keeps every
    * k-th 16-byte window of the blob. Rows-only check (no oracle: the
    * stub is engine-specific by construction). */
  def q43DecodeStub(s: SparkSession, dir: String): DataFrame = {
    val payload = col("text").cast("binary")
    val h = xxhash64(payload)
    Tables.documents(s, dir)
      .select(col("doc_id"), payload.as("payload"))
      .select(col("doc_id"),
        octet_length(col("payload")).as("n_bytes"),
        // STUB: hash-derived fake dimensions, stands in for codec output
        pmod(xxhash64(col("payload")), lit(1280)).cast(IntegerType).plus(1).as("width"),
        pmod(xxhash64(col("payload"), lit(1)), lit(720)).cast(IntegerType).plus(1).as("height"),
        (pmod(xxhash64(col("payload"), lit(2)), lit(30000)).cast(IntegerType) / lit(1000.0)).as("duration_s"),
        // STUB frame sample: every 4th 16-byte window of the payload.
        // Surfaced as a count + order-sensitive digest (not the raw
        // array-of-binary) so downstream tooling — including the
        // driver's pandas-side rows check — sees only sortable scalars.
        frameSamples(col("payload")).as("frames"))
      .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
        col("duration_s"),
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

  /** One decoded media record from [[decodePartitions]]. */
  case class DecodedMeta(doc_id: Long, n_bytes: Int, width: Int,
      height: Int, n_frames: Int)

  /** Partition-wise batch decode over binary payloads via
    * `mapPartitions` — the JVM shape of an Arrow-batched decode worker
    * (`mapInPandas` in PySpark): the decoder is instantiated ONCE per
    * partition (amortizing codec/model setup over the whole batch,
    * exactly why media pipelines batch by partition), then streams the
    * partition's rows through it. The decode body is the same
    * deterministic STUB as q43 — in production only `decodeOne` is
    * replaced by a real codec; the partitioning, batch shape and
    * schema contract stay as tested here. Input is repartitioned so
    * batch size (and therefore decoder memory) is controlled by the
    * caller, not file layout. */
  def decodePartitions(s: SparkSession, dir: String,
      numPartitions: Int = 32): org.apache.spark.sql.Dataset[DecodedMeta] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .repartition(numPartitions, col("doc_id"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder setup happens HERE (once per batch);
        // the stub's "codec" reproduces q43's expressions EXACTLY:
        // xxhash64(payload) is hash(bytes, seed=42) and
        // xxhash64(payload, 1) chains hash(1, <prev>) — asserted
        // field-for-field against q43 in MultimodalSpec
        val hasher = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        rows.map { case (id, bytes) =>
          val h = hasher.hash(bytes, org.apache.spark.sql.types.BinaryType, 42L)
          val h2 = hasher.hash(1, org.apache.spark.sql.types.IntegerType, h)
          DecodedMeta(id, bytes.length,
            math.floorMod(h, 1280L).toInt + 1,
            math.floorMod(h2, 720L).toInt + 1,
            math.max(bytes.length / 64, 1))
        }
      }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q42_binary_meta" -> (q42BinaryMeta _),
    "q43_decode_stub" -> (q43DecodeStub _),
  )

  val oracles: Map[String, String] = Map(
    "q42_binary_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  md5(text) AS digest_md5,
        |  sha256(text) AS digest_sha256
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
