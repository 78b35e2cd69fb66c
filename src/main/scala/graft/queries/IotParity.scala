package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.iot.{IotPipeline, Transforms}

/** Wires the IoT-23 parity core (`graft.iot.*` — the reference's entire
  * transformation program, `process_iot_data.py:107-187`) into the
  * driver's DuckDB oracle via a small checked-in fixture CSV covering
  * the four duration input classes (timedelta string / plain float
  * seconds / `-` null / malformed-days), the lossy presence→bool
  * coercion (incl. the literal-`"F"`⇒true case), `""` vs `-` null
  * paths, and the exact 22-column output order.
  */
object IotParity {

  val FixturePath = "/root/repo/fixtures/iot_conn.csv"

  /** q28 — the full reference transform over the fixture. `dir` is
    * unused (the parity core reads CSV, not the star schema). */
  def q28IotTransform(s: SparkSession, dir: String): DataFrame =
    Transforms.transform(IotPipeline.readCsv(s, FixturePath))
      .orderBy("uid")

  /** q57 — flow-log anonymization: pseudonymize the flow id (sha256)
    * and mask IPv4 host addresses to /24 (IPv6 left intact — masking
    * policy differs per address family). The privacy pass an IoT
    * pipeline runs before sharing conn.log-derived data. */
  def q57IpAnonymize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Transforms.transform(IotPipeline.readCsv(s, FixturePath))
      .select(
        sha2(col("uid").cast("binary"), 256).as("uid_hash"),
        regexp_replace(col("id_orig_h"),
          "^(\\d+\\.\\d+\\.\\d+)\\.\\d+$", "$1.0").as("orig_masked"),
        regexp_replace(col("id_resp_h"),
          "^(\\d+\\.\\d+\\.\\d+)\\.\\d+$", "$1.0").as("resp_masked"),
        col("proto"), col("label"))
      .orderBy("uid_hash")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_iot_transform" -> (q28IotTransform _),
    "q57_ip_anonymize" -> (q57IpAnonymize _),
  )

  /** DuckDB re-expression of the same program. Float32 staging is
    * replicated (`AS REAL` casts) so `duration_sec` doubles are
    * bit-identical to Spark's float→double promotion. */
  val oracles: Map[String, String] = Map(
    "q28_iot_transform" ->
      s"""WITH raw AS (
         |  SELECT * FROM read_csv('$FixturePath', header=true, nullstr='-',
         |    columns={'uid':'VARCHAR','id_orig_h':'VARCHAR','id_orig_p':'INTEGER',
         |      'id_resp_h':'VARCHAR','id_resp_p':'INTEGER','proto':'VARCHAR',
         |      'service':'VARCHAR','duration':'VARCHAR','orig_bytes':'BIGINT',
         |      'resp_bytes':'BIGINT','conn_state':'VARCHAR','local_orig':'VARCHAR',
         |      'local_resp':'VARCHAR','missed_bytes':'BIGINT','history':'VARCHAR',
         |      'orig_pkts':'BIGINT','orig_ip_bytes':'BIGINT','resp_pkts':'BIGINT',
         |      'resp_ip_bytes':'BIGINT','tunnel_parents':'VARCHAR','label':'VARCHAR',
         |      'detailed_label':'VARCHAR'})
         |), parsed AS (
         |  SELECT *,
         |    TRY_CAST(NULLIF(regexp_extract(duration, '(\\d+)[ \\t\\n\\x0B\\f\\r]+days', 1), '') AS REAL) * 864e2
         |    + TRY_CAST(NULLIF(regexp_extract(duration, 'days[ \\t\\n\\x0B\\f\\r]+(\\d{2}):', 1), '') AS REAL) * 36e2
         |    + TRY_CAST(NULLIF(regexp_extract(duration, ':(\\d{2}):', 1), '') AS REAL) * 6e1
         |    + TRY_CAST(NULLIF(regexp_extract(duration, ':(\\d{2})\\.', 1), '') AS REAL)
         |    + TRY_CAST(NULLIF(regexp_extract(duration, '\\.(\\d+)', 1), '') AS REAL) / 1e6
         |    AS dsum
         |  FROM raw
         |)
         |SELECT uid, id_orig_h, id_orig_p, id_resp_h, id_resp_p, proto,
         |  NULLIF(service, '') AS service,
         |  orig_bytes, resp_bytes, conn_state, missed_bytes, history,
         |  orig_pkts, orig_ip_bytes, resp_pkts, resp_ip_bytes,
         |  tunnel_parents, label, detailed_label,
         |  CASE WHEN dsum IS NULL THEN
         |    CASE WHEN contains(duration, 'days') THEN NULL
         |      ELSE CAST(TRY_CAST(duration AS REAL) AS DOUBLE) END
         |    ELSE dsum END AS duration_sec,
         |  (local_orig IS NOT NULL AND local_orig <> '') AS local_orig_bool,
         |  (local_resp IS NOT NULL AND local_resp <> '') AS local_resp_bool
         |FROM parsed ORDER BY uid""".stripMargin,
    "q57_ip_anonymize" ->
      s"""SELECT sha256(uid) AS uid_hash,
         |  regexp_replace(id_orig_h, '^(\\d+\\.\\d+\\.\\d+)\\.\\d+$$', '\\1.0') AS orig_masked,
         |  regexp_replace(id_resp_h, '^(\\d+\\.\\d+\\.\\d+)\\.\\d+$$', '\\1.0') AS resp_masked,
         |  proto, label
         |FROM read_csv('$FixturePath', header=true, nullstr='-',
         |  columns={'uid':'VARCHAR','id_orig_h':'VARCHAR','id_orig_p':'INTEGER',
         |    'id_resp_h':'VARCHAR','id_resp_p':'INTEGER','proto':'VARCHAR',
         |    'service':'VARCHAR','duration':'VARCHAR','orig_bytes':'BIGINT',
         |    'resp_bytes':'BIGINT','conn_state':'VARCHAR','local_orig':'VARCHAR',
         |    'local_resp':'VARCHAR','missed_bytes':'BIGINT','history':'VARCHAR',
         |    'orig_pkts':'BIGINT','orig_ip_bytes':'BIGINT','resp_pkts':'BIGINT',
         |    'resp_ip_bytes':'BIGINT','tunnel_parents':'VARCHAR','label':'VARCHAR',
         |    'detailed_label':'VARCHAR'})
         |ORDER BY uid_hash""".stripMargin,
  )
}
