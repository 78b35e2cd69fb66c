package graft.iot

import org.apache.spark.sql.types._

/** The IoT-23 flow-record schema of the reference pipeline.
  *
  * Mirrors `IOT_SCHEMA` in the reference
  * (`src/jobs/process_iot_data.py:79-104`): 22 columns, all nullable,
  * Zeek `conn.log` shaped. Raw column names contain `.` and `-`
  * (`id.orig_h`, `detailed-label`) which the transform layer cleans
  * to `_` (see [[Transforms.cleanColumnNames]]).
  */
object IotSchema {

  /** Raw CSV schema, exact field order — the reader trusts it
    * positionally (`enforceSchema`, `process_iot_data.py:252`). */
  val raw: StructType = StructType(Seq(
    StructField("uid", StringType),
    StructField("id.orig_h", StringType),
    StructField("id.orig_p", IntegerType),
    StructField("id.resp_h", StringType),
    StructField("id.resp_p", IntegerType),
    StructField("proto", StringType),
    StructField("service", StringType),
    StructField("duration", StringType),
    StructField("orig_bytes", LongType),
    StructField("resp_bytes", LongType),
    StructField("conn_state", StringType),
    StructField("local_orig", StringType),
    StructField("local_resp", StringType),
    StructField("missed_bytes", LongType),
    StructField("history", StringType),
    StructField("orig_pkts", LongType),
    StructField("orig_ip_bytes", LongType),
    StructField("resp_pkts", LongType),
    StructField("resp_ip_bytes", LongType),
    StructField("tunnel_parents", StringType),
    StructField("label", StringType),
    StructField("detailed-label", StringType)
  ))

  /** Final output column order — part of the contract: the reference's
    * serving-store load is positional (`INSERT INTO … SELECT *`,
    * `dags/iot_processing_dag.py:69` against
    * `clickhouse_scripts/init_db.sql:8-29`). Derived from the
    * withColumn/drop sequence in `process_iot_data.py:107-187`. */
  val outputColumns: Seq[String] = Seq(
    "uid", "id_orig_h", "id_orig_p", "id_resp_h", "id_resp_p",
    "proto", "service", "orig_bytes", "resp_bytes", "conn_state",
    "missed_bytes", "history", "orig_pkts", "orig_ip_bytes",
    "resp_pkts", "resp_ip_bytes", "tunnel_parents", "label",
    "detailed_label", "duration_sec", "local_orig_bool",
    "local_resp_bool")

  /** Typed facade for API boundaries (not used in the hot path —
    * typed lambdas would defeat whole-stage codegen). */
  final case class IotConn(
      uid: String, id_orig_h: String, id_orig_p: Option[Int],
      id_resp_h: String, id_resp_p: Option[Int], proto: String,
      service: String, orig_bytes: Option[Long],
      resp_bytes: Option[Long], conn_state: String,
      missed_bytes: Option[Long], history: String,
      orig_pkts: Option[Long], orig_ip_bytes: Option[Long],
      resp_pkts: Option[Long], resp_ip_bytes: Option[Long],
      tunnel_parents: String, label: String, detailed_label: String,
      duration_sec: Option[Double], local_orig_bool: Boolean,
      local_resp_bool: Boolean)
}
