package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.iot.{IotPipeline, IotSchema, Transforms}

/** Streaming variant of the IoT-23 pipeline — the "IoT connector" shape
  * of the north star: Zeek/conn.log CSVs land in a watched directory
  * (the standard sensor-log delivery), each new file flows through the
  * exact batch transform program (`graft.iot.Transforms` — the SAME
  * code the DuckDB oracle verifies via q28), and transformed records
  * append to the Parquet store with exactly-once file-source semantics
  * (checkpointed file ledger).
  *
  * The plan is identical to the batch pipeline's narrow
  * scan→project→write stage, so throughput matches `IotPipeline.run`
  * (measured 124.6 MB/s on this node, PERF.md) — streaming here adds
  * incremental ingest + checkpointing, not a different engine path.
  */
object IotStream {

  /** File-watch ingest with the batch reader's exact CSV options
    * (enforced schema, `-`⇒NULL, recursive lookup —
    * `IotPipeline.readCsv` mirrors `process_iot_data.py:245-253`). */
  def readCsvStream(spark: SparkSession, inputDir: String,
      maxFilesPerTrigger: Int = 32): DataFrame =
    spark.readStream
      .schema(IotSchema.raw)
      .option("header", true)
      .option("sep", ",")
      .option("nullValue", "-")
      .option("recursiveFileLookup", true)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(inputDir)

  /** Full incremental pipeline: watched CSV dir → reference transform →
    * Parquet append. `Trigger.AvailableNow` drains the backlog and
    * stops (batch-like run); pass a processing-time trigger for a
    * long-lived ingest daemon. */
  def run(spark: SparkSession, inputDir: String, outputDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    Transforms.transform(readCsvStream(spark, inputDir))
      .writeStream
      .format("parquet")
      .option("path", outputDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
