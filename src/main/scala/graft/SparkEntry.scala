package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one entry per implemented operator (SURVEY.md §2.4 +
  * the LLM-pipeline surface); `oracleSql` the DuckDB-equivalent SQL for
  * every query whose semantics DuckDB can express (approximate /
  * hash-parameterized ops are registered rows-only). Column aliases are
  * identical on both sides — the driver sorts columns by name before
  * hashing values.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ EventOps.queries ++ TextOps.queries ++
      VectorOps.queries ++ MultimodalOps.queries ++ IotParity.queries ++
      ExtendedOps.queries ++ SqlOps.queries ++ CorpusOps.queries ++
      WarehouseOps.queries ++ MlOps.queries ++
      graft.pipelines.CurationPipeline.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approx sketches, hash-parameterized LSH, the decode stub) →
    * driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ EventOps.oracles ++ TextOps.oracles ++
      VectorOps.oracles ++ MultimodalOps.oracles ++ IotParity.oracles ++
      ExtendedOps.oracles ++ SqlOps.oracles ++ CorpusOps.oracles ++
      WarehouseOps.oracles ++ MlOps.oracles ++
      graft.pipelines.CurationPipeline.oracles
}
