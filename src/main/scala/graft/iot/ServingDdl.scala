package graft.iot

import org.apache.spark.sql.types._

/** Serving-store DDL generator: the ClickHouse `CREATE TABLE` for the
  * pipeline's output, derived FROM the Spark schema instead of
  * hand-maintained next to it. The reference ships this table as a
  * static script (`clickhouse_scripts/init_db.sql:8-31` — MergeTree,
  * `ORDER BY uid`); a user switching to this library gets the same
  * table from the schema the transform actually produces, so schema
  * drift between the Spark job and the serving store becomes a
  * compile/spec failure here rather than a positional-insert
  * corruption at load time (the DAG's `INSERT … SELECT` binds by
  * position — see [[IotPipeline.refreshServing]]).
  *
  * Type mapping follows the reference's own declarations:
  *   - STRING → `String`, except columns whose transform can emit
  *     NULL (`""`⇒NULL coercion — `service`) → `Nullable(String)`;
  *   - INT → `Nullable(Int32)`, BIGINT → `Nullable(Int64)`;
  *   - DOUBLE → `Nullable(Float64)` (the reference declares Float64
  *     for `duration_sec`; ClickHouse widens any narrower float on
  *     insert, and the transform's timedelta math is Float64 anyway);
  *   - BOOLEAN → `Nullable(UInt8)` (ClickHouse's pre-Bool spelling,
  *     as the reference declares for the `local_*_bool` flags).
  */
object ServingDdl {

  /** String-typed output columns the TRANSFORM can null (the `""`⇒NULL
    * coercion) — the reference declares exactly these Nullable. */
  private val NullableStrings = Set("service")

  /** ClickHouse column type for one Spark output field. */
  def clickhouseType(f: StructField): String = f.dataType match {
    case StringType =>
      if (NullableStrings(f.name)) "Nullable(String)" else "String"
    case IntegerType => "Nullable(Int32)"
    case LongType => "Nullable(Int64)"
    case FloatType | DoubleType => "Nullable(Float64)"
    case BooleanType => "Nullable(UInt8)"
    case t => throw new IllegalArgumentException(
      s"no serving-store mapping for column ${f.name}: $t")
  }

  /** The full `CREATE TABLE` statement for a transform-output schema.
    * Column ORDER is the schema's order — load is positional. */
  def createTable(schema: StructType,
      table: String = "default.iot_data",
      orderBy: String = "uid"): String = {
    val cols = schema.fields
      .map(f => s"    ${f.name} ${clickhouseType(f)}")
      .mkString(",\n")
    s"""CREATE TABLE IF NOT EXISTS $table (
       |$cols
       |) ENGINE = MergeTree()
       |ORDER BY $orderBy""".stripMargin
  }
}
