package graft.iot

import org.apache.spark.sql.SparkSession

/** S3 — config-driven session bootstrap, mirroring the reference's
  * YAML → SparkSession builder (`process_iot_data.py:40-76`,
  * `config.yaml:6-10`): named keys (`app_name`, `master`,
  * `driver_memory`, `adaptive_enabled`) are applied explicitly, every
  * OTHER `spark.*` key is passed through verbatim (the passthrough loop
  * at `:56-65`), and non-spark keys are ignored.
  *
  * The config format is the flat `key: value` subset of YAML the
  * reference actually uses — parsed here with no external dependency
  * (the build is zero-egress; a YAML library is not available).
  */
object ConfigSession {

  /** Parse flat `key: value` lines (comments `#`, blank lines, quoted
    * values). Nested sections are flattened as `section.key` when
    * indented under `section:`. */
  def parse(text: String): Map[String, String] = {
    var section = ""
    val out = Map.newBuilder[String, String]
    text.linesIterator.foreach { raw =>
      val noComment = raw.takeWhile(_ != '#')
      val line = noComment.trim
      if (line.nonEmpty && line.contains(":")) {
        val indented = noComment.startsWith(" ") || noComment.startsWith("\t")
        val (k, v) = line.splitAt(line.indexOf(":"))
        val value = v.drop(1).trim.stripPrefix("\"").stripSuffix("\"")
          .stripPrefix("'").stripSuffix("'")
        if (value.isEmpty) { if (!indented) section = k.trim }
        else out += (if (indented && section.nonEmpty) s"$section.${k.trim}"
                     else k.trim) -> value
      }
    }
    out.result()
  }

  /** Keys the reference handles explicitly and therefore excludes from
    * the generic passthrough (`process_iot_data.py:56-65`; the
    * reference's exclusion list also names `driver_class_path` and
    * `jars`, consumed by spark-submit flags rather than session conf). */
  private val Handled = Set("app_name", "master", "driver_memory",
    "adaptive_enabled", "driver_class_path", "jars")

  /** The `(key, value)` pairs a config maps onto the session builder —
    * pure, so it is unit-testable without creating a session. Keys in
    * the `spark:` section other than the named ones are re-prefixed and
    * applied as `spark.<key>` — exactly the reference's passthrough
    * loop (`spark_builder.config(f"spark.{key}", value)`,
    * `process_iot_data.py:56-65`), so `sql.shuffle.partitions: 64`
    * under `spark:` sets conf `spark.sql.shuffle.partitions`.
    * Reference-faithful sharp edge: a key written WITH the prefix
    * (`spark.sql.shuffle.partitions` under `spark:`) re-prefixes to
    * the meaningless `spark.spark.sql...` — exactly what the
    * reference's loop does with such a config. */
  def sparkConfs(cfg: Map[String, String]): Seq[(String, String)] = {
    val section = cfg.collect {
      case (k, v) if k.startsWith("spark.") => k.drop("spark.".length) -> v
    }
    val named = Seq(
      section.get("driver_memory").map("spark.driver.memory" -> _),
      section.get("adaptive_enabled").map("spark.sql.adaptive.enabled" -> _),
    ).flatten
    val passthrough = section.view
      .filterKeys(!Handled.contains(_)).toSeq.sortBy(_._1)
      .map { case (k, v) => s"spark.$k" -> v }
    named ++ passthrough
  }

  /** Build the session: appName + master from config (defaulted like
    * the reference), everything else via [[sparkConfs]]. */
  def build(cfg: Map[String, String]): SparkSession = {
    val b = SparkSession.builder()
      .appName(cfg.getOrElse("spark.app_name", "IoTDataProcessing"))
      .master(cfg.getOrElse("spark.master", "local[*]"))
    sparkConfs(cfg).foreach { case (k, v) => b.config(k, v) }
    b.getOrCreate()
  }
}
