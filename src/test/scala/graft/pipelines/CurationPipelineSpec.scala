package graft.pipelines

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Stage accounting for the end-to-end curation pipeline. */
class CurationPipelineSpec extends SparkTestBase {

  test("survivor set shrinks monotonically through the stages") {
    val all = graft.Tables.documents(spark, Sf).count()
    val quality = graft.Tables.documents(spark, Sf)
      .filter(size(split(col("text"), "\\s+")) >= 20).count()
    val surv = CurationPipeline.survivors(spark, Sf).count()
    assert(quality <= all)
    assert(surv <= quality)
    assert(surv > 0, "pipeline must not erase the corpus")
  }

  test("survivors are exact-dedup canonical and near-dup representatives") {
    val surv = CurationPipeline.survivors(spark, Sf)
    val ids = surv.select("doc_id").collect().map(_.getLong(0)).toSet
    // no two survivors share normalized text
    assert(surv.select("norm").distinct().count() == ids.size)
    // no two survivors are near-dups of each other: re-running the pair
    // stage over the survivor set must find nothing at the threshold
    val pairs = graft.queries.TextOps.ngramJaccardPairsOf(
      surv.join(graft.Tables.documents(spark, Sf).select("doc_id", "n_chars"),
        Seq("doc_id")),
      0.5)
    assert(pairs.count() == 0,
      "survivor set still contains near-duplicate pairs")
  }

  test("chunks cover each survivor's normalized text with stride 150") {
    val rows = CurationPipeline.run(spark, Sf).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    val lens = CurationPipeline.survivors(spark, Sf)
      .select(col("doc_id"), length(col("norm")).as("len")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(byDoc.keySet == lens.keySet)
    byDoc.foreach { case (doc, chunks) =>
      val expected = 1 + (lens(doc) - 1) / 150
      assert(chunks.length == expected, s"doc $doc chunk count")
      // chunk indices are dense 0..n-1
      assert(chunks.map(_.getInt(2)).sorted.toSeq == (0 until expected))
    }
  }
}
