package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One cell of the upper-triangle covariance accumulator: dimension
  * pair (i ≤ j) and the exact scaled sum Σ floor((xᵢ−mᵢ)(xⱼ−mⱼ)·1e9). */
case class CovCell(i: Int, j: Int, cs: Long)

/** Distributed covariance-matrix accumulation as a typed [[Aggregator]]
  * — the PCA/dimensionality-reduction building block for the embedding
  * surface (q108). Given the per-dimension means (computed in a prior
  * exact pass), each input vector adds its centered outer-product's
  * upper triangle into ONE bounded d(d+1)/2-long buffer: no
  * 2080-rows-per-vector explode, no shuffle blowup — partial buffers
  * combine map-side and merge associatively, so the shuffle carries
  * one 2080-cell array per partition regardless of corpus size. That
  * bounded-state property is the 100 TB argument; the explode+groupBy
  * twin ships d(d+1)/2 rows PER VECTOR through the shuffle.
  *
  * Determinism: each product is floor-quantized to a BIGINT before
  * summation (the repo-wide idiom), so the total is an exact integer,
  * independent of row order and partitioning — and bit-comparable to
  * the DuckDB oracle's self-join formulation.
  */
case class CovarianceUpper(d: Int, means: Array[Double])
    extends Aggregator[Array[Float], Array[Long], Array[CovCell]] {

  require(means.length == d, s"means has ${means.length} entries, want $d")

  private def size: Int = d * (d + 1) / 2

  override def zero: Array[Long] = Array.ofDim[Long](size)

  override def reduce(b: Array[Long], x: Array[Float]): Array[Long] = {
    // null embeddings contribute nothing (they are likewise absent
    // from the mean pass: posexplode skips null arrays) — a real
    // corpus always contains failed extractions
    if (x == null) return b
    require(x.length == d, s"vector has ${x.length} dims, want $d")
    var k = 0
    var i = 0
    while (i < d) {
      val ci = x(i).toDouble - means(i)
      var j = i
      while (j < d) {
        b(k) += math.floor(ci * (x(j).toDouble - means(j)) * 1e9).toLong
        k += 1
        j += 1
      }
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k < a.length) { a(k) += b(k); k += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[CovCell] = {
    val out = Array.ofDim[CovCell](size)
    var k = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) { out(k) = CovCell(i, j, b(k)); k += 1; j += 1 }
      i += 1
    }
    out
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[CovCell]] =
    ExpressionEncoder[Array[CovCell]]()
}
