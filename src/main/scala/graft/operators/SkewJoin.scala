package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * When one join key carries a disproportionate share of the big side
  * (hot user, boilerplate document, null-ish default key), hash
  * partitioning sends that key's entire volume to one task. AQE's
  * skew-join splits oversized SORT-MERGE partitions, but only
  * post-shuffle and only for supported join types; explicit salting is
  * the general fix: scatter the big side's rows for each key across
  * `saltBuckets` sub-keys, replicate the small side once per bucket,
  * and join on (key, salt). Parallelism for a hot key improves by
  * `saltBuckets`× at the cost of `saltBuckets`× the small side.
  *
  * The salt is derived deterministically from a caller-chosen row
  * discriminator (any column(s) roughly unique per big-side row — a
  * primary key, or the row's remaining join-irrelevant columns), NOT
  * from `rand()`: reruns and retried tasks produce identical
  * assignments, which keeps results reproducible and speculative
  * execution safe.
  */
object SkewJoin {

  /** Inner equi-join `big ⋈ small` on `bigKey === smallKey`, salted.
    *
    * @param rowDiscriminator column(s) of `big` that spread its rows
    *                         (e.g. the big side's primary key)
    */
  def saltedInnerJoin(big: DataFrame, bigKey: Column,
      small: DataFrame, smallKey: Column,
      rowDiscriminator: Seq[Column], saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val salted = big.withColumn("_salt",
      pmod(xxhash64(rowDiscriminator: _*), lit(saltBuckets.toLong)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    salted.join(replicated,
        salted("_salt") === replicated("_salt") && bigKey === smallKey)
      .drop("_salt")
  }
}
