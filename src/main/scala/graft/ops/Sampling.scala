package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines. Everything
  * derives from the cross-engine hash of the row id — no RNG state, so splits
  * are reproducible across runs, engines, and cluster sizes, and a row's
  * assignment never changes when the corpus grows (the property that keeps
  * eval sets uncontaminated across dataset versions).
  */
object Sampling {

  /** Stable bucket in [0, 100) for an id (salted). */
  def hashBucket(id: Column, salt: String = "split"): Column =
    pmod(Hashing.hash60(concat(lit(salt + "-"), id.cast("string"))), lit(100L))

  /** DuckDB twin of [[hashBucket]]. */
  def duckHashBucket(idExpr: String, salt: String = "split"): String =
    s"(${Hashing.duckHash60(s"('$salt-' || CAST($idExpr AS VARCHAR))")} % 100)"

  /** Add bucket + split-label columns: train / val / test by bucket ranges
    * [0, trainPct), [trainPct, trainPct+valPct), rest.
    */
  def withSplit(df: DataFrame, id: Column, trainPct: Int, valPct: Int,
      salt: String = "split"): DataFrame = {
    val b = hashBucket(id, salt)
    df.withColumn("bucket", b)
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Deterministic per-group sample: the n group members with the smallest
    * (hash, id) — an order-stable stand-in for reservoir sampling whose
    * output is identical on any partitioning. One shuffle on the group key.
    */
  def perGroupSample(df: DataFrame, group: Column, id: Column, n: Int,
      salt: String = "sample"): DataFrame = {
    val h = Hashing.hash60(concat(lit(salt + "-"), id.cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group)
      .orderBy(h.asc, id.asc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= n)
      .drop("__rn")
  }
}
