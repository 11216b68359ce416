package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGEABLE exact-moment shard tables — the numeric companion of the HLL
  * (q125) and theta (q136) sketch tables: each shard (source, day,
  * partition) stores exact decimal sums (n, Σv, Σv²) of a metric, and any
  * rollup — global mean, variance, a month of days, a source group — is a
  * SUM OVER STORED SHARD ROWS with no rescan of the data. Unlike a
  * sketch, moments merge EXACTLY under any grouping (decimal addition is
  * associative), so the rolled-up mean/variance is bit-identical to a
  * direct computation; the only approximation anywhere is the final
  * decimal→double cast, which both engines round identically.
  *
  * v is squared in DOUBLE first (a deterministic per-row product) and the
  * products are summed in decimal(38,18) (exact, order-independent) — the
  * Num.dsum38 discipline. 20 integer digits of headroom: at 10^13 rows of
  * unit-scale v² the sum stays under 10^14, far inside the 38-digit cap.
  */
object Stats {

  /** The raw STORED form: per-group exact decimal sums (scope, n, s1, s2).
    * This is what a shard writes durably; any union of such frames (more
    * days, more sources, per-micro-batch appends from a stream) re-merges
    * through [[mergeMoments]] with bit-exact results.
    */
  def momentSums(df: DataFrame, value: Column, group: Column): DataFrame = {
    val v = value.cast("double")
    df.select(group.cast("string").as("scope"), v.as("v"))
      .groupBy(col("scope"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("v").cast("decimal(38,18)")).as("s1"),
        sum((col("v") * col("v")).cast("decimal(38,18)")).as("s2"))
  }

  /** Merge a frame of stored (scope, n, s1, s2) rows — possibly many rows
    * per scope, from different shards/days/micro-batches — back to one row
    * per scope. Decimal addition is associative, so this is EXACT under any
    * grouping of the inputs.
    */
  def mergeMoments(sums: DataFrame): DataFrame =
    sums.groupBy(col("scope"))
      .agg(sum(col("n")).as("n"), sum(col("s1")).as("s1"), sum(col("s2")).as("s2"))

  /** Finalize stored sums to reported statistics: (scope, n, sum_v, mean,
    * variance) with population variance (Σv² − (Σv)²/n)/n evaluated from
    * the exact sums — the only rounding anywhere is the final
    * decimal→double cast, identical in both engines.
    */
  def finalizeMoments(sums: DataFrame): DataFrame = {
    val s1d = col("s1").cast("double")
    val s2d = col("s2").cast("double")
    val nd = col("n").cast("double")
    sums.select(col("scope"), col("n"), s1d.as("sum_v"),
      (s1d / nd).as("mean"),
      ((s2d - s1d * s1d / nd) / nd).as("variance"))
  }

  /** Per-group moment shards plus a `__total__` row ROLLED UP FROM THE
    * SHARD FRAME (not recomputed from the data — the frame is
    * localCheckpoint'd and the total is a sum over #groups rows, proving
    * the merge path the operator exists for).
    */
  def momentShards(df: DataFrame, value: Column, group: Column): DataFrame = {
    val shard = momentSums(df, value, group).localCheckpoint()
    val total = shard.agg(
      sum(col("n")).as("n"), sum(col("s1")).as("s1"), sum(col("s2")).as("s2"))
      .select(lit("__total__").as("scope"), col("n"), col("s1"), col("s2"))
    finalizeMoments(shard).unionByName(finalizeMoments(total))
  }
}
