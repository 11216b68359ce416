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

  /** SLIDING distinct-count rollup from stored hourly theta sketches: one
    * sketch per event-time hour (the durable shard table), then every
    * `windowHours`-hour sliding window answered by a UNION OVER STORED
    * BYTES ([[Hashing.thetaUnionAgg]]) — the time-series form of the
    * sketch-table pattern. An exact sliding `count_distinct` re-scans the
    * raw events once per window (w× write amplification); the sketch path
    * scans once ever, and new hours extend the table incrementally. Rows
    * carry the exact windowed distinct (the verification harness, q26
    * discipline) and an in-engine `within_bound` verdict at `relErr`
    * (sketches under 2^lgK distinct keys are exact, so at test scale the
    * estimate equals the exact count bit for bit).
    *
    * Output: (win_end, n_hours, exact_distinct, within_bound) — one row
    * per hour, window = (win_end − windowHours, win_end].
    */
  def slidingThetaDistinct(
      df: DataFrame,
      ts: Column,
      key: Column,
      windowHours: Int,
      lgK: Int = 12,
      relErr: Double = 0.05): DataFrame = {
    require(windowHours >= 1, "window must span at least one hour")
    val ev = df.select(date_trunc("hour", ts).as("h"), key.cast("long").as("k"))
    val hourly = ev.groupBy(col("h"))
      .agg(Hashing.thetaSketchAgg(col("k"), lgK).as("sk"))
      .localCheckpoint()
    val win = hourly.select(col("h").as("win_end"))
    // each hour contributes to the `windowHours` windows ending at h..h+w-1:
    // EXPLODE to those window keys and equi-join — a BETWEEN range join
    // would nested-loop over #hours² at scale; this shuffles w rows per
    // input row on an equi key. Windows past the last hour are dropped by
    // the semi join (only observed hours define windows).
    def toWindows(frame: DataFrame): DataFrame = frame
      .withColumn("win_end", explode(array((0 until windowHours).map(i =>
        col("h") + expr(s"INTERVAL $i HOURS")): _*)))
      .join(win, Seq("win_end"), "left_semi")
    val est = toWindows(hourly)
      .groupBy(col("win_end"))
      .agg(Hashing.thetaEstimate(Hashing.thetaUnionAgg(col("sk"), lgK)).as("est"),
        count(lit(1)).as("n_hours"))
    val exact = toWindows(ev.distinct())
      .groupBy(col("win_end"))
      .agg(count_distinct(col("k")).as("exact_distinct"))
    est.join(exact, "win_end")
      .select(col("win_end"), col("n_hours"), col("exact_distinct"),
        (abs(col("est") - col("exact_distinct").cast("double")) <=
          lit(relErr) * col("exact_distinct").cast("double")).as("within_bound"))
  }

  /** Per-group moment shards plus a `__total__` row ROLLED UP FROM THE
    * SHARD FRAME (not recomputed from the data — the frame is
    * localCheckpoint'd and the total is a sum over #groups rows, proving
    * the merge path the operator exists for).
    */
  /** Trailing-window volume-anomaly flags over an hourly count frame
    * (event_type, hr, n) — the scoring stage of q238, factored out so a
    * STREAM-maintained count table (additive per-micro-batch appends,
    * merged by plain re-summation) feeds the identical arithmetic: mean
    * and variance from exact integer sums over the trailing `window`
    * hours, z = (n − mean)/σ, flag |z| ≥ `zThresh` after `minHistory`
    * hours of warm-up. The analytic window runs over type-keyed hourly
    * rows — never raw events.
    */
  def volumeAnomalies(
      hourCounts: DataFrame,
      window: Int = 24,
      minHistory: Int = 12,
      zThresh: Double = 2.5): DataFrame = {
    val tw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("hr"))
      .rangeBetween(-window.toLong, -1L)
    val mean = col("s").cast("double") / col("c")
    val variance = col("sq").cast("double") / col("c") - mean * mean
    hourCounts
      .withColumn("s", sum(col("n")).over(tw))
      .withColumn("c", count(col("n")).over(tw))
      .withColumn("sq", sum(col("n") * col("n")).over(tw))
      .where(col("c") >= minHistory && variance > 0.0)
      .withColumn("z", (col("n").cast("double") - mean) / sqrt(variance))
      .where(abs(col("z")) >= zThresh)
      .select(col("event_type"), col("hr"), col("n"), col("z"))
  }

  def momentShards(df: DataFrame, value: Column, group: Column): DataFrame = {
    val shard = momentSums(df, value, group).localCheckpoint()
    val total = shard.agg(
      sum(col("n")).as("n"), sum(col("s1")).as("s1"), sum(col("s2")).as("s2"))
      .select(lit("__total__").as("scope"), col("n"), col("s1"), col("s2"))
    finalizeMoments(shard).unionByName(finalizeMoments(total))
  }
}
