package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes Spark lacks as built-ins, composed scale-first. */
object Joins {

  /** Distributed as-of join: for every left row, attach the LATEST right row
    * with the same `key` and `right.time <= left.time` (at-or-before
    * semantics — a right row at exactly the left timestamp matches). Left
    * rows with no prior right row keep null asof columns (left-outer).
    *
    * Implementation is the merge-free big-data formulation: tag both sides,
    * union, and carry the last right-value struct forward per key in ONE
    * ordered window — a single sort-shuffle of |L| + |R| rows keyed on
    * `key`. No per-row range probe, no broadcast, no nested loop; skew
    * follows the key distribution exactly like any groupBy(key). (A
    * sort-merge as-of needs a custom physical operator; this gets the same
    * asymptotics from Catalyst built-ins.)
    *
    * The right side must be unique per (key, time) — dedupe first (e.g.
    * max_by per (key, time)); otherwise "the" latest row is ambiguous and
    * engines may legitimately disagree.
    *
    * Output: every left column, plus `asof_<time>` and `asof_<c>` for each
    * requested right value column.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      rightVals: Seq[String]): DataFrame = {
    val reserved = Seq("__side", "__rv", "__m") ++ (time +: rightVals).map(c => s"asof_$c")
    val clash = left.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"asOfJoin: left frame already uses reserved column name(s) ${clash.mkString(", ")}")
    val rv = struct((time +: rightVals).map(col): _*)
    // A null-time right row would sort first (nulls-first) and its non-null
    // __rv struct would be carried forward as a spurious "prior" match —
    // a null timestamp can never be "at or before" anything, so drop it.
    val r = right.where(col(time).isNotNull)
      .select(col(key), col(time), lit(0).as("__side"), rv.as("__rv"))
    val l = left.withColumn("__side", lit(1))
    // unionByName fills each side's missing columns with nulls: left rows get
    // a null right-value struct, right rows get null left payload columns
    val u = l.unionByName(r, allowMissingColumns = true)
    // right rows order BEFORE left rows at the same timestamp (side 0 < 1),
    // so an equal-time right row is visible to the left row's carry-forward
    val w = Window.partitionBy(col(key))
      .orderBy(col(time).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val out = left.columns.map(col) ++
      (time +: rightVals).map(c => col(s"__m.$c").as(s"asof_$c"))
    matched.select(out.toSeq: _*)
  }

  /** Banded range join: pair each point row with every interval row of the
    * same `key` whose `[start, end]` contains `pointTime` (both ends
    * inclusive) — without the nested-loop/cartesian plan a raw inequality
    * join produces.
    *
    * Bucketing: time is banded into `bandSeconds` buckets; an interval
    * explodes into the (few) buckets it overlaps, a point lands in exactly
    * one, and the pairing becomes an EQUI-join on (key, bucket) plus a cheap
    * residual filter. With band width >= the max interval width every
    * interval spans <= 2 buckets, so the join input is at most 2× the
    * interval count — this is how inequality joins stay shuffle-bound at
    * 100 TB. A point matches an interval through exactly one bucket (its
    * own), so no dedup is needed.
    */
  def bandedRangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      key: String,
      pointTime: String,
      start: String,
      end: String,
      bandSeconds: Long): DataFrame = {
    require(bandSeconds >= 1, "band width must be positive")
    val micros = bandSeconds * 1000000L
    val iexp = intervals.withColumn("__bucket",
      explode(sequence(
        expr(s"unix_micros($start) div ${micros}L"),
        expr(s"unix_micros($end) div ${micros}L"))))
    val pexp = points.withColumn("__bucket",
      expr(s"unix_micros($pointTime) div ${micros}L"))
    pexp.join(iexp, Seq(key, "__bucket"))
      .where(col(pointTime) >= col(start) && col(pointTime) <= col(end))
      .drop("__bucket")
  }

  /** Skew-salted equi-join: when a handful of hot keys dominate the left
    * side, a plain shuffle join piles every hot-key row onto one task. Salt
    * the join key into `salts` sub-keys — the left side deterministically
    * (hash of a per-row discriminator column, NOT a random number: results
    * must be reproducible under retries and across engines), the right side
    * by replicating each row into all `salts` sub-keys — and the hot key's
    * rows spread across `salts` tasks. Semantically identical to
    * `left.join(right, key)`: every (l, r) pair still meets on exactly one
    * (key, salt) value.
    *
    * Cost: right side ×`salts` through the shuffle — use for joins whose
    * right side is too big to broadcast but far smaller than the skewed
    * left (the classic fact-to-medium-dim shape AQE's skew handling does
    * not cover, e.g. when the skew is in the source, not a shuffle stage).
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      discriminator: String,
      salts: Int): DataFrame = {
    require(salts >= 1, "need at least one salt")
    val l = left.withColumn("__salt",
      pmod(xxhash64(col(discriminator)), lit(salts.toLong)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
