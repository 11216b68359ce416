package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Joins

/** As-of join semantics: at-or-before matching, equal-timestamp inclusion,
  * left-outer nulls, latest-wins, key isolation.
  */
class JoinsSpec extends AnyFunSuite with SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asOfJoin: at-or-before, equal-ts matches, no-match nulls, latest wins") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L), // equal-ts right row must match
      (2L, ts("2024-01-01 10:05:00"), 100L), // latest prior (10:04) wins
      (3L, ts("2024-01-01 09:00:00"), 100L), // before any right row -> nulls
      (4L, ts("2024-01-01 12:00:00"), 200L)  // other key matches only its own
    ).toDF("id", "ts", "k")
    val right = Seq(
      (ts("2024-01-01 09:30:00"), 100L, 1.0),
      (ts("2024-01-01 10:00:00"), 100L, 2.0),
      (ts("2024-01-01 10:04:00"), 100L, 3.0),
      (ts("2024-01-01 11:00:00"), 200L, 4.0)
    ).toDF("ts", "k", "v")

    val rows = Joins.asOfJoin(left, right, key = "k", time = "ts", rightVals = Seq("v"))
      .collect()
    assert(rows.head.schema.fieldNames.toSeq ==
      Seq("id", "ts", "k", "asof_ts", "asof_v"))
    val byId = rows.map(r => r.getLong(0) ->
      (if (r.isNullAt(3)) None else Some(r.getTimestamp(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(byId(1L) == (Some(ts("2024-01-01 10:00:00")), Some(2.0)))
    assert(byId(2L) == (Some(ts("2024-01-01 10:04:00")), Some(3.0)))
    assert(byId(3L) == (None, None))
    assert(byId(4L) == (Some(ts("2024-01-01 11:00:00")), Some(4.0)))
    assert(rows.length == 4, "every left row survives (left-outer)")
  }

  test("bandedRangeJoin: inclusive bounds, band-crossing intervals, key isolation") {
    import spark.implicits._
    // interval [10:02, 10:12] crosses a 5-minute band boundary (10:05, 10:10)
    val intervals = Seq(
      (10L, 100L, ts("2024-01-01 10:02:00"), ts("2024-01-01 10:12:00")),
      (11L, 200L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00"))
    ).toDF("ivl_id", "k", "w_start", "w_end")
    val points = Seq(
      (1L, 100L, ts("2024-01-01 10:02:00")), // == start (inclusive)
      (2L, 100L, ts("2024-01-01 10:07:30")), // middle band
      (3L, 100L, ts("2024-01-01 10:12:00")), // == end (inclusive)
      (4L, 100L, ts("2024-01-01 10:12:01")), // just past end -> no match
      (5L, 100L, ts("2024-01-01 10:01:59")), // just before start -> no match
      (6L, 200L, ts("2024-01-01 10:03:00")), // other key matches its interval
      (7L, 300L, ts("2024-01-01 10:03:00"))  // key with no intervals
    ).toDF("pt_id", "k", "pt_ts")
    val got = Joins.bandedRangeJoin(points, intervals, key = "k",
        pointTime = "pt_ts", start = "w_start", end = "w_end", bandSeconds = 300)
      .select("pt_id", "ivl_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 10L), (3L, 10L), (6L, 11L)),
      s"inclusive containment only, no duplicates across bands: $got")
  }

  test("saltedJoin == plain join on a skewed corpus; salt actually spreads the hot key") {
    import spark.implicits._
    // 90% of left rows share one hot key
    val left = ((0 until 900).map(i => (i.toLong, 1L)) ++
      (900 until 1000).map(i => (i.toLong, (i % 7 + 2).toLong))).toDF("row_id", "k")
    val right = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (5L, "c")).toDF("k", "v")

    val plain = left.join(right, "k").select("row_id", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Joins.saltedJoin(left, right, key = "k",
        discriminator = "row_id", salts = 8)
      .select("row_id", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain, "salting must not change the join result")

    // the hot key's left rows really get distributed over the salt space
    val saltSpread = left.where(col("k") === 1L)
      .withColumn("s", pmod(xxhash64(col("row_id")), lit(8L)))
      .select("s").distinct().count()
    assert(saltSpread >= 6, s"hot key spread over only $saltSpread of 8 salts")
  }
}
