package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Property tests for the time-window group key (SURVEY.md §5.2): every event
  * lands in exactly ceil(width/slide) sliding windows, each of which contains
  * its timestamp; avg == sum/count.
  */
class WindowPropertySpec extends AnyFunSuite with SparkSpec {

  test("window(ts, 5m, 1m): every event is assigned to exactly 5 windows, each containing ts") {
    import spark.implicits._
    // One Spark job over a scalacheck-generated batch (per-sample jobs would
    // be needlessly slow): arbitrary epoch seconds in 2024.
    val gen = Gen.listOfN(300, Gen.choose(1704067200L, 1735689599L))
    val samples = gen.sample.get
    val df = samples.toDF("epoch")
      .select(col("epoch"), timestamp_seconds(col("epoch")).as("ts"))
      .select(col("epoch"), col("ts"), window(col("ts"), "5 minutes", "1 minute").as("w"))
    val rows = df.select(col("epoch"), col("ts"),
        col("w.start").as("ws"), col("w.end").as("we")).collect()
    // explode happened inside window(): group back by event
    val byEvent = rows.groupBy(r => (r.getLong(0), r.getTimestamp(1)))
    assert(byEvent.nonEmpty)
    byEvent.foreach { case ((_, ts), ws) =>
      assert(ws.length == 5, s"event $ts in ${ws.length} windows, expected 5")
      ws.foreach { r =>
        val (s, e) = (r.getTimestamp(2), r.getTimestamp(3))
        assert(!ts.before(s) && ts.before(e), s"$ts outside [$s, $e)")
        assert(e.getTime - s.getTime == 5 * 60 * 1000)
        assert(s.getTime % (60 * 1000) == 0, "window starts are slide-aligned")
      }
      // the 5 window starts are consecutive minutes
      val starts = ws.map(_.getTimestamp(2).getTime).sorted
      assert(starts.zip(starts.tail).forall { case (a, b) => b - a == 60 * 1000 })
    }
  }

  test("avg == sum/count on windowed aggregation (exact arithmetic)") {
    import spark.implicits._
    val gen = Gen.listOfN(200, Gen.zip(Gen.choose(0L, 3600L), Gen.choose(1, 100)))
    val df = gen.sample.get.toDF("off", "v")
      .select(timestamp_seconds(lit(1704067200L) + col("off")).as("ts"), col("v"))
    val agg = df.groupBy(window(col("ts"), "10 minutes"))
      .agg(avg("v").as("a"), sum("v").as("s"), count(lit(1)).as("c"))
      .collect()
    agg.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getLong(2).toDouble / r.getLong(3)) < 1e-12)
    }
  }
}
