package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SnapTables

/** The snapshot-manifest storage layer: generation flip is atomic and
  * PUBLICATION-ordered (a reader resolved before a rewrite keeps serving
  * its generation after the flip — the serve-during-rewrite guarantee the
  * in-place rewrites only document), crashed writers' orphan files are
  * invisible (manifest-driven reads never trust directory listings), and
  * expiry reclaims exactly the unreferenced files.
  */
class SnapTablesSpec extends AnyFunSuite with SparkSpec {

  private def table = {
    import spark.implicits._
    // 12 rows over 3 partitions; keys 1..12, pb = key mod 3
    (1L to 12L).map(k => (k, s"v$k", (k % 3).toInt)).toDF("key", "payload", "pb")
  }

  private def rows(df: DataFrame): Set[(Long, String)] =
    df.select(col("key"), col("payload"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  private def allRows = (1L to 12L).map(k => (k, s"v$k")).toSet
  private def survRows = allRows.filterNot { case (k, _) => k % 4 == 0 }

  test("publishInitial + resolve roundtrip; pointer at gen 0") {
    val dir = tmpDir("snap-pub")
    SnapTables.publishInitial(spark, dir, "pb", table)
    assert(SnapTables.currentGeneration(spark, dir).contains(0))
    assert(rows(SnapTables.resolve(spark, dir, "pb")) == allRows)
  }

  test("deleteByKey publishes gen 1; a reader resolved BEFORE the flip still serves gen 0 AFTER it") {
    import spark.implicits._
    val dir = tmpDir("snap-iso")
    SnapTables.publishInitial(spark, dir, "pb", table)
    // the in-flight reader: resolved (and planned) against gen 0
    val inFlight = SnapTables.resolve(spark, dir, "pb")
    val gen = SnapTables.deleteByKey(spark, dir, "pb", "key",
      (1L to 12L).filter(_ % 4 == 0).toDF("key"))
    assert(gen == 1)
    // post-flip resolution serves the survivors
    assert(rows(SnapTables.resolve(spark, dir, "pb")) == survRows)
    // THE point of the layer: the pre-flip frame still returns every gen-0
    // row — its files were superseded, never deleted
    assert(rows(inFlight) == allRows,
      "a reader resolved before the rewrite must keep serving its generation")
    // time travel reaches both while both are retained
    assert(rows(SnapTables.resolveAt(spark, dir, "pb", 0)) == allRows)
    assert(rows(SnapTables.resolveAt(spark, dir, "pb", 1)) == survRows)
  }

  test("a crashed writer's orphan files are invisible: readers trust manifests, not listings") {
    import spark.implicits._
    val dir = tmpDir("snap-orphan")
    SnapTables.publishInitial(spark, dir, "pb", table)
    // simulate a rewrite that died after writing data but BEFORE the
    // pointer rename: drop a stray parquet file into a partition directory
    Seq((999L, "junk", 0)).toDF("key", "payload", "pb")
      .write.mode("append").partitionBy("pb").parquet(dir)
    assert(SnapTables.currentGeneration(spark, dir).contains(0),
      "no flip happened — the current generation must be unchanged")
    assert(rows(SnapTables.resolve(spark, dir, "pb")) == allRows,
      "unreferenced files must be invisible to manifest readers")
  }

  test("expire reclaims superseded files; retained generations keep serving") {
    import spark.implicits._
    val dir = tmpDir("snap-expire")
    SnapTables.publishInitial(spark, dir, "pb", table)
    SnapTables.deleteByKey(spark, dir, "pb", "key",
      (1L to 12L).filter(_ % 4 == 0).toDF("key"))
    SnapTables.expire(spark, dir, "pb", keepGens = 1)
    // the current generation survives expiry intact
    assert(rows(SnapTables.resolve(spark, dir, "pb")) == survRows)
    // gen 0 is gone: its manifest was pruned
    val ex = intercept[IllegalArgumentException] {
      SnapTables.resolveAt(spark, dir, "pb", 0).collect()
    }
    assert(ex.getMessage.contains("missing manifest"))
    // and its exclusive bytes were actually reclaimed: re-reading the raw
    // directories yields exactly the survivors (no superseded duplicates)
    assert(rows(spark.read.parquet(dir)) == survRows,
      "expire must delete every file only gen 0 referenced")
  }

  test("deleteByKey with no matching keys is a no-op at the same generation") {
    import spark.implicits._
    val dir = tmpDir("snap-noop")
    SnapTables.publishInitial(spark, dir, "pb", table)
    val gen = SnapTables.deleteByKey(spark, dir, "pb", "key", Seq(777L).toDF("key"))
    assert(gen == 0, "nothing matched — the generation must not advance")
    assert(rows(SnapTables.resolve(spark, dir, "pb")) == allRows)
  }

  test("decrementCounts: snapshot-published subtraction; pre-flip reader keeps the old statistics") {
    import spark.implicits._
    val dir = tmpDir("snap-dec")
    // additive side table: (key, n, pb) with n = 10 everywhere
    val counts = (1L to 12L).map(k => (k, 10L, (k % 3).toInt)).toDF("key", "n", "pb")
    SnapTables.publishInitial(spark, dir, "pb", counts)
    val inFlight = SnapTables.resolve(spark, dir, "pb")
    // retract 4 from keys 1..3, all 10 from key 4 (legitimate full retraction)
    val deltas = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 10L)).toDF("key", "__dec")
    val gen = SnapTables.decrementCounts(spark, dir, "pb", Seq("key"), "n", deltas)
    assert(gen == 1)
    def counted(df: DataFrame): Map[Long, Long] =
      df.select(col("key"), col("n")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val now = counted(SnapTables.resolve(spark, dir, "pb"))
    assert(now(1L) == 6L && now(2L) == 6L && now(3L) == 6L)
    assert(!now.contains(4L), "a key retracted to zero must drop")
    assert((5L to 12L).forall(k => now(k) == 10L))
    // the pre-flip reader still serves the UN-decremented statistics
    assert(counted(inFlight) == (1L to 12L).map(_ -> 10L).toMap,
      "a reader resolved before the decrement must keep its generation's counts")
    // the in-place recipe's guards carry over: over-retraction refuses
    val over = intercept[IllegalArgumentException] {
      SnapTables.decrementCounts(spark, dir, "pb", Seq("key"), "n",
        Seq((5L, 11L)).toDF("key", "__dec"))
    }
    assert(over.getMessage.contains("exceeds"))
    // unknown key (the already-dropped key 4) refuses — a silent no-op
    // would read as a landed retraction
    val unk = intercept[IllegalArgumentException] {
      SnapTables.decrementCounts(spark, dir, "pb", Seq("key"), "n",
        Seq((4L, 1L)).toDF("key", "__dec"))
    }
    assert(unk.getMessage.contains("never counted"))
    assert(SnapTables.currentGeneration(spark, dir).contains(1),
      "refused batches must not advance the generation")
  }

  test("a rewrite that would empty the table fails before publishing") {
    import spark.implicits._
    val dir = tmpDir("snap-empty")
    SnapTables.publishInitial(spark, dir, "pb", table)
    val ex = intercept[IllegalArgumentException] {
      SnapTables.deleteByKey(spark, dir, "pb", "key", (1L to 12L).toDF("key"))
    }
    assert(ex.getMessage.contains("empties the whole table"))
    assert(SnapTables.currentGeneration(spark, dir).contains(0))
    assert(rows(SnapTables.resolve(spark, dir, "pb")) == allRows,
      "the failed rewrite must leave the serving generation untouched")
  }
}
