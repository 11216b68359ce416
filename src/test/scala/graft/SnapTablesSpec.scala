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
