package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.StoredTables

/** The shared storage-truth rewrite recipe, pinned at its own layer (the
  * index families exercise it end-to-end; these are the edge semantics a
  * mirrored-but-untested recipe would silently get wrong): bounded
  * affected-partition rewrites, emptied-directory drops, the whole-table
  * fail-fast, duplicate-key delta normalization, and the loud failures for
  * over-retraction and never-counted keys.
  */
class StoredTablesSpec extends AnyFunSuite with SparkSpec {

  private def freshKeyed(prefix: String): String = {
    import spark.implicits._
    // 4 partitions × 3 keys each; key k lives in partition k / 3
    val dir = tmpDir(prefix) + "/tbl"
    (0L until 12L).map(k => (k, (k / 3).toInt, s"payload-$k"))
      .toDF("k", "p", "payload")
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    dir
  }

  private def freshCounted(prefix: String): String = {
    import spark.implicits._
    // additive side table: 3 partitions, counts 10, 20, 30, ...
    val dir = tmpDir(prefix) + "/counts"
    (0L until 9L).map(k => (k, (k / 3).toInt, (k + 1) * 10))
      .toDF("k", "p", "cnt")
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    dir
  }

  test("deleteByKey: removed keys leave the stored bytes; unaffected partitions keep their files; emptied partitions drop") {
    import spark.implicits._
    val dir = freshKeyed("st-delkey")
    // partition 3 untouched — record its exact file set (names + mtimes)
    def filesOf(p: Int): Set[(String, Long)] = {
      val f = new java.io.File(s"$dir/p=$p")
      if (!f.exists()) Set.empty
      else f.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(x => (x.getName, x.lastModified())).toSet
    }
    val p3Before = filesOf(3)
    assert(p3Before.nonEmpty)
    // remove key 7 (partition 2 survivor rewrite) and ALL of partition 0
    val removed = Seq(0L, 1L, 2L, 7L).toDF("k")
    StoredTables.deleteByKey(spark, dir, "p", "k", removed)
    val after = spark.read.parquet(dir)
    assert(after.select("k").collect().map(_.getLong(0)).toSet ==
      Set(3L, 4L, 5L, 6L, 8L, 9L, 10L, 11L),
      "exactly the removed keys are gone from the re-read parquet")
    assert(!new java.io.File(s"$dir/p=0").exists(),
      "a fully-emptied partition directory must drop")
    assert(filesOf(3) == p3Before,
      "an unaffected partition must keep its original files untouched")
  }

  test("deleteByKey: a removal emptying the whole table fails BEFORE mutating") {
    import spark.implicits._
    val dir = freshKeyed("st-delall")
    val all = (0L until 12L).toDF("k")
    val e = intercept[IllegalArgumentException] {
      StoredTables.deleteByKey(spark, dir, "p", "k", all)
    }
    assert(e.getMessage.contains("empties the whole table"), e.getMessage)
    assert(spark.read.parquet(dir).count() == 12L, "refusal must not mutate")
  }

  test("decrementCounts: exact subtraction, zero-reaching keys drop, emptied partitions drop") {
    import spark.implicits._
    val dir = freshCounted("st-dec")
    // key 4 (cnt 50): -20 → 30 survives; keys 0,1,2 (cnts 10,20,30): full
    // retraction → partition 0 empties and its directory drops
    val deltas = Seq((4L, 20L), (0L, 10L), (1L, 20L), (2L, 30L))
      .toDF("k", "__dec")
    StoredTables.decrementCounts(spark, dir, "p", Seq("k"), "cnt", deltas)
    val after = spark.read.parquet(dir)
      .select(col("k"), col("cnt")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == Map(3L -> 40L, 4L -> 30L, 5L -> 60L,
      6L -> 70L, 7L -> 80L, 8L -> 90L))
    assert(!new java.io.File(s"$dir/p=0").exists(),
      "the fully-retracted partition directory must drop")
  }

  test("decrementCounts: duplicate-key deltas pre-aggregate (sum once) instead of fanning out the join") {
    import spark.implicits._
    val dir = freshCounted("st-dupdec")
    // two retraction rows for key 4 (cnt 50): -10 and -15 must subtract 25
    // ONCE, leaving one row at 25 — not two duplicated rows at 40 and 35
    val deltas = Seq((4L, 10L), (4L, 15L)).toDF("k", "__dec")
    StoredTables.decrementCounts(spark, dir, "p", Seq("k"), "cnt", deltas)
    val rows = spark.read.parquet(dir).where(col("k") === 4L)
      .select(col("cnt")).collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(25L),
      s"duplicate delta keys must sum to one exact decrement, got $rows")
  }

  test("decrementCounts: over-retraction fails loudly BEFORE mutating (never a silent full delete)") {
    import spark.implicits._
    val dir = freshCounted("st-overdec")
    val deltas = Seq((0L, 11L)).toDF("k", "__dec") // stored cnt is 10
    val e = intercept[IllegalArgumentException] {
      StoredTables.decrementCounts(spark, dir, "p", Seq("k"), "cnt", deltas)
    }
    assert(e.getMessage.contains("exceeds"), e.getMessage)
    assert(spark.read.parquet(dir).where(col("k") === 0L).head().getAs[Long]("cnt") == 10L,
      "the refused retraction must not touch the stored count")
  }

  test("decrementCounts: retracting a never-counted key fails loudly (double-submitted batch shape)") {
    import spark.implicits._
    val dir = freshCounted("st-unknowndec")
    // first retraction drops key 0 entirely (exact full retraction) …
    StoredTables.decrementCounts(spark, dir, "p", Seq("k"),
      "cnt", Seq((0L, 10L)).toDF("k", "__dec"))
    assert(spark.read.parquet(dir).where(col("k") === 0L).count() == 0L)
    // … so the double-submitted SAME batch must fail, not silently no-op
    val e = intercept[IllegalArgumentException] {
      StoredTables.decrementCounts(spark, dir, "p", Seq("k"),
        "cnt", Seq((0L, 10L)).toDF("k", "__dec"))
    }
    assert(e.getMessage.contains("never counted"), e.getMessage)
  }

  test("LmIndex.repairBig completes a half-crashed deleteStored: uni landed, big repaired alone") {
    import spark.implicits._
    import graft.ops.LmIndex
    val dir = tmpDir("st-lmrepair") + "/lm"
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the rug"),
      (3L, "a bird flew over the rug")).toDF("id", "body")
    LmIndex.write(LmIndex.build(docs, col("id"), col("body")), dir)
    val removed = docs.where(col("id") === 2L)
    // simulate the crash: deleteStored's FIRST half (the uni decrement)
    // landed, the process died before the big decrement
    val d = LmIndex.build(removed, col("id"), col("body"))
    StoredTables.decrementCounts(spark, s"$dir/uni", "wb", Seq("w"), "c1",
      d.uni.withColumnRenamed("c1", "__dec"))
    // the documented one-call repair
    LmIndex.repairBig(spark, dir, removed, col("id"), col("body"))
    // stored tables now equal a from-scratch build on the survivors
    val expect = LmIndex.build(docs.where(col("id") =!= 2L),
      col("id"), col("body"))
    val got = LmIndex.read(spark, dir)
    def uniSet(t: LmIndex.LmTables) = t.uni.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    def bigSet(t: LmIndex.LmTables) = t.big.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(uniSet(got) == uniSet(expect))
    assert(bigSet(got) == bigSet(expect))
  }
}
