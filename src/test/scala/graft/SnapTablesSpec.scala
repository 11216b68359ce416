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

  test("a crash between manifest write and pointer flip is repaired by re-running the publish") {
    import spark.implicits._
    val dir = tmpDir("snap-crash")
    SnapTables.publishInitial(spark, dir, "pb", table)
    // simulate the torn publish: a prior attempt wrote gen-1's manifest and
    // died BEFORE the pointer rename — the manifest exists, the pointer
    // still names gen 0, and gen 1 was never served. HDFS/local rename does
    // not overwrite, so without the delete-before-rename the retry dies.
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val leftover = new org.apache.hadoop.fs.Path(dir, "_manifests/gen-000001.tsv")
    val out = hfs.create(leftover, true)
    out.write("0\tno-such-file.parquet".getBytes("UTF-8"))
    out.close()
    assert(SnapTables.currentGeneration(spark, dir).contains(0))
    // the retried maintenance must REPLACE the unserved leftover and publish
    val gen = SnapTables.deleteByKey(spark, dir, "pb", "key",
      (1L to 12L).filter(_ % 4 == 0).toDF("key"))
    assert(gen == 1)
    assert(rows(SnapTables.resolve(spark, dir, "pb")) == survRows,
      "the re-published gen 1 must serve the survivors, not the crashed leftover")
  }

  test("rewritePartitions refuses survivor rows outside the affected set") {
    import spark.implicits._
    val dir = tmpDir("snap-stray")
    SnapTables.publishInitial(spark, dir, "pb", table)
    // survivors claim partition 1 rows while declaring only partition 0
    // affected — those rows would be written but never manifest-referenced
    val ex = intercept[IllegalArgumentException] {
      SnapTables.rewritePartitions(spark, dir, "pb", Seq(0),
        table.where(col("pb") === 1))
    }
    assert(ex.getMessage.contains("outside the affected set"))
    assert(SnapTables.currentGeneration(spark, dir).contains(0),
      "the refused rewrite must not advance the generation")
    assert(rows(SnapTables.resolve(spark, dir, "pb")) == allRows)
  }

  test("expire tolerates generations a tighter prior expire already dropped") {
    import spark.implicits._
    val dir = tmpDir("snap-reexpire")
    SnapTables.publishInitial(spark, dir, "pb", table)
    SnapTables.deleteByKey(spark, dir, "pb", "key", Seq(4L).toDF("key"))
    SnapTables.expire(spark, dir, "pb", keepGens = 1) // drops gen 0's manifest
    SnapTables.deleteByKey(spark, dir, "pb", "key", Seq(8L).toDF("key"))
    // keep window [0, 2] includes the already-dropped gen 0 — not corruption
    SnapTables.expire(spark, dir, "pb", keepGens = 3)
    assert(rows(SnapTables.resolve(spark, dir, "pb")) ==
      allRows.filterNot { case (k, _) => k == 4L || k == 8L })
  }

  test("appendPartitions: delta-only I/O, union manifest, pre-flip reader keeps the base") {
    import spark.implicits._
    val dir = tmpDir("snap-append")
    SnapTables.publishInitial(spark, dir, "pb", table)
    val inFlight = SnapTables.resolve(spark, dir, "pb")
    // pb=1 exists (accretes a file), pb=3 is a brand-new partition value
    val gen = SnapTables.appendPartitions(spark, dir, "pb",
      Seq((13L, "v13", 1), (14L, "v14", 3)).toDF("key", "payload", "pb"))
    assert(gen == 1)
    assert(rows(SnapTables.resolve(spark, dir, "pb")) ==
      allRows + ((13L, "v13")) + ((14L, "v14")))
    assert(rows(inFlight) == allRows,
      "a reader resolved before the append must not see the delta")
    val m0 = SnapTables.manifestEntries(spark, dir, 0)
    val m1 = SnapTables.manifestEntries(spark, dir, 1)
    assert(m1(0) == m0(0) && m1(2) == m0(2),
      "untouched partitions must carry their generation-N entries forward verbatim")
    assert(m0(1).toSet.subsetOf(m1(1).toSet) && m1(1).size > m0(1).size,
      "a touched partition must reference the union of old and new files")
    assert(m1(3).nonEmpty, "a new partition value must enter the manifest")
    // empty delta publishes nothing
    assert(SnapTables.appendPartitions(spark, dir, "pb",
      Seq.empty[(Long, String, Int)].toDF("key", "payload", "pb")) == 1)
  }

  test("compactPartitions folds accreted files into ~one per partition, content-invariant") {
    import spark.implicits._
    val dir = tmpDir("snap-compact")
    SnapTables.publishInitial(spark, dir, "pb", table)
    SnapTables.appendPartitions(spark, dir, "pb",
      Seq((13L, "v13", 1)).toDF("key", "payload", "pb"))
    SnapTables.appendPartitions(spark, dir, "pb",
      Seq((14L, "v14", 1)).toDF("key", "payload", "pb"))
    assert(SnapTables.manifestEntries(spark, dir, 2)(1).size == 3,
      "two appends must have accreted pb=1 to three referenced files")
    val expect = rows(SnapTables.resolve(spark, dir, "pb"))
    val preCompact = SnapTables.resolve(spark, dir, "pb")
    val gen = SnapTables.compactPartitions(spark, dir, "pb")
    assert(gen == 3)
    val m = SnapTables.manifestEntries(spark, dir, 3)
    assert(m(1).size == 1, "the accreted partition must fold to one file")
    assert(m(0) == SnapTables.manifestEntries(spark, dir, 2)(0),
      "single-file partitions must carry forward with zero I/O")
    assert(rows(SnapTables.resolve(spark, dir, "pb")) == expect,
      "compaction must be invisible in the rows")
    assert(rows(preCompact) == expect,
      "a reader resolved before the compaction keeps serving its files")
    // nothing left to fold: the verb is a no-op at the same generation
    assert(SnapTables.compactPartitions(spark, dir, "pb") == 3)
  }

  test("appendBatch: replay no-ops, checkpoint reset refused, rewrites carry the high-water mark") {
    import spark.implicits._
    val dir = tmpDir("snap-batch")
    SnapTables.publishInitial(spark, dir, "pb", table)
    val d0 = Seq((13L, "v13", 1)).toDF("key", "payload", "pb")
    assert(SnapTables.appendBatch(spark, dir, "pb", d0, batchId = 0L) == 1)
    assert(SnapTables.lastAppendBatch(spark, dir, 1).contains(0L))
    // the crash window the checkpoint cannot close: publication flipped,
    // commit log unwritten, batch 0 replays — recognized, publishes nothing
    assert(SnapTables.appendBatch(spark, dir, "pb", d0, batchId = 0L) == 1)
    assert(SnapTables.resolve(spark, dir, "pb")
      .where(col("key") === 13L).count() == 1,
      "a replayed batch must not duplicate its rows")
    // a maintenance rewrite between batches must not amnesia the mark —
    // and a delete of an appended row must survive the append's replay
    assert(SnapTables.deleteByKey(spark, dir, "pb", "key", Seq(13L).toDF("key")) == 2)
    assert(SnapTables.lastAppendBatch(spark, dir, 2).contains(0L),
      "rewrites must carry the batch high-water mark forward")
    assert(SnapTables.appendBatch(spark, dir, "pb", d0, batchId = 0L) == 2)
    assert(SnapTables.resolve(spark, dir, "pb")
      .where(col("key") === 13L).count() == 0,
      "a replayed append must not resurrect a deleted row")
    // the next real batch advances; a batch BELOW the mark is a reset
    // checkpoint over a live table — refused before any write
    assert(SnapTables.appendBatch(spark, dir, "pb",
      Seq((14L, "v14", 2)).toDF("key", "payload", "pb"), batchId = 1L) == 3)
    val ex = intercept[IllegalArgumentException] {
      SnapTables.appendBatch(spark, dir, "pb", d0, batchId = 0L)
    }
    assert(ex.getMessage.contains("reset"))
  }

  test("appendBatch: a different stream's checkpoint is refused even at an equal batch id") {
    import spark.implicits._
    val dir = tmpDir("snap-stream-id")
    SnapTables.publishInitial(spark, dir, "pb", table)
    assert(SnapTables.appendBatch(spark, dir, "pb",
      Seq((13L, "v13", 1)).toDF("key", "payload", "pb"),
      batchId = 0L, streamId = Some("/ckpt/A")) == 1)
    // the hole id-only logic cannot see: a RESET/SWAPPED checkpoint whose
    // first batch id EQUALS the recorded mark — id-only would classify it
    // as a replay and silently drop the new stream's batch 0
    val ex = intercept[IllegalArgumentException] {
      SnapTables.appendBatch(spark, dir, "pb",
        Seq((99L, "v99", 0)).toDF("key", "payload", "pb"),
        batchId = 0L, streamId = Some("/ckpt/B"))
    }
    assert(ex.getMessage.contains("/ckpt/A") && ex.getMessage.contains("/ckpt/B"),
      "the refusal must name both checkpoints")
    // a maintenance rewrite carries the stream identity forward with the mark
    SnapTables.deleteByKey(spark, dir, "pb", "key", Seq(13L).toDF("key"))
    val ex2 = intercept[IllegalArgumentException] {
      SnapTables.appendBatch(spark, dir, "pb",
        Seq((99L, "v99", 0)).toDF("key", "payload", "pb"),
        batchId = 5L, streamId = Some("/ckpt/B"))
    }
    assert(ex2.getMessage.contains("/ckpt/A"),
      "rewrites must not amnesia the stream identity")
    // the SAME stream's true replay is still a recognized no-op
    assert(SnapTables.appendBatch(spark, dir, "pb",
      Seq((13L, "v13", 1)).toDF("key", "payload", "pb"),
      batchId = 0L, streamId = Some("/ckpt/A")) == 2)
  }

  test("snapshotIngest: one generation per micro-batch; restart on the same checkpoint re-emits nothing") {
    import spark.implicits._
    val dir = tmpDir("snap-ingest")
    val src = tmpDir("snap-ingest-src")
    val ckpt = tmpDir("snap-ingest-ckpt")
    SnapTables.publishInitial(spark, dir, "pb", table)
    Seq((13L, "v13"), (14L, "v14"), (15L, "v15"), (16L, "v16"))
      .toDF("key", "payload")
      .repartition(2).write.mode("overwrite").parquet(src)
    def drain(): Unit = {
      val q = graft.streaming.Pipelines.snapshotIngest(
        spark.readStream.schema("key BIGINT, payload STRING")
          .option("maxFilesPerTrigger", 1).parquet(src),
        dir, "pb", ckpt,
        xform = b => b.withColumn("pb", pmod(col("key"), lit(3)).cast("int")))
      q.awaitTermination()
    }
    drain()
    val expect = allRows ++ (13L to 16L).map(k => (k, s"v$k"))
    assert(rows(SnapTables.resolve(spark, dir, "pb")) == expect)
    val gen = SnapTables.currentGeneration(spark, dir).get
    assert(gen >= 2, "two non-empty micro-batches must publish two generations")
    // restart on the same checkpoint: the drained source replays nothing
    drain()
    assert(SnapTables.currentGeneration(spark, dir).contains(gen),
      "a restart with no new data must publish no generation")
    assert(rows(SnapTables.resolve(spark, dir, "pb")) == expect)
  }

  private def lockPath(dir: String, gen: Int) =
    new org.apache.hadoop.fs.Path(dir, f"_manifests/.publish-$gen%06d.lock")

  private def writeLock(dir: String, gen: Int, identity: String): Unit = {
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val out = hfs.create(lockPath(dir, gen), true)
    out.write(identity.getBytes("UTF-8"))
    out.close()
  }

  test("single-writer ENFORCED: a held claim makes the second writer fail loudly; reclaimStale recovers") {
    import spark.implicits._
    val dir = tmpDir("snap-race")
    SnapTables.publishInitial(spark, dir, "pb", table)
    // writer A holds the gen-1 claim (equivalently: crashed holding it) —
    // the deterministic stand-in for the timing-dependent two-writer race;
    // both writers read gen 0, A claimed first, B must NOT silently orphan
    writeLock(dir, 1, "writer-A")
    val ex = intercept[IllegalStateException] {
      SnapTables.deleteByKey(spark, dir, "pb", "key", Seq(4L).toDF("key"))
    }
    assert(ex.getMessage.contains("claimed by another writer"))
    assert(SnapTables.currentGeneration(spark, dir).contains(0),
      "the refused writer must not advance the generation")
    assert(rows(SnapTables.resolve(spark, dir, "pb")) == allRows,
      "the table must keep serving a consistent generation")
    // operator recovery: A is known dead → reclaim, retry succeeds
    assert(SnapTables.reclaimStale(spark, dir) == Seq(1))
    assert(SnapTables.deleteByKey(spark, dir, "pb", "key",
      Seq(4L).toDF("key")) == 1)
    assert(rows(SnapTables.resolve(spark, dir, "pb")) == allRows - ((4L, "v4")))
  }

  test("two real concurrent writers: exactly one publishes, the loser throws, the table stays consistent") {
    import spark.implicits._
    val dir = tmpDir("snap-race2")
    SnapTables.publishInitial(spark, dir, "pb", table)
    // both writers race deleteByKey from the same base generation; the
    // interleaving is nondeterministic but the OUTCOME is not: whichever
    // thread claims gen 1 first publishes, the other fails either at the
    // claim (marker held) or at the post-claim base re-check (pointer
    // already advanced) — never a silent orphan
    val results = new java.util.concurrent.ConcurrentHashMap[String, Throwable]()
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val ts = Seq("A" -> 4L, "B" -> 8L).map { case (name, key) =>
      val t = new Thread(() => {
        org.apache.spark.sql.SparkSession.setActiveSession(spark)
        barrier.await()
        try {
          SnapTables.deleteByKey(spark, dir, "pb", "key", Seq(key).toDF("key"))
          ()
        } catch { case e: Throwable => results.put(name, e); () }
      }, s"racer-$name")
      t.start(); t
    }
    ts.foreach(_.join())
    assert(results.size == 1,
      s"exactly one writer must lose (got ${results.size} failures: " +
        s"${results.keySet()})")
    val loser = results.values.iterator.next()
    assert(loser.isInstanceOf[IllegalStateException] ||
      loser.isInstanceOf[IllegalArgumentException],
      s"the loser must fail loudly with the claim/recheck error, got: $loser")
    assert(loser.getMessage.contains("claimed by another writer") ||
      loser.getMessage.contains("advanced past"),
      s"unexpected loser error: ${loser.getMessage}")
    // the winner's publication is fully consistent
    assert(SnapTables.currentGeneration(spark, dir).contains(1))
    val got = rows(SnapTables.resolve(spark, dir, "pb"))
    val winnerKey = if (results.containsKey("A")) 8L else 4L
    assert(got == allRows.filterNot(_._1 == winnerKey),
      s"the table must serve exactly the winner's delete, got ${got.size} rows")
  }

  test("appendBatch's crash-replay recognizes its OWN leftover claim and self-heals") {
    import spark.implicits._
    val dir = tmpDir("snap-selfheal")
    SnapTables.publishInitial(spark, dir, "pb", table)
    val d = Seq((13L, "v13", 1)).toDF("key", "payload", "pb")
    // the prior attempt of THIS batch crashed after claiming gen 1: the
    // marker carries its stream+batch identity, so the replay keeps the
    // claim and completes the publication with no operator step
    writeLock(dir, 1, "stream:ckA:batch:7")
    assert(SnapTables.appendBatch(spark, dir, "pb", d, batchId = 7L,
      streamId = Some("ckA")) == 1)
    assert(rows(SnapTables.resolve(spark, dir, "pb")) == allRows + ((13L, "v13")))
    // …while a DIFFERENT batch hitting a foreign claim still fails loudly
    writeLock(dir, 2, "stream:ckA:batch:9")
    val ex = intercept[IllegalStateException] {
      SnapTables.appendBatch(spark, dir, "pb",
        Seq((14L, "v14", 1)).toDF("key", "payload", "pb"),
        batchId = 8L, streamId = Some("ckA"))
    }
    assert(ex.getMessage.contains("claimed by another writer"))
  }

  test("expire minAgeMs: a young generation outside keepGens survives; age 0 reclaims it") {
    import spark.implicits._
    val dir = tmpDir("snap-age")
    SnapTables.publishInitial(spark, dir, "pb", table)
    SnapTables.deleteByKey(spark, dir, "pb", "key", Seq(4L).toDF("key"))
    SnapTables.deleteByKey(spark, dir, "pb", "key", Seq(8L).toDF("key"))
    // gen 0 and 1 are outside keepGens=1 but seconds old — a long-running
    // reader may still hold their file lists; the age floor keeps them
    SnapTables.expire(spark, dir, "pb", keepGens = 1, minAgeMs = 3600L * 1000)
    assert(rows(SnapTables.resolveAt(spark, dir, "pb", 0)) == allRows,
      "a young expired-by-count generation must stay readable")
    assert(rows(SnapTables.resolveAt(spark, dir, "pb", 1)) == allRows - ((4L, "v4")))
    // operator decision: readers drained → count-only retention reclaims
    SnapTables.expire(spark, dir, "pb", keepGens = 1)
    intercept[IllegalArgumentException] {
      SnapTables.resolveAt(spark, dir, "pb", 0)
    }
    assert(rows(SnapTables.resolve(spark, dir, "pb")) ==
      allRows -- Set((4L, "v4"), (8L, "v8")))
  }

  test("compactPartitions targetBytes binpack: partitions of already-large files are left alone") {
    import spark.implicits._
    val dir = tmpDir("snap-binpack")
    SnapTables.publishInitial(spark, dir, "pb", table)
    SnapTables.appendPartitions(spark, dir, "pb",
      Seq((13L, "v13", 1)).toDF("key", "payload", "pb"))
    assert(SnapTables.manifestEntries(spark, dir, 1)(1).size == 2)
    // every parquet file here is >1 byte → none is "small" under
    // targetBytes=1 → nothing would fold → no-op at the same generation
    assert(SnapTables.compactPartitions(spark, dir, "pb", minFiles = 2,
      targetBytes = 1L) == 1)
    // with an honest target the two small files fold; content-invariant
    val expect = rows(SnapTables.resolve(spark, dir, "pb"))
    assert(SnapTables.compactPartitions(spark, dir, "pb", minFiles = 2,
      targetBytes = 64L * 1024 * 1024) == 2)
    assert(SnapTables.manifestEntries(spark, dir, 2)(1).size == 1)
    assert(rows(SnapTables.resolve(spark, dir, "pb")) == expect)
  }

  test("mergeCounts: additive increment as a generation; bucketing mismatch refused before publishing") {
    import spark.implicits._
    val dir = tmpDir("snap-merge")
    // counted table: key k → count 10k, partition k % 3
    SnapTables.publishInitial(spark, dir, "pb",
      (1L to 6L).map(k => (k, k * 10, (k % 3).toInt)).toDF("key", "n", "pb"))
    // delta: existing key 1 (+5, split over two rows — must pre-aggregate),
    // brand-new key 7 in its correct partition 1, new partition value 3
    val gen = SnapTables.mergeCounts(spark, dir, "pb", Seq("key"), "n",
      Seq((1L, 2L, 1), (1L, 3L, 1), (7L, 70L, 1), (9L, 90L, 3))
        .toDF("key", "n", "pb"))
    assert(gen == 1)
    val got = SnapTables.resolve(spark, dir, "pb")
      .collect().map(r => r.getAs[Long]("key") -> r.getAs[Long]("n")).toMap
    assert(got == Map(1L -> 15L, 2L -> 20L, 3L -> 30L, 4L -> 40L,
      5L -> 50L, 6L -> 60L, 7L -> 70L, 9L -> 90L))
    // a delta that re-buckets an existing key must fail loudly pre-publish
    val ex = intercept[IllegalArgumentException] {
      SnapTables.mergeCounts(spark, dir, "pb", Seq("key"), "n",
        Seq((2L, 1L, 0)).toDF("key", "n", "pb")) // key 2 lives in pb=2
    }
    assert(ex.getMessage.contains("different pb"))
    assert(SnapTables.currentGeneration(spark, dir).contains(1))
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
