package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: runs the headline query subset on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Results are fully materialized through the noop sink
  * (count() alone would let Catalyst prune most of the work).
  *
  * Methodology: each query is executed twice. The FIRST (cold) run includes
  * Catalyst planning, AQE stage re-optimization and whole-stage-codegen
  * compilation — one-off driver costs that dominate at test scale but
  * amortize to noise on a long-running cluster. The SECOND (warm) run
  * measures steady-state data throughput — the number the 100 TB design
  * targets. The headline `value` stays the COLD total; warm numbers are
  * reported alongside. NOTE on cross-round comparison: since round 2 a
  * one-time engine warm-up query runs before the first measured query, so
  * cold totals no longer charge session/JVM/parquet-reader startup to the
  * first query — round-1 totals include that startup and read slightly
  * high in comparison.
  *
  * A query that throws is reported with "ok": false and excluded from both
  * totals — a failed run is never silently folded into the headline.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class Res(name: String, cold: Double, warm: Double, ok: Boolean)

    // Warm the engine once (JVM/JIT, codegen framework, parquet reader and
    // shuffle machinery init) so the first measured query is not charged for
    // session startup. Each query still pays its own planning and codegen in
    // its cold number.
    Tables.load(spark, sfDir, "nation").groupBy("n_regionkey").count()
      .write.format("noop").mode("overwrite").save()

    val results = SparkEntry.benchQueries.map { q =>
      def once(): Double = {
        val t0 = System.nanoTime()
        q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        // Inter-query isolation (round-10 methodology pin): on a 128 GiB
        // local[*] heap a full GC almost never fires on its own, so
        // broadcast/accumulator garbage from earlier queries piles up until
        // the ContextCleaner stalls SOME later query's run — measured as
        // late-session queries reading up to 10x their isolated TimeQuery
        // times (q117 11.85 s in-session vs 1.08 s isolated, round 10)
        // while a fresh session reproduces the committed numbers. One
        // explicit collection per query returns the session to a known
        // state; the cost is outside the timed window.
        //
        // Round-11 addition: localCheckpoint() blocks from earlier queries
        // also pile up in the block manager across the ~350-query session
        // (the GC alone cannot reclaim blocks the context still references)
        // and distorted late-session tails — q225 read 7.0 s in-session vs
        // 2.6 s isolated in round 10. Every checkpoint RDD is dead once its
        // query's runs finish, so sweep them before the collection; both
        // steps run outside the timed window.
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        System.gc()
        val cold = once()
        // steady-state = min of two warm runs (min is the robust estimator
        // under shared-machine noise; mean would fold interference in)
        val warm = math.min(once(), once())
        Res(q.name, cold, warm, ok = true)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] ${q.name} FAILED: ${e.getMessage}")
          Res(q.name, -1.0, -1.0, ok = false)
      }
    }

    // Streaming throughput: the reference's own workload shape (producer
    // JSON -> Kinesis -> parse -> enrich -> windowed agg -> parquet append),
    // run end to end as a real StreamingQuery over a file-backed envelope
    // stream at the scale factor's article volume. The reference's implied
    // envelope is ~500 MB over ~50 min (BASELINE.md) ≈ 0.17 MB/s sustained.
    val streaming = {
      import org.apache.spark.sql.functions.{length => blen, col, sum}
      val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1).toDouble).getOrElse(0.1)
      val n = math.max(10000L, (6000000 * sf).toLong) // ~reference total volume at sf0.1
      val envDir = Files.createTempDirectory("graft-bench-env").toString
      val outDir = Files.createTempDirectory("graft-bench-out").toString
      val ckptDir = Files.createTempDirectory("graft-bench-ckpt").toString
      val env = graft.ops.DataGen.articles(spark, n)
      env.write.mode("overwrite").parquet(envDir) // datagen excluded from timing
      val inputBytes = spark.read.parquet(envDir)
        .agg(sum(blen(col("data")))).head().getLong(0)
      // Methodology pin (round-8 verdict #7): MB/s swung 34-224 across
      // rounds on unchanged code. A fixed WARM-UP drain (excluded from the
      // measurement — it pays streaming-machinery init, state-store and
      // sink-committer class loading) followed by min of THREE measured
      // drains (fresh sink+checkpoint each; min is the same robust
      // estimator the query timings use). All runs are recorded in
      // sec_runs so the artifact itself documents the spread.
      def drain(run: Int): (Double, Long) = {
        val out = s"$outDir/run$run"
        val ckpt = s"$ckptDir/run$run"
        val t0 = System.nanoTime()
        val q = graft.streaming.Pipelines.articlesToParquet(
          spark, graft.streaming.StreamSource.FileEnvelopeSource(envDir), out, ckpt)
        q.awaitTermination()
        ((System.nanoTime() - t0) / 1e9, spark.read.parquet(out).count())
      }
      drain(0) // warm-up, unmeasured
      val runs = (1 to 3).map(drain)
      val secs = runs.map(_._1)
      require(runs.map(_._2).distinct.size == 1,
        s"streaming drains disagree: ${runs.map(_._2).mkString(", ")} windows")
      val sec = secs.min
      s"""{"rows":$n,"input_mb":${inputBytes / 1e6},"sec":${f"$sec%.2f"},""" +
        s""""sec_runs":[${secs.map(s => f"$s%.2f").mkString(",")}],""" +
        s""""rows_per_sec":${(n / sec).toLong},"mb_per_sec":${f"${inputBytes / 1e6 / sec}%.1f"},""" +
        s""""finalized_windows":${runs.head._2}}"""
    }

    def fmt(d: Double): String = f"$d%.4f"
    val okRes = results.filter(_.ok)
    val qsCold = results.map(r => Json.str(r.name) + ":" + (if (r.ok) fmt(r.cold) else "-1"))
      .mkString("{", ",", "}")
    val qsWarm = results.map(r => Json.str(r.name) + ":" + (if (r.ok) fmt(r.warm) else "-1"))
      .mkString("{", ",", "}")
    val failed = results.filterNot(_.ok).map(r => Json.str(r.name)).mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":${fmt(okRes.map(_.cold).sum)},"unit":"sec","queries":$qsCold,"total_warm":${fmt(okRes.map(_.warm).sum)},"queries_warm":$qsWarm,"n_ok":${okRes.size},"n_failed":${results.size - okRes.size},"failed":$failed,"streaming":$streaming,"sf":${Json.str(sfDir)}}"""
    // Stdout for the driver, plus a file copy in case log decoration mangles
    // the stream (round 1's BENCH parse failed on sbt's [info] prefix).
    println(json)
    Files.writeString(Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")), json + "\n")
    // Committed per-query artifact: the driver's BENCH_rN.json capture
    // truncates the single-line JSON, so regression calls across rounds were
    // limited to the visible prefix. This file is pretty-printed one query
    // per line (diffable in git) and committed each round — warm min-of-two
    // is the steady-state number the 100 TB design targets.
    val perQuery = results.map { r =>
      val v = if (r.ok) s"""{"cold":${fmt(r.cold)},"warm":${fmt(r.warm)}}"""
      else """{"cold":-1,"warm":-1,"ok":false}"""
      s"""    ${Json.str(r.name)}: $v"""
    }.mkString(",\n")
    val warmJson =
      s"""{
         |  "sf": ${Json.str(sfDir)},
         |  "n_ok": ${okRes.size},
         |  "n_failed": ${results.size - okRes.size},
         |  "total_cold_sec": ${fmt(okRes.map(_.cold).sum)},
         |  "total_warm_sec": ${fmt(okRes.map(_.warm).sum)},
         |  "streaming": $streaming,
         |  "queries": {
         |$perQuery
         |  }
         |}""".stripMargin
    Files.writeString(Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_WARM_OUT", "bench_warm.json")), warmJson + "\n")
    spark.stop()
  }
}
