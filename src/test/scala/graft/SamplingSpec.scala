package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, Sampling}

/** Semantic properties of the curation-stage operators: source mixing,
  * sequence packing, and benchmark decontamination.
  */
class SamplingSpec extends AnyFunSuite with SparkSpec {

  test("clusterSplit: no near-dup pair straddles splits; singletons match withSplit exactly") {
    import spark.implicits._
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"), 3, 0.4,
      maxShingleDf = Some(100))
    val labels = Dedup.connectedComponents(pairs, "id_a", "id_b")
    val split = Sampling.clusterSplit(docs, col("doc_id"), labels, 80, 10)
      .select(col("doc_id").as[Long], col("split").as[String]).collect().toMap
    // the leakage guarantee: every pair's two sides share a split
    val straddling = pairs.select(col("id_a").as[Long], col("id_b").as[Long]).collect()
      .filter { case (a, b) => split(a) != split(b) }
    assert(straddling.isEmpty, s"near-dup pairs straddle splits: ${straddling.take(5).toSeq}")
    // singletons (docs in no pair) get exactly the per-doc assignment
    val clustered = labels.select(col("id").as[Long]).collect().toSet
    val perDoc = Sampling.withSplit(docs, col("doc_id"), 80, 10)
      .select(col("doc_id").as[Long], col("split").as[String]).collect().toMap
    val singles = split.keySet -- clustered
    assert(singles.nonEmpty && singles.forall(d => split(d) == perDoc(d)),
      "singleton assignment must equal the plain hash split")
    // and at least one multi-member cluster exists so the test is not vacuous
    assert(pairs.count() > 0)
  }

  test("mixBySource: nested samples — a source's kept-set is monotone in its rate; rates land near target") {
    import spark.implicits._
    val docs = (0L until 2000L).map(i => (i, s"src${i % 4}")).toDF("id", "source")
    def kept(rate: Double): Set[Long] =
      Sampling.mixBySource(docs, col("id"), col("source"), Map("src1" -> rate), defaultRate = 0.0)
        .select("id").as[Long].collect().toSet
    val k25 = kept(0.25); val k50 = kept(0.5); val k100 = kept(1.0)
    assert(k25.subsetOf(k50) && k50.subsetOf(k100), "kept-sets nest as the rate grows")
    assert(k100.size == 500, "rate 1.0 keeps every src1 row and nothing else")
    assert(math.abs(k50.size - 250) < 60, s"rate 0.5 keeps ~half (got ${k50.size}/500)")
    assert(k25.nonEmpty && k25.size < k50.size)
  }

  test("packSequences: token conservation, full interior chunks, contiguous spans, partition-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val docs = (0L until 300L).map(i => (i, 1 + rnd.nextInt(700))).toDF("id", "n")
    val budget = 512L
    def run(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long)] =
      Sampling.packSequences(df, col("id"), col("n"), budget)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq.sorted

    val out = run(docs)
    // conservation: each doc's chunk spans sum to its token count
    val perDoc = out.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val expected = docs.collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(perDoc == expected, "per-doc chunk tokens must sum to the doc's token count")
    // every chunk except the last holds exactly `budget` tokens
    val perChunk = out.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    val lastChunk = perChunk.keys.max
    perChunk.foreach { case (c, tot) =>
      if (c == lastChunk) assert(tot <= budget && tot > 0)
      else assert(tot == budget, s"interior chunk $c holds $tot != $budget")
    }
    // chunk ids are contiguous from 0
    assert(perChunk.keySet == (0L to lastChunk).toSet)
    // partitioning must not change the result (the two-phase cumsum's
    // offsets recompose identically under any input layout)
    assert(run(docs.repartition(7, col("n"))) == out, "result is partition-invariant")
  }

  test("contaminationPairs: planted benchmark overlap found, clean docs stay unflagged") {
    import spark.implicits._
    val benchmark = "the quick brown fox jumps over the lazy dog again and again today"
    val contaminated = s"prefix words here $benchmark suffix words there"
    val clean = "completely different content about spark catalyst optimizer internals"
    val corpus = Seq((1L, contaminated), (2L, clean)).toDF("doc_id", "text")
    val evalSet = Seq((100L, benchmark)).toDF("doc_id", "text")
    val got = Dedup.contaminationPairs(corpus, evalSet, col("doc_id"), col("text"), 3, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(p => (p._1, p._2)).toSet == Set((1L, 100L)),
      "exactly the contaminated doc flags against the benchmark doc")
    assert(got.head._3 >= 5L, "shared-shingle count meets the threshold")
  }

  test("temperatureMixWeights: sqrt flattening upsamples small sources; budget conserved until capped") {
    import spark.implicits._
    // source big: 3 docs x 400 tokens; source small: 1 doc x 100 tokens
    val docs = Seq.tabulate(3)(i => (s"b$i", "big", 400)) :+ (("s0", "small", 100))
    val df = docs.toDF("id", "source", "n_tok")
    val out = Sampling.temperatureMixWeights(df, col("source"), col("n_tok"), budget = 600L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val (_, nBig, wBig, aBig) = out("big")
    val (_, nSmall, wSmall, aSmall) = out("small")
    assert(nBig == 1200L && nSmall == 100L)
    assert(math.abs(wBig + wSmall - 1.0) < 1e-12, "weights normalize")
    // raw share of small = 100/1300 ≈ 0.077; sqrt share = 10/(10+sqrt(1200)) ≈ 0.224
    assert(wSmall > 100.0 / 1300.0, "sqrt temperature upsamples the small source")
    assert(aBig <= 1.0 && aSmall <= 1.0)
    val expected = aBig * nBig + aSmall * nSmall
    assert(expected <= 600.0 + 1e-9, "expected kept tokens never exceed the budget")
    assert(aSmall > aBig, "small source keeps a larger fraction")
  }

  test("chunkWithOverlap: stride windows cover every token; tail shortens; short docs emit one chunk") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "a b c"),                                  // <= chunkSize -> 1 chunk
      (3L, (1 to 12).map(i => s"v$i").mkString(" "))  // exact stride fit at the end
    ).toDF("id", "text")
    val out = Sampling.chunkWithOverlap(docs, col("id"), col("text"),
        chunkSize = 4, stride = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .sortBy(r => (r._1, r._2))
    val doc1 = out.filter(_._1 == 1L)
    assert(doc1.toSeq == Seq(
      (1L, 0L, 1L, 4L, "w1 w2 w3 w4"),
      (1L, 1L, 4L, 4L, "w4 w5 w6 w7"),
      (1L, 2L, 7L, 4L, "w7 w8 w9 w10")), "starts every 3, stops once the end is covered")
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 1L, 3L, "a b c")))
    val doc3 = out.filter(_._1 == 3L)
    assert(doc3.length == 4 && doc3.last == ((3L, 3L, 10L, 3L, "v10 v11 v12")),
      "tail chunk shortens to the remaining tokens")
  }

  test("packSequencesBy: curriculum order respected, conservation and full chunks hold") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // difficulty key deliberately anti-correlated with id order
    val docs = (1L to 200L).map(i => (i, (i * 7) % 50 + 1, (200 - i).toDouble))
      .toDF("doc_id", "n_tok", "difficulty").repartition(13)
    val packed = graft.ops.Sampling.packSequencesBy(
      docs, col("doc_id"), col("n_tok"), col("difficulty"), budget = 100L)
    val rows = packed.select("doc_id", "key", "chunk_id", "n_tok", "tokens_in_chunk")
      .as[(Long, Double, Long, Long, Long)].collect()
    // conservation: every doc's chunk segments sum to its token count
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.forall { case (_, rs) => rs.map(_._5).sum == rs.head._4 })
    // full interior chunks
    val byChunk = rows.groupBy(_._3).view.mapValues(_.map(_._5).sum).toMap
    val last = byChunk.keys.max
    assert(byChunk.filter(_._1 != last).values.forall(_ == 100L),
      "every chunk but the last is exactly the budget")
    // curriculum: a doc strictly earlier in (key, id) order never starts in
    // a LATER chunk than a doc after it
    val ordered = rows.groupBy(r => (r._2, r._1)).view
      .mapValues(_.map(_._3).min).toSeq.sortBy(_._1)
    assert(ordered.sliding(2).forall {
      case Seq((_, c1), (_, c2)) => c1 <= c2
      case _ => true
    }, "chunk ids must be monotone in the (difficulty, id) order")
  }

  test("shardAssign/shardManifest: every doc in exactly one shard; LPT imbalance bound; stored shards re-manifest identically") {
    import graft.ops.Text
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val assigned = Sampling.shardAssign(docs, col("doc_id"),
      Text.wordCount(col("text")), nShards = 16).localCheckpoint()
    // partition of the corpus: every doc exactly once, shards in range
    assert(assigned.count() == docs.count())
    assert(assigned.select(col("doc_id")).distinct().count() == docs.count())
    assert(assigned.where(col("shard") < 0 || col("shard") >= 16).count() == 0)
    val manifest = Sampling.shardManifest(assigned).localCheckpoint()
    assert(manifest.count() == 16)
    // the LPT round-robin balance guarantee: spread <= one doc's tokens
    val row = manifest.agg(
      max(col("n_tokens")).as("mx"), min(col("n_tokens")).as("mn")).head()
    val maxDoc = assigned.agg(max(col("n_tok").cast("long"))).head().getLong(0)
    assert(row.getLong(0) - row.getLong(1) <= maxDoc,
      s"shard spread ${row.getLong(0) - row.getLong(1)} exceeds max doc $maxDoc")
    // export round-trip: write partitioned by shard, re-manifest the stored
    // shards, diff against the pre-write manifest (the checksum's job)
    val dir = tmpDir("shards")
    assigned.write.mode("overwrite").partitionBy("shard").parquet(s"$dir/out")
    // partition-column type round-trips as int; re-widen before the diff
    val stored = spark.read.parquet(s"$dir/out")
      .withColumn("shard", col("shard").cast("long"))
    val manifest2 = Sampling.shardManifest(stored)
    assert(manifest2.exceptAll(manifest).isEmpty &&
      manifest.exceptAll(manifest2).isEmpty)
  }

  test("selectByBudget: exact greedy prefix, budget respected, selection monotone in budget") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // deterministic synthetic corpus: scores with ties, varied sizes
    val rows = (1L to 300L).map(i => (i, (i * 7 % 13).toDouble / 13.0, 5 + (i * 11 % 50)))
    val df = rows.toDF("id", "score", "n_tok").repartition(7)

    def run(budget: Long): Seq[(Long, Long)] =
      Sampling.selectByBudget(df, col("id"), col("score"), col("n_tok"), budget)
        .select("doc_id", "cum_tok").as[(Long, Long)].collect().sortBy(_._2).toSeq

    val sel = run(2000L)
    // budget respected, cum_tok is the true running sum in (score desc, id) order
    assert(sel.nonEmpty && sel.last._2 <= 2000L)
    val order = rows.sortBy { case (i, s, _) => (-s, i) }
    val prefix = order.scanLeft(0L) { case (acc, (_, _, w)) => acc + w }.tail
      .zip(order).takeWhile(_._1 <= 2000L)
    assert(sel.map(_._1) == prefix.map(_._2._1).toSeq,
      "selection must be exactly the greedy prefix of the (score desc, id) order")
    // monotone: a bigger budget only ADDS documents
    val small = run(1200L).map(_._1).toSet
    val big = run(2400L).map(_._1).toSet
    assert(small.subsetOf(big), "selection must be monotone in budget")
  }

  test("weightedSampleTopK: partition-invariant; heavy weights dominate a planted two-weight corpus; own-weight inclusion is monotone") {
    import spark.implicits._
    // planted corpus: one group, ids 0..399; ids < 200 carry weight 100,
    // the rest weight 1 — a 100:1 A-Res preference for the heavy half
    val rows = (0L until 400L).map(i =>
      (i, "g", if (i < 200) 100.0 else 1.0))
    val df = rows.toDF("id", "grp", "w")
    def sample(d: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      Sampling.weightedSampleTopK(d, col("grp"), col("id"), col("w"), k = 50)
        .select(col("id").as[Long], col("rank").as[Long]).collect().toSeq.sorted
    val base = sample(df)
    // exactly k survivors, dense ranks 1..k
    assert(base.size == 50 && base.map(_._2).sorted == (1L to 50L))
    // partition invariance: identical sample on any physical layout
    assert(sample(df.repartition(7)) == base &&
      sample(df.repartition(1)) == base,
      "A-Res keys are pure row expressions — layout must not matter")
    // weight proportionality: the 100:1 heavy half dominates the sample
    val heavy = base.count(_._1 < 200L)
    assert(heavy >= 45, s"expected the weight-100 half to dominate, got $heavy/50")
    // own-weight monotonicity: boosting ONE excluded light row's weight
    // (all else fixed) pulls it in — ln(u)/w rises toward 0 with w
    val out = (200L until 400L).filterNot(i => base.exists(_._1 == i)).head
    val boosted = rows.map { case (i, g, w) =>
      (i, g, if (i == out) 1e6 else w) }.toDF("id", "grp", "w")
    assert(sample(boosted).exists(_._1 == out),
      s"row $out with weight 1e6 must enter the top-50")
    // per-group k: a group smaller than k returns all members
    val tiny = Seq((1L, "t", 3.0), (2L, "t", 1.0)).toDF("id", "grp", "w")
    assert(sample(tiny).map(_._1) == Seq(1L, 2L))
  }
}
