package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, Hashing, Similarity}

/** Semantic properties of the dedup/similarity operators on generated
  * corpora (SURVEY.md §5.2 property-test requirement, extended to the
  * LLM-pipeline operators).
  */
class DedupPropertySpec extends AnyFunSuite with SparkSpec {

  private val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")

  /** n docs: half are near-duplicate pairs (one word changed), half unique. */
  private def corpus(n: Int, seed: Long): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val base = Seq.fill(30)(words(rnd.nextInt(words.size))).mkString(" ")
      (i.toLong, base)
    }
  }

  test("identical documents get identical minhash signatures; signatures are in-range") {
    import spark.implicits._
    val docs = (corpus(20, 1) ++ Seq((100L, corpus(20, 1).head._2))).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs, col("doc_id"), col("text"), 3, 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byDoc = sigs.groupBy(_._1).view.mapValues(_.map(x => x._2 -> x._3).toMap).toMap
    assert(byDoc(0L) == byDoc(100L), "same text -> same signature vector")
    sigs.foreach { case (_, _, mh) =>
      assert(mh >= 0 && mh < Hashing.FamilyP, "family hashes stay under P")
    }
    assert(byDoc(0L).size == 16, "16 signature rows per doc")
  }

  test("LSH candidates are a superset of exact-duplicate pairs and respect id_a < id_b") {
    import spark.implicits._
    val dupText = corpus(1, 7).head._2
    val docs = (corpus(30, 2) ++ Seq((200L, dupText), (201L, dupText))).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs, col("doc_id"), col("text"), 3, 16)
    val candDf = Dedup.lshCandidatePairs(Dedup.lshBands(sigs, 4))
    val cands = candDf.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cands.contains((200L, 201L)), "exact duplicates always collide in every band")
    assert(cands.forall { case (a, b) => a < b })
    // the estimate stage: identical docs agree on every component (est = 1.0),
    // and every estimate is a valid fraction over the full signature length
    val ests = Dedup.minhashJaccardEstimate(sigs, candDf)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(ests((200L, 201L))._3 == 1.0, "identical docs estimate Jaccard 1.0")
    ests.values.foreach { case (agree, n, est) =>
      assert(n == 16L && agree >= 0L && agree <= 16L && est == agree.toDouble / 16)
    }
  }

  test("simhash: identical docs -> Hamming 0; blocked near-dup finds them; hashes < 2^60") {
    import spark.implicits._
    val dupText = corpus(1, 9).head._2
    val docs = (corpus(25, 3) ++ Seq((300L, dupText), (301L, dupText))).toDF("doc_id", "text")
    val hashes = Dedup.simhash(docs, col("doc_id"), col("text"))
    hashes.collect().foreach(r => {
      val h = r.getLong(1)
      assert(h >= 0L && h < (1L << 60))
    })
    val pairs = Dedup.simhashNearDupBlocked(hashes, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2) -> r))
    val dup = pairs.find(p => p._1 == 300L && p._2 == 301L)
    assert(dup.isDefined && dup.get._3._1 == 0, "identical docs at Hamming 0")
  }

  test("per-row simhash60 native == corpus simhash aggregation, doc by doc") {
    import spark.implicits._
    val docs = (corpus(30, 11) ++ Seq((200L, ""), (201L, "solo")))
      .toDF("doc_id", "text")
    val agg = Dedup.simhash(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perRow = docs.select(col("doc_id"), Dedup.simhash60(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perRow == agg, "stateless per-row fingerprint must equal the aggregation form")
  }

  test("blocked simhash near-dup == all-pairs simhash near-dup (pigeonhole completeness)") {
    import spark.implicits._
    val docs = corpus(40, 4).toDF("doc_id", "text")
    val hashes = Dedup.simhash(docs, col("doc_id"), col("text")).cache()
    val allPairs = Dedup.simhashPairs(hashes, 3)
      .select("id_a", "id_b", "hamming").collect().map(_.toSeq).toSet
    // every valid block scheme must keep recall exact: 4 blocks (r=1, the
    // round-2 scheme), 6 blocks (r=3, the 2^30-bucket scale scheme)
    Seq(4, 6).foreach { nb =>
      val blocked = Dedup.simhashNearDupBlocked(hashes, 3, numBlocks = nb)
        .select("id_a", "id_b", "hamming").collect().map(_.toSeq).toSet
      assert(blocked == allPairs,
        s"$nb-block scheme must lose no pair within the Hamming budget")
    }
    hashes.unpersist()
  }

  test("synthetic Hamming<=3 perturbations always collide under the 6-block scheme") {
    import spark.implicits._
    // direct fingerprint fixture: base hashes plus 1-3 flipped bits each —
    // the pure pigeonhole property, independent of simhash text behavior
    val rnd = new scala.util.Random(13)
    val bases = (0 until 25).map(_ => rnd.nextLong() & ((1L << 60) - 1))
    val rows = bases.zipWithIndex.flatMap { case (h, i) =>
      val flips = (1 to (1 + i % 3)).map(_ => rnd.nextInt(60)).distinct
      val pert = flips.foldLeft(h)((acc, b) => acc ^ (1L << b))
      Seq((i.toLong * 2, h), (i.toLong * 2 + 1, pert))
    }
    val hashes = rows.toDF("doc_id", "simhash")
    val found = Dedup.simhashNearDupBlocked(hashes, 3, numBlocks = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    bases.indices.foreach { i =>
      assert(found.contains((i.toLong * 2, i.toLong * 2 + 1)),
        s"perturbed pair $i within Hamming 3 must collide on some intact block triple")
    }
  }

  test("mega-bucket guard: oversized buckets dropped whole, small clusters kept") {
    import spark.implicits._
    // adversarial boilerplate corpus: 30 identical docs (one mega-cluster
    // bucket in EVERY band) + one small duplicate pair + unique filler
    val boiler = corpus(1, 21).head._2
    val smallDup = corpus(1, 22).head._2
    val docs = ((0L until 30L).map(i => (i, boiler)) ++
      Seq((900L, smallDup), (901L, smallDup)) ++
      corpus(10, 23).map { case (i, t) => (i + 950L, t) }).toDF("doc_id", "text")

    val bands = Dedup.lshBands(
      Dedup.minhashSignatures(docs, col("doc_id"), col("text"), 3, 16), 4)
    val capped = Dedup.lshCandidatePairs(bands, maxBucket = Some(10))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.contains((900L, 901L)), "small duplicate pair survives the cap")
    assert(!capped.exists { case (a, b) => a < 30L && b < 30L },
      "mega-cluster pairs are dropped with their bucket")
    val uncapped = Dedup.lshCandidatePairs(bands)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.exists { case (a, b) => a < 30L && b < 30L },
      "without the cap the mega-cluster floods the candidate set")

    // same guard on the blocked simhash path
    val hashes = Dedup.simhash(docs, col("doc_id"), col("text"))
    val simCapped = Dedup.simhashNearDupBlocked(hashes, 3, numBlocks = 6,
        maxBucket = Some(10))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(simCapped.contains((900L, 901L)))
    assert(!simCapped.exists { case (a, b) => a < 30L && b < 30L })
  }

  test("ngram Jaccard: identical docs score 1.0; pairs obey 0 < jaccard <= 1") {
    import spark.implicits._
    val dupText = corpus(1, 11).head._2
    val docs = (corpus(15, 5) ++ Seq((400L, dupText), (401L, dupText))).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"), 3, 0.0, None)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5))).toMap
    assert(math.abs(pairs((400L, 401L)) - 1.0) < 1e-12)
    pairs.values.foreach(j => assert(j > 0.0 && j <= 1.0 + 1e-12))
  }

  test("edit-distance blocking: adversarial same-length corpus — result equals brute force") {
    import spark.implicits._
    // adversarial for length-only blocking: EVERY name has length 8, so the
    // old single-dimension scheme put all of them in one join bucket. The
    // q-gram count filter must cut candidates without losing a single pair,
    // including short strings ("abcd..." truncated pool) routed via the
    // short-short path.
    val rnd = new scala.util.Random(17)
    val alpha = "abcdef"
    val base = (0 until 120).map(_ => (0 until 8).map(_ => alpha(rnd.nextInt(6))).mkString)
    val perturbed = base.take(40).map { s =>
      val i = rnd.nextInt(s.length)
      s.updated(i, alpha(rnd.nextInt(6)))
    }
    val shorts = Seq("ab", "cd", "ac", "bd", "a", "b")
    val all = (base ++ perturbed ++ shorts).distinct
    val df = all.map(Tuple1(_)).toDF("nm")

    val got = Dedup.editDistancePairs(df, col("nm"), maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expected = (for {
      a <- all; b <- all if a < b
      dist = lev(a, b) if dist <= 2
    } yield (a, b, dist.toLong)).toSet
    assert(got == expected, "blocked result must equal the brute-force pair set")
    assert(expected.exists(_._3 == 2) && shorts.combinations(2).nonEmpty,
      "fixture exercises both the gram path and the short-short path")
  }

  test("connected components: labels match union-find on random graphs; idempotent; survivors = one per cluster") {
    import spark.implicits._
    Seq(31L, 32L, 33L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 60
      // random sparse graph incl. a long path (exercises multi-round diameter)
      val randomEdges = (0 until 40).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      val pathEdges = (100L until 110L).map(i => (i, i + 1))
      val edges = (randomEdges ++ pathEdges).distinct
      val pairs = edges.toDF("id_a", "id_b")

      val got = Dedup.connectedComponents(pairs, "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      // reference: test-side union-find
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      val expected = nodes.map(v => v -> {
        // min element of v's component
        val root = find(v)
        nodes.filter(u => find(u) == root).min
      }).toMap
      assert(got == expected, s"seed $seed: CC labels must equal union-find min labels")

      // transitivity/idempotence: re-clustering the (id, cluster_id) pairs
      // themselves is a fixed point — every node keeps its label
      val again = Dedup.connectedComponents(
        got.toSeq.filter { case (id, c) => id != c }.toDF("id_a", "id_b"), "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      again.foreach { case (id, c) => assert(c == got(id), "idempotent labels") }

      // survivors: exactly one per cluster (the min), singletons untouched
      val universe = (0L until n.toLong).map(i => (i, s"row$i")).toDF("id", "payload")
      val labels = got.toSeq.toDF("id", "cluster_id")
      val kept = Dedup.keepClusterRepresentative(universe, col("id"), labels)
        .collect().map(_.getLong(0)).toSet
      val clustered = got.keySet.filter(_ < n)
      val reps = got.filter { case (id, c) => id < n && id == c }.keySet
      assert(kept == ((0L until n.toLong).toSet -- clustered) ++ reps,
        s"seed $seed: survivors are non-clustered rows plus one min-id rep per cluster")
    }
  }

  test("incremental connected components == full recompute on the union of pair batches") {
    import spark.implicits._
    Seq(41L, 42L, 43L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 60
      val allEdges = ((0 until 50).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) } ++
        // a chain split across the two batches: the delta must bridge and
        // re-label history's components, not merely extend them
        (200L until 210L).map(i => (i, i + 1))).distinct
      val (batch1, batch2) = rnd.shuffle(allEdges).splitAt(allEdges.size / 2)

      val full = Dedup.connectedComponents(allEdges.toDF("id_a", "id_b"), "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val labels1 = Dedup.connectedComponents(batch1.toDF("id_a", "id_b"), "id_a", "id_b")
      val incr = Dedup.connectedComponentsIncremental(
          labels1, batch2.toDF("id_a", "id_b"), "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(incr == full,
        s"seed $seed: incremental merge must equal full recompute on the union")
    }
  }

  test("connected components: pointer jumping converges a 200-node chain in O(log n) rounds") {
    import spark.implicits._
    // a path graph is the worst case for plain hash-min (O(n) rounds);
    // maxIter=15 would fail without the jump (plain needs ~200 rounds),
    // so passing proves the adaptive jump engages and stays correct
    val pairs = (0L until 199L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs, "id_a", "id_b", maxIter = 15)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 200 && labels.values.forall(_ == 0L),
      "every chain node labels to the component min (node 0)")
  }

  test("brute-force and LSH top-k agree on rank-1 for exact duplicate vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(6)
    val vecs = (0L until 30L).map(i => (i, Array.fill(16)(rnd.nextFloat()))) :+
      (500L, Array.fill(16)(0.5f)) :+ (501L, Array.fill(16)(0.5f))
    val df = vecs.toDF("vec_id", "embedding")
    val bf = Similarity.bruteForceTopK(df, col("vec_id"), col("embedding"), 1)
      .where(col("query_id") === 500L).select("neighbor_id").head().getLong(0)
    assert(bf == 501L, "identical vector is the nearest neighbor")
    // identical vectors land in the same bucket in every table
    val lsh = Similarity.lshTopK(df, col("vec_id"), col("embedding"), 1,
        numPlanes = 4, numDims = 16, numTables = 2)
      .where(col("query_id") === 500L).select("neighbor_id").head().getLong(0)
    assert(lsh == 501L)
  }

  test("containmentPairs: a doc pasted inside a larger one scores 1.0 where Jaccard misses") {
    import spark.implicits._
    val small = "one two three four five"
    val big = s"$small plus lots of extra tokens a1 b2 c3 d4 e5 f6 g7 h8 i9 j0 k1 l2"
    val docs = Seq((1L, small), (2L, big), (3L, "totally unrelated text here"))
      .toDF("id", "text")
    val cont = Dedup.containmentPairs(docs, col("id"), col("text"), 3, 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5))).toMap
    assert(cont.keySet == Set((1L, 2L)))
    assert(cont((1L, 2L)) == 1.0, "every shingle of the small doc is in the big one")
    val jac = Dedup.ngramJaccardPairs(docs, col("id"), col("text"), 3, 0.9)
    assert(jac.count() == 0, "symmetric Jaccard under-scores the subset pair")
  }

  test("duplicatedSpans: cross-doc repeats merge to one maximal span; unique docs emit none") {
    import spark.implicits._
    // docs 1 and 2 share a verbatim 7-token run ("one two three four five
    // six seven") at different offsets; doc 3 repeats a 5-gram within
    // itself; doc 4 is entirely unique.
    val shared = "one two three four five six seven"
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta epsilon"),
      (2L, s"$shared zeta"),
      (3L, "p q r s t u0 p q r s t u1"),
      (4L, "just some fully unique words here nine ten eleven twelve")
    ).toDF("id", "text")
    val out = Dedup.duplicatedSpans(docs, col("id"), col("text"), n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(r => (r._1, r._2))
    // doc 1: window positions 3..5 duplicated -> one span tokens 3..9
    // doc 2: positions 1..3 -> one span tokens 1..7
    // doc 3: "p q r s t" at positions 1 and 7 -> two non-adjacent spans
    assert(out.toSeq == Seq(
      (1L, 3L, 7L, shared),
      (2L, 1L, 7L, shared),
      (3L, 1L, 5L, "p q r s t"),
      (3L, 7L, 5L, "p q r s t")))
  }

  test("cutDuplicatedSpans: first occurrence survives, later ones cut; within-doc repeats cut too") {
    import spark.implicits._
    val shared = "one two three four five six seven"
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta epsilon"),
      (2L, s"$shared zeta"),
      (3L, "p q r s t u0 p q r s t u1"),
      (4L, "just some fully unique words here nine ten eleven twelve")
    ).toDF("id", "text")
    val out = Dedup.cutDuplicatedSpans(docs, col("id"), col("text"), n = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((12L, 0L, s"alpha beta $shared gamma delta epsilon")),
      "doc 1 holds the first occurrence — nothing cut")
    assert(out(2L) == ((8L, 7L, "zeta")), "doc 2's copy of the shared run is cut")
    assert(out(3L) == ((12L, 5L, "p q r s t u0 u1")),
      "the doc's own second occurrence is cut, the first kept")
    assert(out(4L) == ((10L, 0L, "just some fully unique words here nine ten eleven twelve")))
  }

  test("cutEvalSpans: the cleaned corpus contains NO eval n-gram; clean docs are untouched") {
    import spark.implicits._
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val evalSet = docs.where(pmod(col("doc_id"), lit(50)) === 0)
      .select(col("doc_id"), col("text"))
    // plant contamination: eval prefixes appended to some corpus docs
    val pref = concat_ws(" ", slice(graft.ops.Text.tokens(col("etext")), 1, 12))
    val corpus = docs.where(pmod(col("doc_id"), lit(50)) =!= 0)
      .join(evalSet.select(col("doc_id").as("eid"), col("text").as("etext")),
        col("eid") === col("doc_id") - pmod(col("doc_id"), lit(50)), "left_outer")
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(10)) === 1 && col("etext").isNotNull,
          concat(col("text"), lit(" "), pref)).otherwise(col("text")).as("text"))
    val n = 5
    val cut = Dedup.cutEvalSpans(corpus, col("doc_id"), col("text"),
      evalSet, col("doc_id"), col("text"), n)
    // THE guarantee: no 5-gram of any cleaned doc appears in the eval set
    val evalGrams = evalSet
      .select(explode(graft.ops.Text.shingles(col("text"), n)).as("sh"))
      .distinct().as[String].collect().toSet
    val leaked = cut.select(col("doc_id"),
        explode(graft.ops.Text.shingles(col("cleaned_text"), n)).as("sh"))
      .as[(Long, String)].collect().filter { case (_, sh) => evalGrams(sh) }
    assert(leaked.isEmpty, s"eval n-grams survive the cut: ${leaked.take(3).toSeq}")
    // contaminated docs lost tokens; most clean docs lost none
    val removed = cut.select(col("doc_id").as[Long], col("n_removed").as[Long])
      .collect().toMap
    val planted = corpus.where(pmod(col("doc_id"), lit(10)) === 1)
      .select(col("doc_id").as[Long]).collect()
    assert(planted.nonEmpty && planted.forall(d => removed(d) >= 12L),
      "every planted doc loses at least its appended eval prefix")
    assert(removed.count(_._2 == 0L) > removed.size / 2,
      "the bulk of the corpus is untouched")
  }

  test("winnowing: guarantee properties — coverage gap <= w, >= 1 fp per doc, shared-run collision") {
    import spark.implicits._
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val k = 3; val w = 4
    val fp = Dedup.winnowFingerprints(docs, col("doc_id"), col("text"), k, w)
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    val nsh = Dedup.positionedShingleHashes(docs, col("doc_id"), col("text"), k)
      .groupBy("doc_id").agg(max("pos").as("m"))
      .as[(Long, Long)].collect().toMap
    assert(nsh.keySet == fp.keySet, "every doc with >= 1 shingle yields >= 1 fingerprint")
    fp.foreach { case (d, rows) =>
      val ps = rows.map(_._2).sorted
      assert(ps.head <= w, s"doc $d: first selection within the first window")
      ps.sliding(2).foreach { case Array(a, b) =>
        assert(b - a <= w, s"doc $d: gap $a->$b exceeds the winnowing bound w=$w")
      case _ => }
      val m = nsh(d)
      assert(ps.last > m - w || ps.last == m,
        s"doc $d: tail of the sequence must be covered")
      // density: expected 2/(w+1); allow a generous band around it
      assert(rows.length <= m, s"doc $d: cannot select more than every shingle")
    }
    // shared-run collision: two synthetic docs sharing a long verbatim run
    // must share at least one selected fingerprint (the winnowing guarantee
    // for runs of >= w+k-1 tokens)
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val syn = Seq(
      (1L, s"unrelated prefix words here $shared and a suffix"),
      (2L, s"$shared totally different tail content follows now")).toDF("doc_id", "text")
    val sfp = Dedup.winnowFingerprints(syn, col("doc_id"), col("text"), k, w)
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    val h1 = sfp(1L).map(_._3).toSet
    val h2 = sfp(2L).map(_._3).toSet
    assert((h1 & h2).nonEmpty, "a shared >= w+k-1 token run must collide")
  }

  test("winnowing: rightmost tie-break and short-doc whole-window selection") {
    import spark.implicits._
    // "a b a b a b a b" with k=2: every shingle is "a b" or "b a" — massive
    // hash ties; the rightmost-min tie-break must pick deterministically and
    // the gap bound still holds. A doc with fewer shingles than w selects
    // from the single whole-doc window.
    val docs = Seq((1L, "a b a b a b a b"), (2L, "x y z")).toDF("doc_id", "text")
    val fp = Dedup.winnowFingerprints(docs, col("doc_id"), col("text"), k = 2, w = 4)
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    val ties = fp(1L).map(_._2).sorted
    // 7 shingles alternating between two hash values: the min value's
    // rightmost occurrence per window -> selections advance, gaps <= 4
    ties.sliding(2).foreach { case Array(a, b) => assert(b - a <= 4); case _ => }
    // doc 2: 2 shingles < w -> the whole-doc window selects exactly one
    assert(fp(2L).length == 1, s"short doc must select exactly its minimum: ${fp(2L).toSeq}")
    // determinism: selected positions are reproducible run to run
    val again = Dedup.winnowFingerprints(docs, col("doc_id"), col("text"), k = 2, w = 4)
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    assert(again(1L).toSet == fp(1L).toSet && again(2L).toSet == fp(2L).toSet)
  }

  test("scalacheck: family hashes are pairwise-distinct functions on a random domain sample") {
    val xs = Gen.listOfN(200, Gen.choose(0L, Hashing.FamilyBase - 1)).sample.get.distinct
    // any two family members must disagree somewhere (a_i, b_i distinct mod P)
    val images = (0 until 16).map(i =>
      xs.map(x => (Hashing.familyA(i) * x + Hashing.familyB(i)) % Hashing.FamilyP))
    for (i <- 0 until 16; j <- (i + 1) until 16)
      assert(images(i) != images(j), s"family members $i and $j coincide on the sample")
  }

  test("paragraphDedup: first occurrence survives corpus-wide, order preserved, all-cut docs stay as empty rows") {
    import spark.implicits._
    val docs = Seq(
      (1L, "unique alpha line\nshared boilerplate footer\nunique beta line"),
      (2L, "shared boilerplate footer\nanother unique paragraph"),
      (3L, "shared boilerplate footer"), // every paragraph a later duplicate
      (4L, "completely distinct page")
    ).toDF("id", "text").repartition(3)
    val out = Dedup.paragraphDedup(docs, col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((3L, 3L, "unique alpha line\nshared boilerplate footer\nunique beta line")),
      "doc 1 owns the first occurrence — nothing cut, order intact")
    assert(out(2L) == ((2L, 1L, "another unique paragraph")),
      "doc 2 loses the footer (doc 1 was first), keeps its own paragraph")
    assert(out(3L) == ((1L, 0L, "")),
      "a fully-duplicated doc survives as an explicit empty row")
    assert(out(4L) == ((1L, 1L, "completely distinct page")))
    // conservation: kept paragraph occurrences == distinct paragraphs corpus-wide
    assert(out.values.map(_._2).sum ==
      docs.select(explode(split(col("text"), "\n"))).distinct().count(),
      "exactly one surviving occurrence per distinct paragraph")
  }

  test("keepBestInCluster: max-quality member survives, ties break to min id, singletons untouched") {
    import spark.implicits._
    val docs = Seq(
      (1L, 0.2), (2L, 0.9), (3L, 0.9), // cluster A: 2 and 3 tie on quality -> 2 wins
      (10L, 0.5),                      // singleton (never in labels)
      (20L, 0.1), (21L, 0.8)           // cluster B: 21 wins
    ).toDF("id", "q")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (20L, 20L), (21L, 20L))
      .toDF("id", "cluster_id")
    val kept = Dedup.keepBestInCluster(docs, col("id"), col("q"), labels)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 10L, 21L),
      s"expected max-quality survivors + singleton, got $kept")
  }

  test("prefix filtering loses nothing: jaccardPairsPrefix == full inverted-index join; index is smaller") {
    import org.apache.spark.sql.functions.{concat, lit, pmod}
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val copies = docs.where(pmod(col("doc_id"), lit(25)) === 0)
      .select((col("doc_id") + lit(10000000L)).as("doc_id"),
        concat(col("text"), lit(" zq1 zq2")).as("text"))
    val corpus = docs.select(col("doc_id"), col("text")).unionByName(copies)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.select(col("id_a").cast("long"), col("id_b").cast("long"), col("inter"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val t = 0.6
    val full = rows(Dedup.ngramJaccardPairs(corpus, col("doc_id"), col("text"), 3, t))
    val prefix = rows(Dedup.jaccardPairsPrefix(corpus, col("doc_id"), col("text"), 3, t))
    assert(prefix == full, "prefix candidates must recover every qualifying pair")
    assert(full.nonEmpty, "the planted near-copies must produce pairs")
    // the candidate index really is the advertised fraction: strictly fewer
    // indexed rows than the full (doc, shingle) inverted index
    val sh = Dedup.shingleRows(corpus, col("doc_id"), col("text"), 3)
    val fullRows = sh.count()
    val prefixRows = sh
      .join(sh.groupBy(col("sh")).agg(
        org.apache.spark.sql.functions.count(lit(1)).as("dfc")), "sh")
      .withColumn("pos", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("dfc").asc, col("sh").asc)))
      .join(sh.groupBy(col("doc_id")).agg(
        org.apache.spark.sql.functions.count(lit(1)).as("sz")), "doc_id")
      .where(col("pos") <= col("sz")
        - org.apache.spark.sql.functions.ceil(lit(t) * col("sz")) + lit(1))
      .count()
    assert(prefixRows * 2 < fullRows,
      s"prefix index must be well under half the full index ($prefixRows vs $fullRows)")
  }
}
