package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines:
  * exact (hash-groupBy), MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Design for 100 TB: every path is a pure shuffle-on-key dataflow — no
  * driver-side state, no collects. The LSH paths exist precisely so the
  * quadratic all-pairs comparison never materializes at scale: candidate
  * generation is an equi-join on (band, signature) / bucket keys, which
  * Catalyst executes as a shuffled hash join over keys whose cardinality
  * grows with corpus size (no skew pileup: band signatures are ~uniform).
  */
object Dedup {

  /** Deterministic exact dedup: keep the row with the minimum id per key.
    * (`dropDuplicates` keeps an *arbitrary* row, which is fine operationally
    * but untestable; min-id is the canonical-representative policy.)
    *
    * The analytic window partitions on md5(key), not the raw key: the full
    * rows (document body included — it is needed downstream) still ride the
    * window exchange, but the partition/sort KEY shrinks from the document to
    * 32 bytes, which is what the shuffle hashes, compares and sorts on. (md5
    * collisions would merge two distinct keys; probability ~2^-64 per pair —
    * accepted, same stance as exactGroups.)
    */
  def exactByKey(df: DataFrame, key: Column, id: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(md5(key.cast("string")))
    df.withColumn("__min_id", min(id).over(w))
      .where(id === col("__min_id"))
      .drop("__min_id")
  }

  /** Per-key group stats for exact dedup audit: md5 key, representative id,
    * duplicate count.
    */
  def exactGroups(df: DataFrame, text: Column, id: Column): DataFrame =
    df.groupBy(md5(text.cast("string")).as("text_hash"))
      .agg(min(id).as("rep_id"), count(lit(1)).as("n_dups"))

  /** Spread rows across the session's shuffle parallelism, hash-keyed.
    *
    * Why: the shingle/token explode multiplies per-row work ~50-100×, but
    * Spark sizes scan partitions by INPUT bytes — a compact source (one small
    * parquet file, or a few large ones at 100 TB) leaves the expensive
    * explode+hash running on far too few cores. Repartitioning the compact
    * pre-explode rows is a cheap shuffle (one row per doc), and because it is
    * keyed on the id, the post-explode groupBy(doc_id) reuses the
    * partitioning — the exploded rows (orders of magnitude larger) never
    * cross an exchange. A fixed partition count pins the exchange against
    * AQE coalescing (which sees "small input" and would undo the spread).
    */
  private[ops] def spreadBy(df: DataFrame, key: Column): DataFrame = {
    val n = df.sparkSession.conf.getOption("spark.sql.shuffle.partitions")
      .flatMap(s => scala.util.Try(s.toInt).toOption)
      .getOrElse(df.sparkSession.sparkContext.defaultParallelism)
    df.repartition(n, key)
  }

  /** (id, shingle) exploded distinct word n-gram shingles. */
  def shingleRows(df: DataFrame, id: Column, text: Column, n: Int): DataFrame =
    spreadBy(df, id).select(id.as("doc_id"), explode(Text.shingles(text, n)).as("sh"))

  /** All-pairs n-gram Jaccard via shingle-inverted-index join.
    * Output: (id_a, id_b, inter, sz_a, sz_b, jaccard) for pairs sharing at
    * least one shingle with jaccard >= threshold; id_a < id_b.
    *
    * Scale note: the inverted-index join's fan-out is bounded by shingle
    * document frequency; at 100 TB you'd first drop ultra-common shingles
    * (df > cap) — exposed via `maxShingleDf`.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      id: Column,
      text: Column,
      n: Int,
      threshold: Double,
      maxShingleDf: Option[Int] = None): DataFrame =
    shinglePairCounts(df, id, text, n, maxShingleDf)
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("inter"), col("sz_a"), col("sz_b"), col("jaccard"))

  /** EXACT Jaccard-threshold pairs via PREFIX FILTERING — the PPJoin-family
    * candidate space (cf. Chaudhuri et al., ICDE 2006; Xiao et al., WWW
    * 2008) as a pure dataflow: same output as [[ngramJaccardPairs]] with no
    * df cap, from a candidate index that is only the (1−t) fraction of each
    * document's shingles.
    *
    * Order every document's distinct shingles by GLOBAL rarity (df asc,
    * shingle asc — a total order), and index only the first
    * |x| − ceil(t·|x|) + 1 of them. Completeness: J(A,B) ≥ t means the
    * overlap O ≥ t·|A∪B| ≥ t·|X| for BOTH sets, while the unindexed suffix
    * of X holds only ceil(t·|X|) − 1 elements — so a qualifying pair MUST
    * collide on some indexed prefix shingle; the exact intersection verify
    * then computes true Jaccard on candidates only. Rare-first ordering
    * puts the high-df boilerplate shingles in the (unindexed) suffixes,
    * which is what shrinks candidate fan-out — the principled version of
    * the `maxShingleDf` cap, with NO recall loss.
    *
    * Scale shape: the df rank and the verify both reuse the checkpointed
    * distinct (doc, shingle) frame; the prefix index rows are strictly
    * fewer than the full inverted index ((1−t)·|x|+1 per doc); candidate
    * buckets are keyed by the RARE shingles, so their occupancy is bounded
    * by rare-shingle df. `maxBucket` remains as the whole-bucket guard for
    * adversarial corpora.
    */
  def jaccardPairsPrefix(
      df: DataFrame,
      id: Column,
      text: Column,
      n: Int,
      threshold: Double,
      maxBucket: Option[Int] = None): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold in (0, 1]")
    val sh = shingleRows(df, id, text, n).localCheckpoint()
    val dfreq = sh.groupBy(col("sh")).agg(count(lit(1)).as("dfc"))
    val szs = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val wdoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("dfc").asc, col("sh").asc)
    val pre = sh.join(dfreq, "sh")
      .withColumn("pos", row_number().over(wdoc))
      .join(szs, "doc_id")
      // ceil of t·sz is exact for the halves/quarters thresholds in use;
      // any double rounding here only wobbles the CANDIDATE space, never
      // the verified output
      .where(col("pos") <= col("sz") - ceil(lit(threshold) * col("sz")) + lit(1))
      .select(col("doc_id"), col("sh"))
    val grouped = pre.groupBy(col("sh"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .where(size(col("ids")) > 1)
    val capped = maxBucket match {
      case Some(cap) => grouped.where(size(col("ids")) <= cap)
      case None => grouped
    }
    // LENGTH filter before the (more expensive) intersection verify:
    // J ≥ t forces t·|A| ≤ |B| ≤ |A|/t, so size-mismatched candidates are
    // dropped on two broadcast-sized joins — another PPJoin pruning rule
    // with zero recall impact (the verified output is unchanged)
    val cand = capped
      .select(posexplode(col("ids")).as(Seq("i", "id_a")), col("ids"))
      .select(col("id_a"),
        explode(slice(col("ids"), col("i") + lit(2), size(col("ids")))).as("id_b"))
      .distinct()
      .join(szs.select(col("doc_id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(szs.select(col("doc_id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .where(col("sz_b").cast("double") >= lit(threshold) * col("sz_a") &&
        col("sz_a").cast("double") >= lit(threshold) * col("sz_b"))
    val a = sh.select(col("doc_id").as("id_a"), col("sh"))
    val b = sh.select(col("doc_id").as("id_b"), col("sh"))
    cand.join(a, "id_a").join(b, Seq("id_b", "sh"))
      .groupBy(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("inter"), col("sz_a"),
        col("sz_b"), col("jaccard"))
  }

  /** Containment near-dup pairs — the ASYMMETRIC companion to
    * [[ngramJaccardPairs]]: containment = |A∩B| / min(|A|, |B|). A document
    * pasted verbatim inside a much larger one scores containment ≈ 1 while
    * its symmetric Jaccard ≈ |small|/|large| sails under any Jaccard
    * threshold — the standard miss for web data with quoted/aggregated
    * pages (cf. Broder 1997's resemblance vs containment distinction).
    * Same inverted-index join and df-cap scale shape as the Jaccard path.
    */
  def containmentPairs(
      df: DataFrame,
      id: Column,
      text: Column,
      n: Int,
      threshold: Double,
      maxShingleDf: Option[Int] = None): DataFrame =
    shinglePairCounts(df, id, text, n, maxShingleDf)
      .withColumn("containment",
        col("inter").cast("double") / least(col("sz_a"), col("sz_b")))
      .where(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("inter"), col("sz_a"), col("sz_b"),
        col("containment"))

  /** N-gram NOVELTY profile: for each document, the fraction of its
    * distinct n-gram shingles whose corpus-wide FIRST occurrence (minimum
    * doc id over every document containing the shingle) is this document —
    * the "how much genuinely new text does this document contribute" score
    * that triages additions to a training corpus (a scrape with novelty
    * ≈ 0 is already covered; boilerplate scores 0 automatically because
    * some earlier doc holds each shingle). Id order stands in for arrival
    * order, matching the engine's min-id survivor convention.
    *
    * Scale shape: shingle occurrence rows carry (doc_id, hash60) — two
    * longs, never the shingle text. The first-occurrence table groups on
    * the ~uniform hash; the join back is on the same key, so Catalyst
    * reuses one exchange for both consumers (same-subplan shuffle reuse).
    * A hash collision merges two shingles' electorates (first-writer wins)
    * — p ≈ shingles²·2⁻⁶¹, and the oracle hashes identically.
    *
    * Output: (doc_id, n_shingles, n_novel, novelty); docs with fewer than
    * n tokens have no shingles and are absent (the shingles() convention).
    */
  def ngramNovelty(df: DataFrame, id: Column, text: Column, n: Int): DataFrame = {
    val sh = shingleRows(df, id, text, n)
      .select(col("doc_id"), Hashing.hash60(col("sh")).as("gh"))
    val first = sh.groupBy(col("gh")).agg(min(col("doc_id")).as("first_id"))
    sh.join(first, "gh")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("first_id") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty", col("n_novel").cast("double") / col("n_shingles"))
  }

  /** Shared pair-counting core of the shingle-set metrics: inverted-index
    * join (bounded by `maxShingleDf`) → (id_a, id_b, inter, sz_a, sz_b),
    * id_a < id_b.
    */
  /** Exact dedup groups keyed on the NFC-NORMALIZED text: groups that
    * byte-keyed dedup splits (composed vs decomposed Unicode spellings of
    * the same text) merge here; `n_raw_distinct` counts how many raw byte
    * forms the group contained, so `n_raw_distinct > 1` rows are exactly
    * the duplicates plain [[exactGroups]] misses. Same md5-shuffle-key
    * scale shape as exactGroups — normalization happens before the hash,
    * on the scan side.
    */
  def normalizedDedupGroups(df: DataFrame, id: Column, text: Column): DataFrame =
    df.groupBy(md5(Text.nfc(text)).as("norm_hash"))
      .agg(min(id).as("rep_id"), count(lit(1)).as("n_docs"),
        countDistinct(md5(text.cast("string"))).as("n_raw_distinct"))
      .where(col("n_docs") >= 2)

  // -------------------------------------------------------------------------
  // Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003 — the
  // MOSS local document fingerprinting algorithm).
  // -------------------------------------------------------------------------

  /** Positioned k-gram shingle hashes: (doc_id, n_sh, pos, h) with pos dense
    * 1..n_sh over the token stream and h = hash60 of the space-joined k-gram
    * starting at pos. NOT distinct — winnowing selects from the full
    * positional sequence. Hashes are computed INSIDE the transform lambda,
    * so exploded rows carry (pos, h) pairs only; the token array never
    * survives the explode.
    */
  def positionedShingleHashes(
      df: DataFrame,
      id: Column,
      text: Column,
      k: Int): DataFrame =
    spreadBy(df, id)
      .select(id.as("doc_id"), Text.tokens(text).as("t"))
      .where(size(col("t")) >= k)
      .select(col("doc_id"), (size(col("t")) - lit(k - 1)).cast("long").as("n_sh"),
        explode(transform(sequence(lit(1), size(col("t")) - lit(k - 1)),
          i => struct(i.cast("long").as("pos"),
            Hashing.hash60(concat_ws(" ", slice(col("t"), i, lit(k)))).as("h"))))
          .as("p"))
      .select(col("doc_id"), col("n_sh"), col("p.pos").as("pos"), col("p.h").as("h"))

  /** STANDARD winnowing fingerprint selection (rightmost-min tie-break; the
    * paper's "robust" variant would instead prefer the previously selected
    * hash on ties — not implemented here): every window of `w` consecutive
    * k-gram hashes selects its minimum, RIGHTMOST position on ties (the
    * min-of-(hash, -pos) struct trick makes the tie-break part of the
    * ordering itself); a document with fewer than w shingles selects from
    * the single window covering the whole document, so every document with
    * at least one shingle yields at least one fingerprint. Output: distinct
    * (doc_id, pos, h). Expected density is 2/(w+1) of the shingle count
    * (the winnowing guarantee), with a worst-case gap of w-1 positions
    * between selections — the LOCAL property n-gram sampling (e.g. 0 mod p)
    * lacks.
    *
    * Scale shape: the only corpus-scale stage is the per-doc analytic
    * window, whose partitioning key (doc_id) is exactly the spreadBy key of
    * the positioned rows — one exchange, reused. Selected fingerprints are
    * (id, pos, long) triples; shingle text dies before any shuffle.
    */
  def winnowFingerprints(
      df: DataFrame,
      id: Column,
      text: Column,
      k: Int,
      w: Int): DataFrame = {
    require(w >= 1, "winnowing window must cover at least one shingle")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(w - 1), org.apache.spark.sql.expressions.Window.currentRow)
    positionedShingleHashes(df, id, text, k)
      .withColumn("sel",
        min(struct(col("h").as("h"), (-col("pos")).as("np"))).over(win))
      .where(col("pos") >= least(lit(w.toLong), col("n_sh")))
      .select(col("doc_id"), (-col("sel.np")).as("pos"), col("sel.h").as("h"))
      .distinct()
  }

  /** Near-dup pairs over WINNOWED fingerprint sets — containment
    * (|A∩B| / min |A|,|B|) on the selected hashes. Same inverted-index
    * join as [[containmentPairs]], but the index is the winnowed ~2/(w+1)
    * fraction of the shingle index: the 100 TB story of winnowing is that
    * the pair-generation index shrinks by w/2 while any shared run of at
    * least w+k-1 tokens still collides (the winnowing guarantee — both
    * documents select the same minimum inside the shared window).
    * `maxFpDf` drops ultra-common fingerprints, the [[ngramJaccardPairs]]
    * df-cap discipline.
    */
  def winnowOverlapPairs(
      df: DataFrame,
      id: Column,
      text: Column,
      k: Int,
      w: Int,
      threshold: Double,
      maxFpDf: Option[Int] = None): DataFrame = {
    val fp0 = winnowFingerprints(df, id, text, k, w)
      .select(col("doc_id"), col("h")).distinct()
    val fp = maxFpDf match {
      case Some(cap) =>
        val dfreq = fp0.groupBy(col("h")).agg(count(lit(1)).as("df"))
          .where(col("df") <= cap).select(col("h"))
        fp0.join(dfreq, "h")
      case None => fp0
    }
    val fpc = fp.localCheckpoint()
    val sizes = fpc.groupBy(col("doc_id")).agg(count(lit(1)).as("nfp"))
    val inter = fpc.select(col("doc_id").as("id_a"), col("h"))
      .join(fpc.select(col("doc_id").as("id_b"), col("h")), Seq("h"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("id_a"), col("nfp").as("nfp_a")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("nfp").as("nfp_b")), "id_b")
      .withColumn("overlap",
        col("inter").cast("double") / least(col("nfp_a"), col("nfp_b")))
      .where(col("overlap") >= threshold)
      .select(col("id_a"), col("id_b"), col("inter"), col("nfp_a"), col("nfp_b"),
        col("overlap"))
  }

  private def shinglePairCounts(
      df: DataFrame,
      id: Column,
      text: Column,
      n: Int,
      maxShingleDf: Option[Int]): DataFrame = {
    val sh0 = shingleRows(df, id, text, n)
    val sh = maxShingleDf match {
      case Some(cap) =>
        val dfreq = sh0.groupBy(col("sh")).agg(count(lit(1)).as("df"))
          .where(col("df") <= cap).select(col("sh"))
        sh0.join(dfreq, "sh")
      case None => sh0
    }
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val a = sh.select(col("doc_id").as("id_a"), col("sh"))
    val b = sh.select(col("doc_id").as("id_b"), col("sh"))
    val inter = a.join(b, Seq("sh"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("sz_b")), "id_b")
  }

  /** MinHash signatures: (doc_id, seed, mh) with mh = min over shingles of
    * the arithmetic family h_seed(shingle) = (A(seed)*hash60(shingle mod 2^30)
    * + B(seed)) mod P (Hashing.familyHash). numHashes seeds, 0-based.
    *
    * Cost shape: ONE md5 per shingle (the base hash), then numHashes cheap
    * arithmetic min-aggregates — not numHashes md5s. The shuffle carries one
    * row per (doc, shingle) with a single long; the k mins ride partial
    * aggregation as k agg buffers, and the k-row-per-doc output is produced
    * by a posexplode over the already-aggregated (tiny) result.
    */
  def minhashSignatures(
      df: DataFrame,
      id: Column,
      text: Column,
      n: Int,
      numHashes: Int): DataFrame = {
    val sh = shingleRows(df, id, text, n)
      .select(col("doc_id"), Hashing.familyBaseHash(col("sh")).as("hb"))
    val mins = (0 until numHashes)
      .map(i => min(Hashing.familyHash(col("hb"), i)).as(s"mh_$i"))
    sh.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        posexplode(array((0 until numHashes).map(i => col(s"mh_$i")): _*)))
      .withColumnRenamed("pos", "seed")
      .withColumnRenamed("col", "mh")
  }

  /** LSH banding over minhash signatures: (doc_id, band, band_sig), with an
    * order-independent band signature (sum of seed-tagged family rehashes —
    * avoids a collect_list sort; values < P ≈ 2^30, rowsPerBand <= 16 sums
    * stay far inside int64).
    */
  def lshBands(signatures: DataFrame, rowsPerBand: Int): DataFrame =
    signatures
      .withColumn("band", expr(s"seed div $rowsPerBand"))
      .select(col("doc_id"), col("band"),
        // mh < P < 2^30 by construction, so mh*C1 < 2^60 (ANSI-safe).
        ((col("mh") * lit(Hashing.BandC1)
          + (col("seed") + lit(1)) * lit(Hashing.BandC2)) % lit(Hashing.FamilyP)).as("hs"))
      .groupBy(col("doc_id"), col("band"))
      .agg(sum(col("hs")).as("band_sig"))

  /** Candidate near-dup pairs: distinct (id_a < id_b) colliding in >=1 band.
    *
    * Bucket-grouped, not self-joined: a self-join would evaluate the whole
    * signature pipeline twice (Spark does not reuse the duplicated subplan).
    * Instead, group doc ids per (band, band_sig) bucket once and emit
    * intra-bucket pairs by exploding the sorted id list — id_a < id_b falls
    * out of the sort order. Per-bucket lists are bounded by band-collision
    * cardinality (near-dup cluster size), the same bound that caps the join's
    * output.
    *
    * `maxBucket` is the mega-bucket guard (the twin of
    * [[ngramJaccardPairs]]'s `maxShingleDf`): a boilerplate-heavy corpus
    * (identical headers/footers) can make one (band, band_sig) bucket hold
    * millions of ids — the collect_list buffer then concentrates on a single
    * task and the intra-bucket pair explosion goes quadratic. Buckets larger
    * than the cap are DROPPED whole (their members are mega-cluster
    * boilerplate that exact dedup already collapses; partial emission would
    * be arbitrary). Dropped-pair loss is bounded: only pairs whose EVERY
    * colliding band bucket exceeds the cap are lost.
    */
  def lshCandidatePairs(bands: DataFrame, maxBucket: Option[Int] = None): DataFrame = {
    val grouped = bands.groupBy(col("band"), col("band_sig"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .where(size(col("ids")) > 1)
    val capped = maxBucket match {
      case Some(cap) => grouped.where(size(col("ids")) <= cap)
      case None => grouped
    }
    capped
      .select(posexplode(col("ids")).as(Seq("i", "id_a")), col("ids"))
      .select(col("id_a"),
        explode(slice(col("ids"), col("i") + lit(2), size(col("ids")))).as("id_b"))
      .distinct()
  }

  /** Benchmark DECONTAMINATION: flag corpus documents that share at least
    * `minShared` distinct word n-gram shingles with any eval-set document —
    * the standard "did the training corpus swallow the benchmark?" check a
    * training-data pipeline runs before every dataset release.
    *
    * Output: (doc_id, eval_id, n_shared) for every contaminated
    * (corpus doc, eval doc) pair.
    *
    * Scale shape: the eval set is benchmarks — thousands of docs against a
    * 100 TB corpus — so its exploded shingle rows BROADCAST and the corpus
    * side never shuffles: the whole check is one map-side broadcast join +
    * one partial-aggregated count, a single pass over the corpus. Fan-out
    * per corpus shingle is bounded by the eval set's shingle df.
    */
  def contaminationPairs(
      corpus: DataFrame,
      evalSet: DataFrame,
      id: Column,
      text: Column,
      n: Int,
      minShared: Long): DataFrame = {
    val c = shingleRows(corpus, id, text, n)
    val e = shingleRows(evalSet, id, text, n)
      .select(col("doc_id").as("eval_id"), col("sh"))
    c.join(broadcast(e), "sh")
      .groupBy(col("doc_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** [[contaminationPairs]] with a BLOOM-FILTER pre-filter stage — same
    * output, different (bigger) scale envelope.
    *
    * The exact variant broadcasts the eval set's RAW exploded shingle rows,
    * which stops working once the eval suite grows past broadcast size
    * (100M shingles × ~30 bytes is gigabytes). Here the eval shingles are
    * collapsed into a fixed `numBits / 8`-byte Bloom bit array by the native
    * [[graft.plans.BloomFilter60]] aggregate (one OR-mergeable buffer per
    * partition through the shuffle), and only the BITS broadcast. Corpus
    * shingles are probed map-side — no false negatives, so every truly
    * shared shingle survives — and the surviving sliver (truly shared
    * shingles + the ≈(1−e^(−kn/m))^k false positives) flows into the exact
    * shingle join, which kills the false positives. The final join is a
    * plain shuffled join: both sides are already reduced, so neither needs
    * to broadcast. bloom + exact verify ≡ exact, hence the oracle is the
    * very same relational query as [[contaminationPairs]]'s.
    */
  def contaminationPairsBloom(
      corpus: DataFrame,
      evalSet: DataFrame,
      id: Column,
      text: Column,
      n: Int,
      minShared: Long,
      numBits: Int = 1 << 20,
      numHashes: Int = 3): DataFrame = {
    val e = shingleRows(evalSet, id, text, n)
      .select(col("doc_id").as("eval_id"), col("sh"))
    val bloom = e.agg(Hashing.bloomFilterAgg(col("sh"), numBits, numHashes).as("bf"))
    // 1-row bloom attaches via BroadcastNestedLoopJoin (the scalar-attach plan)
    val survivors = shingleRows(corpus, id, text, n)
      .crossJoin(broadcast(bloom))
      .where(Hashing.bloomMightContain(col("bf"), col("sh"), numBits, numHashes))
      .drop("bf")
    survivors.join(e, "sh")
      .groupBy(col("doc_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Per-EVAL-DOC contamination report — the leakage summary a curator reads
    * before trusting a benchmark number, aggregated from
    * [[contaminationPairs]]' (corpus_doc, eval_doc, n_shared) rows: how many
    * corpus documents leak into each eval document, the worst single
    * overlap, and that overlap as a fraction of the eval doc's shingle set
    * (max containment — 1.0 means some corpus doc covers the eval doc's
    * n-grams entirely). Every eval doc appears, zeros included: "nothing
    * leaked" is the row the curator is looking for, and a silently missing
    * row is indistinguishable from an unchecked one.
    *
    * Scale shape: the pair frame is already eval-bounded (≪ corpus); the
    * report groups it by eval_id and joins the #eval-docs-row shingle-size
    * frame — nothing corpus-sized crosses a shuffle beyond what
    * [[contaminationPairs]] itself does.
    */
  def contaminationReport(
      corpus: DataFrame,
      evalSet: DataFrame,
      id: Column,
      text: Column,
      n: Int,
      minShared: Long): DataFrame = {
    val pairs = contaminationPairs(corpus, evalSet, id, text, n, minShared)
    val sizes = shingleRows(evalSet, id, text, n)
      .groupBy(col("doc_id").as("eval_id"))
      .agg(count(lit(1)).as("n_shingles"))
    val agg = pairs.groupBy(col("eval_id")).agg(
      count(lit(1)).as("n_flagged"),
      max(col("n_shared")).as("max_shared"))
    sizes.join(agg, Seq("eval_id"), "left")
      .select(col("eval_id"), col("n_shingles"),
        coalesce(col("n_flagged"), lit(0L)).as("n_flagged"),
        coalesce(col("max_shared"), lit(0L)).as("max_shared"),
        (coalesce(col("max_shared"), lit(0L)).cast("double") /
          col("n_shingles").cast("double")).as("max_containment"))
  }

  /** LSH RECALL AUDIT: the measurement that justifies replacing the exact
    * inverted-index pair scan with MinHash+LSH at scale. Joins the exact
    * Jaccard pairs (ground truth, threshold as low as affordable) against
    * the LSH candidate set and reports recall per similarity band
    * (floor(jaccard·10)) — the empirical S-curve of the chosen (bands,
    * rows-per-band) configuration, read next to the theoretical
    * 1−(1−j^r)^b before committing an LSH config to a production dedup run.
    *
    * Scale shape: both inputs are pair frames (bounded by the upstream df /
    * bucket caps); the audit itself is one pair-keyed left join plus a
    * #bands-row aggregate. At 100 TB the exact side runs on a SAMPLE of the
    * corpus (ground truth needs only statistical mass); the audit dataflow
    * is unchanged.
    */
  def lshRecallAudit(exactPairs: DataFrame, candidates: DataFrame): DataFrame = {
    val cand = candidates.select(col("id_a").as("__lr_a"), col("id_b").as("__lr_b"),
      lit(1L).as("__lr_found"))
    exactPairs
      .join(cand, col("id_a") === col("__lr_a") && col("id_b") === col("__lr_b"), "left")
      .withColumn("band", floor(col("jaccard") * lit(10)).cast("long"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(coalesce(col("__lr_found"), lit(0L))).as("n_found"))
      .withColumn("recall",
        col("n_found").cast("double") / col("n_pairs").cast("double"))
  }

  /** Maximal duplicated token spans — the relational re-expression of
    * "ExactSubstr" dedup (Lee et al. 2021, arXiv:2107.06499 §4: remove
    * substrings repeated verbatim elsewhere in the corpus). A suffix array
    * does not distribute as a dataflow, but its OUTPUT is reproducible with
    * three shuffles: every n-token window position whose gram occurs ≥
    * `minDf` times corpus-wide (within- or cross-document) is marked, and
    * runs of consecutive marked positions in a doc merge (gaps-and-islands:
    * pos − row_number per doc) into one maximal span — exactly the spans a
    * suffix array would report for repeats of length ≥ n, merged to their
    * maximal extent.
    *
    * Output: (doc_id, span_start, span_len, span_text); `span_start` is the
    * 1-based token index, `span_len` in tokens (≥ n).
    *
    * Scale shape: occurrence rows carry (doc_id, pos, gram_hash) — three
    * longs, never the gram text (one md5 per window, the [[Hashing.hash60]]
    * cross-engine hash; a collision falsely marks one window duplicated,
    * p ≈ occurrences²·2⁻⁶¹ — documented, and the oracle hashes
    * identically). The duplicated-gram filter is a LEFT SEMI join against
    * the (hash, count) aggregate — no fan-out, both sides shuffle on the
    * ~uniform hash. The islands window shuffles (doc_id, pos) pairs only,
    * and the token arrays reappear exactly once, in the final slice join
    * against the (already spread) doc table.
    */
  def duplicatedSpans(
      df: DataFrame,
      id: Column,
      text: Column,
      n: Int,
      minDf: Long = 2L): DataFrame = {
    require(n >= 1, "span gram size must be >= 1")
    val base = spreadBy(df, id)
      .select(id.as("doc_id"), Text.tokens(text).as("t"))
      .where(size(col("t")) >= n)
    val occ = base.select(col("doc_id"),
      explode(transform(sequence(lit(1), size(col("t")) - lit(n - 1)), i =>
        struct(i.cast("long").as("pos"),
          Hashing.hash60(concat_ws(" ", slice(col("t"), i, lit(n)))).as("gh"))))
        .as("o"))
      .select(col("doc_id"), col("o.pos").as("pos"), col("o.gh").as("gh"))
    val dupGrams = occ.groupBy(col("gh")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minDf)
    val marked = occ.join(dupGrams, Seq("gh"), "left_semi")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = marked
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) - min(col("pos")) + lit(n.toLong)).as("span_len"))
      .drop("grp")
    spans.join(base, "doc_id")
      .select(col("doc_id"), col("span_start"), col("span_len"),
        concat_ws(" ", slice(col("t"), col("span_start").cast("int"),
          col("span_len").cast("int"))).as("span_text"))
  }

  /** The REMOVAL step of ExactSubstr dedup (Lee et al. 2021 §4.1 cut the
    * duplicated substring occurrences, keeping one): every maximal
    * duplicated span from [[duplicatedSpans]] survives only at its
    * globally-first occurrence (min (doc_id, span_start) per EXACT span
    * text); all later occurrences are cut from their documents token-wise.
    * Output, one row per input doc (cut or not): (doc_id, n_tokens,
    * n_removed, cleaned_text).
    *
    * Contract (the oracle implements the identical rules):
    *  - the election is per exact MAXIMAL span text: when a shared run is
    *    merged into different maximal extents in different docs (one doc
    *    pairs it with an adjacent duplicated run), each distinct extent is
    *    its own electorate and keeps its own first occurrence — span-level
    *    dedup, deliberately coarser than a suffix array's run-level cut;
    *  - elected winners survive VERBATIM: token ranges of nearby spans can
    *    overlap even though their marked position sets are disjoint (a
    *    1-position island gap is < n tokens wide), so a token is kept when
    *    it lies in any winning span OR outside every losing span — a
    *    losing neighbor can never mutilate a winner.
    *
    * Scale shape: everything span-sized rides the [[duplicatedSpans]]
    * machinery; the first-occurrence election is ONE window over
    * md5(span_text) (32-byte partition keys, span rows only — not corpus
    * rows); the winner/loser range lists join back per doc (ranges ≪ doc
    * length), and the token filter is a pure per-row HOF — no corpus-sized
    * shuffle beyond the span detection itself.
    */
  def cutDuplicatedSpans(
      df: DataFrame,
      id: Column,
      text: Column,
      n: Int,
      minDf: Long = 2L): DataFrame = {
    val spans = duplicatedSpans(df, id, text, n, minDf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("span_text")))
      .orderBy(col("doc_id").asc, col("span_start").asc)
    val ranked = spans.withColumn("rn", row_number().over(w))
    def rangesOf(part: DataFrame, name: String): DataFrame = part
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("span_start").as("s"),
        (col("span_start") + col("span_len") - 1L).as("e")))).as(name))
    val losers = rangesOf(ranked.where(col("rn") > 1), "lose")
    val winners = rangesOf(ranked.where(col("rn") === 1), "win")
    val emptyRanges = array().cast("array<struct<s:bigint,e:bigint>>")
    def covered(ranges: Column, p: Column): Column =
      exists(ranges, r => p >= r.getField("s") && p <= r.getField("e"))
    Dedup.spreadBy(df, id)
      .select(id.as("doc_id"), Text.tokens(text).as("t"))
      .join(losers, Seq("doc_id"), "left_outer")
      .join(winners, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("t"),
        coalesce(col("lose"), emptyRanges).as("lose"),
        coalesce(col("win"), emptyRanges).as("win"))
      .select(col("doc_id"), col("t"),
        filter(sequence(lit(1L), size(col("t")).cast("long")), p =>
          covered(col("win"), p) || !covered(col("lose"), p)).as("kept"))
      .select(col("doc_id"),
        size(col("t")).cast("long").as("n_tokens"),
        (size(col("t")) - size(col("kept"))).cast("long").as("n_removed"),
        concat_ws(" ", transform(col("kept"),
          p => element_at(col("t"), p.cast("int")))).as("cleaned_text"))
  }

  /** Targeted DECONTAMINATION removal — the surgical complement of
    * [[contaminationPairs]] (which FLAGS documents) and
    * [[cutDuplicatedSpans]] (which cuts corpus-internal repeats): every
    * n-token window of a corpus document that appears VERBATIM anywhere in
    * the eval set is marked, consecutive marks merge gaps-and-islands into
    * maximal contaminated spans, and ALL of them are cut token-wise — no
    * winner election, because evaluation text must survive nowhere in
    * training data (the Lee et al. 2021 cut applied against an external
    * vocabulary instead of the corpus itself). Dropping whole flagged
    * documents (the q87 → filter composition) throws away every clean
    * token in them; this keeps the document minus the leaked spans.
    *
    * Output, one row per corpus doc (cut or not): (doc_id, n_tokens,
    * n_removed, cleaned_text).
    *
    * Scale shape: the eval window vocabulary is a DISTINCT hash set
    * (benchmarks ≪ corpus) and BROADCASTS into a left-semi mark join — the
    * corpus side never shuffles for the marking; the islands window and
    * range join-back are the audited [[duplicatedSpans]] shapes ((doc_id,
    * pos) pairs and per-doc range lists); the token filter is a per-row
    * HOF. Hash collision falsely cuts one window (p ≈ windows²·2⁻⁶¹,
    * documented — conservative in the removal direction).
    */
  def cutEvalSpans(
      df: DataFrame,
      id: Column,
      text: Column,
      eval: DataFrame,
      evalId: Column,
      evalText: Column,
      n: Int): DataFrame = {
    require(n >= 1, "span gram size must be >= 1")
    val eg = spreadBy(eval, evalId)
      .select(explode(Text.shingles(evalText, n)).as("sh"))
      .select(Hashing.hash60(col("sh")).as("gh")).distinct()
    val base = spreadBy(df, id).select(id.as("doc_id"), Text.tokens(text).as("t"))
    val occ = base.where(size(col("t")) >= n)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("t")) - lit(n - 1)), i =>
          struct(i.cast("long").as("pos"),
            Hashing.hash60(concat_ws(" ", slice(col("t"), i, lit(n)))).as("gh"))))
          .as("o"))
      .select(col("doc_id"), col("o.pos").as("pos"), col("o.gh").as("gh"))
    val marked = occ.join(broadcast(eg), Seq("gh"), "left_semi")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val cuts = marked
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + lit(n - 1L)).as("e"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("cut"))
    val emptyRanges = array().cast("array<struct<s:bigint,e:bigint>>")
    base.join(cuts, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("t"), coalesce(col("cut"), emptyRanges).as("cut"))
      .select(col("doc_id"), col("t"),
        filter(sequence(lit(1L), size(col("t")).cast("long")), p =>
          !exists(col("cut"), r => p >= r.getField("s") && p <= r.getField("e")))
          .as("kept"))
      .select(col("doc_id"),
        size(col("t")).cast("long").as("n_tokens"),
        (size(col("t")) - size(col("kept"))).cast("long").as("n_removed"),
        concat_ws(" ", transform(col("kept"),
          p => element_at(col("t"), p.cast("int")))).as("cleaned_text"))
  }

  /** MinHash Jaccard ESTIMATE on candidate pairs: the fraction of agreeing
    * signature components (P[min-hash agrees] = Jaccard, so the mean of k
    * agreement indicators is an unbiased estimate with stderr
    * ~ sqrt(J(1−J)/k)). This is the cheap rank/filter stage a pipeline runs
    * BETWEEN LSH candidate generation and exact shingle-join verification:
    * signatures are k small longs per doc, so scoring a candidate pair costs
    * k integer compares — no re-tokenization, no shingle re-join.
    *
    * Input: `signatures` as produced by [[minhashSignatures]]
    * ((doc_id, seed, mh) rows), `candidates` as produced by
    * [[lshCandidatePairs]] ((id_a, id_b)). Output: (id_a, id_b, n_agree,
    * n_hashes, est_jaccard), optionally filtered to `minEstimate`.
    *
    * Scale shape: candidates join signatures by id (ids-only shuffles,
    * ×k row amplification on the candidate set — NOT the corpus), one
    * partial-aggregated count per pair.
    */
  def minhashJaccardEstimate(
      signatures: DataFrame,
      candidates: DataFrame,
      minEstimate: Option[Double] = None): DataFrame = {
    val sa = signatures.select(col("doc_id").as("id_a"), col("seed"), col("mh").as("mh_a"))
    val sb = signatures.select(col("doc_id").as("id_b"), col("seed"), col("mh").as("mh_b"))
    val est = candidates.join(sa, "id_a").join(sb, Seq("id_b", "seed"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(
        sum(when(col("mh_a") === col("mh_b"), 1L).otherwise(0L)).as("n_agree"),
        count(lit(1)).as("n_hashes"))
      // division by the hash count is exact in binary for power-of-two k,
      // and cross-engine-stable regardless (one double op from two ints)
      .withColumn("est_jaccard", col("n_agree").cast("double") / col("n_hashes"))
    minEstimate.map(t => est.where(col("est_jaccard") >= t)).getOrElse(est)
  }

  /** Connected components over candidate near-dup pairs: the step that turns
    * PAIRS (what every LSH/Jaccard/simhash path emits) into CLUSTERS — the
    * transitive closure a curation pipeline needs before it can pick one
    * survivor per duplicate group.
    *
    * Output: (id, cluster_id) for every node appearing in `pairs`, where
    * cluster_id = the MINIMUM id in the node's connected component (so the
    * label is also the canonical representative — the same min-id policy as
    * [[exactByKey]]).
    *
    * Algorithm: iterative hash-min label propagation with ADAPTIVE pointer
    * jumping. Each round every node takes the min of its own label and its
    * neighbors' labels (one edges⋈labels shuffle join + one
    * min-aggregation). Real near-dup graphs are shallow (duplicates of a
    * common ancestor) and converge in 2-3 such rounds; if convergence drags
    * past `jumpAfter` rounds — a chain-shaped pathology — each further
    * round also chases one level of label indirection (label := that
    * label-node's own label, a self-join on the label frame; labels are
    * always member-node ids, so the lookup resolves). Jumped label
    * information travels 2^k hops after k rounds, so even a million-node
    * chain converges in ~20 rounds total (O(log diameter)), while the
    * common shallow case never pays the extra join. Converged when no label
    * changed; `maxIter` is the runaway guard. Everything is a pure
    * shuffle-on-key dataflow: no driver-side union-find, no collect — the
    * only driver action per round is the scalar convergence count.
    * `localCheckpoint` per round keeps the plan flat (lineage would
    * otherwise double every iteration — the q68/q69 lesson).
    *
    * The label frame that shuffles each round is (id, label) ONLY — two
    * columns, no payload — so at 10^9 nodes a round is a join on ids against
    * the (static, checkpointed) edge list. Skew bound: a node's in-round
    * fan-in equals its degree; pair generators above already cap bucket
    * sizes (`maxBucket` / `maxShingleDf`), which bounds degree at the source.
    */
  def connectedComponents(pairs: DataFrame, idA: String, idB: String,
      maxIter: Int = 50, jumpAfter: Int = 3): DataFrame = {
    val half = pairs.select(col(idA).as("src"), col(idB).as("dst"))
    val edges = half
      .unionByName(half.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val nbr = edges
        .join(labels.select(col("id").as("src"), col("lbl")), "src")
        .select(col("dst").as("id"), col("lbl"))
      val propagated = labels.unionByName(nbr)
        .groupBy(col("id")).agg(min(col("lbl")).as("lbl"))
        .localCheckpoint() // consumed twice when jumping — never recompute
      // adaptive pointer jump: lbl -> label(lbl). Labels are member-node
      // ids and label(x) <= x, so the inner self-join always resolves and
      // labels only ever decrease within the component.
      val next =
        if (iter < jumpAfter) propagated
        else propagated
          .join(propagated.select(col("lbl").as("lbl2"), col("id").as("lbl")), "lbl")
          .select(col("id"), col("lbl2").as("lbl"))
          .localCheckpoint()
      changed = next
        .join(labels.select(col("id"), col("lbl").as("prev")), "id")
        .where(col("lbl") =!= col("prev"))
        .count()
      labels = next
      iter += 1
    }
    require(changed == 0, s"connectedComponents did not converge in $maxIter rounds")
    labels.select(col("id"), col("lbl").as("cluster_id"))
  }

  /** INCREMENTAL [[connectedComponents]]: merge a new batch of candidate
    * pairs into an existing (id, cluster_id) labeling without re-walking
    * the full historical pair set — the daily-ingest shape (history's pairs
    * were already clustered; only the delta arrives).
    *
    * Each existing cluster is re-encoded as STAR edges (member, cluster_id)
    * — the label is the component's min MEMBER id, so the star preserves
    * both connectivity and the min — and the hash-min propagation reruns on
    * star ∪ new edges. Old components enter pre-collapsed at diameter <= 2,
    * so rounds track the NEW batch's merge structure, not history's: a new
    * edge bridging two old clusters resolves in one propagation instead of
    * re-walking both chains. Result == full recompute on the union of all
    * pairs ever seen (property-tested), because star edges are
    * connectivity- and min-preserving.
    *
    * Scale shape: identical to [[connectedComponents]] (that is the point —
    * same (id, label)-only shuffles), but over |labels| + |newPairs| edges
    * instead of |allPairs|, and converging in rounds bounded by the delta's
    * diameter.
    */
  def connectedComponentsIncremental(
      labels: DataFrame,
      newPairs: DataFrame,
      idA: String,
      idB: String,
      maxIter: Int = 50,
      jumpAfter: Int = 3): DataFrame = {
    val starEdges = labels.where(col("id") =!= col("cluster_id"))
      .select(col("id").as("__inc_a"), col("cluster_id").as("__inc_b"))
    val unioned = starEdges.unionByName(
      newPairs.select(col(idA).as("__inc_a"), col(idB).as("__inc_b")))
    connectedComponents(unioned, "__inc_a", "__inc_b", maxIter, jumpAfter)
  }

  /** Keep one survivor per near-dup cluster: drop every row whose id appears
    * in `labels` (the [[connectedComponents]] output) with a cluster_id other
    * than itself. Because the cluster label IS the component's min id, the
    * survivor set is exactly "rows not labeled as someone else's duplicate" —
    * a single broadcast-able anti-join, no window needed. Rows never seen in
    * any pair are singletons and survive untouched.
    */
  def keepClusterRepresentative(df: DataFrame, id: Column, labels: DataFrame): DataFrame = {
    require(!df.columns.contains("__cc_dup"),
      "keepClusterRepresentative: input frame already uses the reserved column name __cc_dup")
    val dupes = labels.where(col("id") =!= col("cluster_id"))
      .select(col("id").as("__cc_dup"))
    df.join(dupes, id === col("__cc_dup"), "left_anti")
  }

  /** Keep the HIGHEST-QUALITY survivor per near-dup cluster (vs
    * [[keepClusterRepresentative]]'s min-id policy): within each cluster the
    * row maximizing `score` (ties broken by min id) survives; every other
    * member is dropped. Min-id keeps whichever duplicate happened to be
    * ingested first — for a training corpus the curator wants the cleanest
    * copy, not the earliest.
    *
    * Scale shape: only rows that appear in `labels` (i.e. participated in at
    * least one near-dup pair — a vanishing fraction of the corpus) enter the
    * election window; the untouched corpus passes through a single anti-join
    * against the label frame (pair-derived, broadcastable). The window
    * partitions on cluster_id and orders by (score desc, id asc) — cluster
    * populations are bounded upstream by the pair caps (`maxBucket` /
    * `maxShingleDf`), so no window partition goes corpus-scale.
    */
  def keepBestInCluster(df: DataFrame, id: Column, score: Column,
      labels: DataFrame): DataFrame = {
    require(!df.columns.contains("__kb_id"),
      "keepBestInCluster: input frame already uses the reserved column name __kb_id")
    val lab = labels.select(col("id").as("__kb_id"), col("cluster_id").as("__kb_cluster"))
    val members = df.join(lab, id === col("__kb_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__kb_cluster"))
      .orderBy(score.desc, id.asc)
    val winners = members.withColumn("__kb_rn", row_number().over(w))
      .where(col("__kb_rn") === 1)
      .drop("__kb_id", "__kb_cluster", "__kb_rn")
    val untouched = df.join(lab.select(col("__kb_id")),
      id === col("__kb_id"), "left_anti")
    untouched.unionByName(winners)
  }

  /** CCNet-style paragraph-level exact dedup across the corpus: split each
    * document on `sep`, elect the FIRST occurrence (min (doc_id, pos)) of
    * every distinct paragraph corpus-wide, cut all later occurrences, and
    * stitch each document back together from its surviving paragraphs in
    * original order. Finer-grained than document dedup (q50) and coarser
    * than span dedup (q115): boilerplate paragraphs (headers, licenses,
    * navigation) repeated across otherwise-distinct pages vanish exactly
    * once-removed.
    *
    * Output: (doc_id, n_paras, n_kept, clean_text); a document whose every
    * paragraph lost its election keeps an empty clean_text row (n_kept = 0)
    * rather than disappearing.
    *
    * Scale shape: two shuffles — the election window partitions on
    * md5(paragraph) (32-byte key, the [[exactByKey]] discipline; collisions
    * merge electorates first-writer-wins at ~2^-64/pair), and the rebuild
    * groups on doc_id. Paragraph text rides each shuffle exactly once; the
    * base frame contributes only (doc_id, n_paras) to the final join. The
    * per-hash window is bounded by the paragraph's corpus frequency — a
    * pathological mega-boilerplate paragraph lands one window partition of
    * its df, acceptable because the window computes only row_number.
    */
  def paragraphDedup(df: DataFrame, id: Column, text: Column,
      sep: String = "\n"): DataFrame = {
    val paras = spreadBy(df.select(id.as("doc_id"), text.as("__pd_text")), col("doc_id"))
      .select(col("doc_id"), posexplode(split(col("__pd_text"), sep)).as(Seq("pos", "para")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("para")))
      .orderBy(col("doc_id"), col("pos"))
    val kept = paras.withColumn("__pd_rn", row_number().over(w))
      .where(col("__pd_rn") === 1)
    val rebuilt = kept.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_kept"),
      array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("para")))),
          s => s.getField("para")),
        sep).as("clean_text"))
    df.select(id.as("doc_id"),
        size(split(text, sep)).cast("long").as("n_paras"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Edit-distance (Levenshtein) near-dup pairs among DISTINCT values of a
    * short-string column — TWO zero-recall-loss blocking dimensions, so the
    * candidate set never goes quadratic in a popular length band:
    *
    *  1. Length filter: |len(a) − len(b)| <= lev(a, b).
    *  2. Q-gram count filter (Gravano et al., approximate string joins): one
    *     edit operation creates/destroys at most `q` q-gram types, so a pair
    *     within lev `d` shares >= max(nd_a, nd_b) − d·q DISTINCT q-grams
    *     (nd = the name's distinct q-gram count). Candidates come from an
    *     inverted-index join on the q-gram (exactly [[ngramJaccardPairs]]'s
    *     shape), aggregated to a shared-gram count and filtered against the
    *     bound — a pair of long strings must now agree on most of their
    *     grams to survive, not merely on length.
    *
    * The gram bound is vacuous when BOTH sides are short (max(nd) <= d·q):
    * such a pair can share zero grams yet be within budget ("ab"/"cd" at
    * lev 2), so short×short pairs route through the plain length-band
    * equi-join — a bounded pool (names of <= ~(d·q+q−1) chars) that cannot
    * explode. Pairs with at least one long side are covered by the gram join
    * (shared >= nd_long − d·q >= 1 guarantees a colliding gram). Survivors
    * of either path get exact `levenshtein` verification, so the blocking is
    * invisible in the result — the oracle stays the naive all-pairs SQL.
    *
    * Cost bound: the gram join produces Σ_g df(g)² rows (df = names
    * containing gram g) instead of Σ_len n(len)² — grams slice a corpus far
    * finer than lengths (per-gram df is corpus-vocabulary-bound, while
    * popular lengths hold a constant fraction of all names), and the early
    * length filter prunes the joined rows before the pair aggregation.
    *
    * The distinct() first is load-bearing: exact duplicates would otherwise
    * form O(count²) trivial lev-0 pairs per repeated value (the mega-cluster
    * failure mode); exact dedup already handles identity.
    */
  def editDistancePairs(df: DataFrame, name: Column, maxDist: Int, q: Int = 2): DataFrame = {
    require(maxDist >= 1, "maxDist must be positive")
    require(q >= 1, "q-gram width must be positive")
    val names = df.select(name.as("name")).distinct()
      .withColumn("len", length(col("name")))
      .withColumn("grams", array_distinct(
        when(col("len") >= q,
          expr(s"transform(sequence(1, len - ${q - 1}), i -> substring(name, i, $q))"))
          .otherwise(array())))
      .withColumn("nd", size(col("grams")))
    val dq = maxDist * q

    // Path 1: >=1 long side — inverted-index gram join + count filter.
    val g = names.select(col("name"), col("len"), col("nd"), explode(col("grams")).as("g"))
    val ga = g.select(col("name").as("name_a"), col("len").as("len_a"),
      col("nd").as("nd_a"), col("g"))
    val gb = g.select(col("name").as("name_b"), col("len").as("len_b"),
      col("nd").as("nd_b"), col("g"))
    val gramPairs = ga.join(gb, Seq("g"))
      .where(col("name_a") < col("name_b") &&
        abs(col("len_a") - col("len_b")) <= maxDist)
      .groupBy(col("name_a"), col("name_b"), col("nd_a"), col("nd_b"))
      .agg(count(lit(1)).as("shared"))
      .where(greatest(col("nd_a"), col("nd_b")) > dq &&
        col("shared") >= greatest(col("nd_a"), col("nd_b")) - dq)
      .select(col("name_a"), col("name_b"))

    // Path 2: short×short — plain length-band equi-join over the bounded
    // short-name pool (the gram bound is vacuous there).
    val short = names.where(col("nd") <= dq)
    val sa = short.select(col("name").as("name_a"),
      explode(sequence(col("len") - maxDist, col("len") + maxDist)).as("len_key"))
    val sb = short.select(col("name").as("name_b"), col("len").as("len_key"))
    val shortPairs = sa.join(sb, "len_key")
      .where(col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b"))

    gramPairs.unionByName(shortPairs)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .where(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist"))
  }

  /** 60-bit SimHash over token occurrences: majority vote per bit position of
    * each token's hash60 (+1 if bit set, -1 if not; bit set in the output iff
    * the vote sum is > 0).
    *
    * Single-pass formulation: instead of exploding every token ×60 bit
    * positions (60× row amplification through the shuffle), aggregate 60
    * set-bit counters + a token count per doc in ONE groupBy — the vote for
    * bit k is 2*ones_k - n, so `ones_k` (sum of extracted bits) carries the
    * whole computation. One row per doc crosses the shuffle; the 61 agg
    * buffers ride partial aggregation and whole-stage codegen.
    */
  def simhash(df: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = spreadBy(df, id)
      .select(id.as("doc_id"), explode(Text.tokens(text)).as("tok"))
      .select(col("doc_id"), Hashing.hash60(col("tok")).as("th"))
    val ones = (0 until 60).map(k =>
      sum(expr(s"(th div ${1L << k}) % 2")).as(s"ones_$k"))
    val aggs = count(lit(1)).as("n_tok") +: ones
    val bits = (0 until 60).map(k =>
      when(col(s"ones_$k") * 2 > col("n_tok"), lit(1L << k)).otherwise(lit(0L)))
    toks.groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), bits.reduce(_ + _).as("simhash"))
  }

  /** Pairs within a Hamming-distance budget over simhashes (all-pairs; at
    * scale you'd pre-bucket by simhash prefix — provided for the oracle and
    * small corpora).
    */
  def simhashPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    val a = hashes.select(col("doc_id").as("id_a"), col("simhash").as("sh_a"))
    val b = hashes.select(col("doc_id").as("id_b"), col("simhash").as("sh_b"))
    a.crossJoin(b)
      .where(col("id_a") < col("id_b"))
      .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)"))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Scalable simhash near-dup: multi-block pigeonhole bucketing + exact
    * Hamming verification inside buckets.
    *
    * The 60-bit fingerprint splits into `numBlocks` equal blocks; `d` bit
    * errors corrupt at most `d` blocks, so every pair within Hamming `d` has
    * at least `r = numBlocks - d` blocks intact and collides on the bucket
    * key formed from SOME r-combination of block positions. Candidate keys =
    * all C(numBlocks, r) combinations (combo id, concatenated block values).
    *
    * `numBlocks` sizes the bucket space to the corpus — the round-2 fixed
    * 4×15-bit scheme gave only 2^15 buckets per block position, which goes
    * quadratic per-bucket on a billion-doc corpus. With numBlocks = 6 and
    * d = 3 the key carries 3 intact 10-bit blocks → 2^30 buckets per combo
    * (20 combos), occupancy ~1 at 10^9 docs, at 20× key amplification over
    * rows that are just (id, fingerprint). The default 4 reproduces the
    * round-2 behavior (r = 1, keys = single 15-bit blocks).
    *
    * Single-pass: fingerprints computed once, combo keys exploded from one
    * posexplode, intra-bucket pairs emitted from the sorted per-bucket list
    * as in [[lshCandidatePairs]]. `maxBucket` is the same mega-bucket guard
    * (oversized buckets dropped whole).
    */
  /** Per-row 60-bit SimHash column — the stateless native twin of the
    * [[simhash]] aggregation (bit-identical per document; property-tested).
    * The form the streaming ingest path needs: fingerprint each arriving
    * row with no explode and no stateful aggregation.
    */
  def simhash60(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.SimHash60(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text.cast("string"))))

  /** All C(numBlocks, numBlocks−maxHamming) pigeonhole bucket keys for a
    * simhash column, as an array of struct(blk, blk_val) — the blocking
    * scheme of [[simhashNearDupBlocked]], exposed so other operators (the
    * streaming history anti-join) can bucket with the SAME keys. Any pair
    * within Hamming `maxHamming` shares at least one key.
    */
  def simhashComboKeys(sh: Column, maxHamming: Int, numBlocks: Int): Column = {
    require(numBlocks > maxHamming, "pigeonhole needs more blocks than the Hamming budget")
    require(60 % numBlocks == 0, s"numBlocks must divide 60, got $numBlocks")
    val bits = 60 / numBlocks
    val r = numBlocks - maxHamming
    val blockVal = (blk: Int) =>
      shiftright(sh, blk * bits).bitwiseAND(lit((1L << bits) - 1))
    val keyCols = (0 until numBlocks).combinations(r).toSeq.zipWithIndex.map {
      case (pos, cid) =>
        // concatenate the r block values into one <= 60-bit key (base 2^bits
        // positional fold: r*bits <= 60, ANSI-safe)
        val key = pos.map(blockVal).reduce((acc, v) => acc * lit(1L << bits) + v)
        struct(lit(cid).as("blk"), key.as("blk_val"))
    }
    array(keyCols: _*)
  }

  def simhashNearDupBlocked(
      hashes: DataFrame,
      maxHamming: Int,
      numBlocks: Int = 4,
      maxBucket: Option[Int] = None): DataFrame = {
    val grouped = hashes
      .select(col("doc_id"), col("simhash"),
        explode(simhashComboKeys(col("simhash"), maxHamming, numBlocks)).as("bk"))
      .select(col("doc_id"), col("simhash"),
        col("bk.blk").as("blk"), col("bk.blk_val").as("blk_val"))
      .groupBy(col("blk"), col("blk_val"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("simhash")))).as("xs"))
      .where(size(col("xs")) > 1)
    val capped = maxBucket match {
      case Some(cap) => grouped.where(size(col("xs")) <= cap)
      case None => grouped
    }
    capped
      .select(posexplode(col("xs")).as(Seq("i", "a")), col("xs"))
      .select(col("a"),
        explode(slice(col("xs"), col("i") + lit(2), size(col("xs")))).as("b"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Cross-shard shingle-overlap (leakage-audit) matrix: for every pair of
    * corpus shards (sources, dumps, snapshots), how much of shard A's
    * n-gram shingle vocabulary also appears in shard B — the audit a
    * curator runs BEFORE mixing sources, to catch mirrored sites, shared
    * boilerplate, and republished content at the SHARD level (the
    * complement of q87's document-level decontamination).
    *
    * Output per unordered pair (src_a < src_b, sharing ≥ 1 kept shingle):
    * (src_a, src_b, n_shared, sz_a, sz_b, containment_a, containment_b)
    * where containment_x = n_shared / sz_x over the KEPT shingle sets.
    *
    * Scale shape: the corpus reduces to DISTINCT (shard, shingle-hash60)
    * pairs — two longs per row, never shingle text (hash collision merges
    * two shingles with p ≈ shingles²·2⁻⁶¹, the q124 bound) — and that
    * compact frame is localCheckpoint'd: the df-cap, both size sides, and
    * the pair join all consume it without re-exploding the corpus. The
    * inverted-index pair join fans out as df² per shingle; `maxSrcDf`
    * drops shingles present in more than that many shards (corpus-wide
    * boilerplate carries no pair-specific signal and would otherwise cost
    * #shards² rows per shingle at 100 TB — the maxShingleDf trade, and the
    * cap also keeps containment denominators consistent: sizes are counted
    * over kept shingles only).
    */
  /** The compact (src, shingle-hash60) frame both shard-overlap audits run
    * on: DISTINCT per-source shingle hashes, optionally df-capped (shingles
    * present in more than `maxSrcDf` shards dropped whole), localCheckpoint'd
    * because every consumer (sizes, pair join, sketch aggregation) would
    * otherwise re-explode the corpus.
    */
  private def keptSourceShingles(
      df: DataFrame,
      id: Column,
      text: Column,
      group: Column,
      n: Int,
      maxSrcDf: Option[Int]): DataFrame = {
    val sh0 = spreadBy(df, id)
      .select(group.as("src"), explode(Text.shingles(text, n)).as("s"))
      .select(col("src"), Hashing.hash60(col("s")).as("h"))
      .distinct()
    (maxSrcDf match {
      case Some(cap) =>
        val keep = sh0.groupBy(col("h")).agg(count(lit(1)).as("df"))
          .where(col("df") <= cap).select(col("h"))
        sh0.join(keep, Seq("h"), "left_semi")
      case None => sh0
    }).localCheckpoint()
  }

  def sourceOverlapMatrix(
      df: DataFrame,
      id: Column,
      text: Column,
      group: Column,
      n: Int,
      maxSrcDf: Option[Int] = None): DataFrame = {
    val sh = keptSourceShingles(df, id, text, group, n, maxSrcDf)
    val sizes = sh.groupBy(col("src")).agg(count(lit(1)).as("sz"))
    sh.select(col("src").as("src_a"), col("h"))
      .join(sh.select(col("src").as("src_b"), col("h")), Seq("h"))
      .where(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(sizes.select(col("src").as("src_a"), col("sz").as("sz_a")), Seq("src_a"))
      .join(sizes.select(col("src").as("src_b"), col("sz").as("sz_b")), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_shared"), col("sz_a"), col("sz_b"),
        (col("n_shared").cast("double") / col("sz_a").cast("double")).as("containment_a"),
        (col("n_shared").cast("double") / col("sz_b").cast("double")).as("containment_b"))
  }

  /** SKETCHED shard-overlap audit: per-source THETA sketches of the kept
    * shingle sets ([[Hashing.thetaSketchAgg]]) plus every pairwise
    * |A ∩ B| estimate computed from the STORED sketches alone — the 100 TB
    * form of [[sourceOverlapMatrix]]'s exact pair join. The exact join
    * shuffles every kept (src, shingle) row into df²-fan-out pair buckets;
    * the sketch path aggregates each source once (map-side partial unions,
    * #tasks × #sources partial sketches across the exchange) and then
    * intersects #sources² sketch PAIRS of ≤ 2^lgK retained hashes each —
    * no shingle row ever crosses a second exchange, and a year of daily
    * shard sketches answers any new pair without rescanning the corpus
    * (the q125 durability argument, plus the set operations HLL cannot do).
    *
    * Output per source pair: (src_a, src_b, n_shared, sz_a, sz_b,
    * within_bound) — exact columns + an in-engine verdict that the sketch
    * intersection lands within `3·U/√(2^lgK) + relSlack·n_shared` of the
    * exact count, U = |A ∪ B| exact (the union-scaled ~3σ bound from the
    * theta-framework error analysis: intersection error scales with the
    * UNION size over √k, not the intersection size). The exact columns are
    * the verification harness, not the production read path (the
    * q26/q125 discipline — this is what lets a sketch query hash-match a
    * DuckDB oracle). The shard sketch table is localCheckpoint'd: both
    * join sides consume it, and without the break the corpus aggregation
    * would run twice.
    */
  def thetaSourceOverlap(
      df: DataFrame,
      id: Column,
      text: Column,
      group: Column,
      n: Int,
      lgK: Int = 12,
      maxSrcDf: Option[Int] = None,
      relSlack: Double = 0.05): DataFrame = {
    val sh = keptSourceShingles(df, id, text, group, n, maxSrcDf)
    val shard = sh.groupBy(col("src"))
      .agg(Hashing.thetaSketchAgg(col("h"), lgK).as("sk"),
        count(lit(1)).as("sz"))
      .localCheckpoint()
    val exactPairs = sh.select(col("src").as("src_a"), col("h"))
      .join(sh.select(col("src").as("src_b"), col("h")), Seq("h"))
      .where(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    val est = Hashing.thetaIntersectEstimate(col("sk_a"), col("sk_b"))
    val unionExact = col("sz_a") + col("sz_b") - col("n_shared")
    val bound = lit(3.0) * unionExact.cast("double") / lit(math.sqrt((1L << lgK).toDouble)) +
      lit(relSlack) * col("n_shared").cast("double")
    exactPairs
      .join(shard.select(col("src").as("src_a"), col("sk").as("sk_a"),
        col("sz").as("sz_a")), Seq("src_a"))
      .join(shard.select(col("src").as("src_b"), col("sk").as("sk_b"),
        col("sz").as("sz_b")), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_shared"), col("sz_a"), col("sz_b"),
        (abs(est - col("n_shared").cast("double")) <= bound).as("within_bound"))
  }

  /** Per-source NOVELTY audit from stored theta sketches: for every source,
    * how much of its shingle vocabulary appears NOWHERE else — |src \
    * ∪ others|, the set DIFFERENCE (AnotB) that completes the sketch
    * algebra ([[thetaSourceOverlap]] gives intersections). The audit an
    * incremental-crawl curator runs to decide whether a new dump adds
    * content or re-crawls the web it already has.
    *
    * Scale shape: the corpus aggregates ONCE into #sources sketch rows;
    * the union-of-others per source is a #sources² sketch-pair
    * re-aggregation over STORED bytes ([[Hashing.thetaUnionAgg]]) — no
    * corpus rescan, and a year of daily shard sketches folds the same way.
    * Exact verification counts df==1 shingles per source from the same
    * kept frame (the q26/q125 discipline); the verdict uses the
    * union-scaled ~3σ AnotB bound (difference error, like intersection,
    * scales with the union size over √k).
    *
    * Output: (src, sz, n_unique, within_bound) — sz/n_unique exact.
    */
  def thetaSourceNovelty(
      df: DataFrame,
      id: Column,
      text: Column,
      group: Column,
      n: Int,
      lgK: Int = 12,
      maxSrcDf: Option[Int] = None,
      relSlack: Double = 0.05): DataFrame = {
    val sh = keptSourceShingles(df, id, text, group, n, maxSrcDf)
    val shard = sh.groupBy(col("src"))
      .agg(Hashing.thetaSketchAgg(col("h"), lgK).as("sk"),
        count(lit(1)).as("sz"))
      .localCheckpoint()
    // exact uniques: shingles with corpus-wide df == 1, counted per source
    val uniq = sh.groupBy(col("h"))
      .agg(count(lit(1)).as("df"), min(col("src")).as("src"))
      .where(col("df") === 1)
      .groupBy(col("src")).agg(count(lit(1)).as("n_unique"))
    // union-of-others per source, LEFT-joined back onto the shard frame so
    // a single-source corpus still reports (missing sk_others == empty
    // sketch == nothing subtracted: novelty estimate = |src| estimate)
    val othersAgg = shard.select(col("src").as("src_a"))
      .join(shard.select(col("src").as("src_b"), col("sk").as("sk_b")),
        col("src_a") =!= col("src_b"))
      .groupBy(col("src_a"))
      .agg(Hashing.thetaUnionAgg(col("sk_b"), lgK).as("sk_others"))
    val others = shard
      .select(col("src").as("src_a"), col("sz").as("sz_a"), col("sk").as("sk_a"))
      .join(othersAgg, Seq("src_a"), "left_outer")
    val est = when(col("sk_others").isNull, Hashing.thetaEstimate(col("sk_a")))
      .otherwise(Hashing.thetaAnotBEstimate(col("sk_a"), col("sk_others")))
    val totalSz = sh.agg(count(lit(1)).as("total_rows"))
    val bound = lit(3.0) * col("total_rows").cast("double") /
      lit(math.sqrt((1L << lgK).toDouble)) +
      lit(relSlack) * col("n_unique").cast("double")
    others
      .join(uniq.withColumnRenamed("src", "src_a"), Seq("src_a"), "left_outer")
      .crossJoin(broadcast(totalSz))
      .select(col("src_a").as("src"), col("sz_a").as("sz"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"),
        (abs(est - coalesce(col("n_unique"), lit(0L)).cast("double")) <= bound)
          .as("within_bound"))
  }

  /** Content-defined chunking (the rolling-hash boundary idea behind
    * rsync/LBFS/FastCDC, here with the repo's content hash as the window
    * fingerprint): a cut lands BEFORE every position whose `w`-char window
    * hashes to 0 mod `mask`, so chunk boundaries are a pure function of
    * LOCAL content — insert a paragraph and only the chunks it touches
    * change, while a fixed-width grid would shift every later chunk (the
    * property that makes chunk-level dedup robust to edits; the q141
    * fixed-frame fingerprints are the contrast case).
    *
    * Per-doc work is a pure per-row HOF chain (positions → cut filter →
    * span assembly), one hash per position — no shuffle until the chunk
    * rows explode. Output: (doc_id, idx, st, chunk_len, chunk_md5), one row
    * per chunk; a doc shorter than `w`+1 chars is one whole-doc chunk.
    */
  def cdcChunks(df: DataFrame, id: Column, text: Column, w: Int = 8,
      mask: Int = 64): DataFrame = {
    require(w >= 2 && mask >= 2, "window and mask must be at least 2")
    val t = text.cast("string")
    val len = length(t)
    // cut positions: i in [2, len-w+1] with hash60(window at i) % mask == 0
    // (i = 1 is excluded so the first chunk is never empty)
    val cuts = when(len >= w + 1,
      filter(sequence(lit(2), len - (w - 1)), i =>
        pmod(Hashing.hash60(t.substr(i, lit(w))), lit(mask.toLong)) === 0L))
      .otherwise(array().cast("array<int>"))
    val base = df.select(id.as("doc_id"), t.as("text"), cuts.as("cuts"))
    val starts = concat(array(lit(1)), col("cuts"))
    val ends = concat(transform(col("cuts"), c => c - 1),
      array(length(col("text"))))
    base
      .select(col("doc_id"), col("text"),
        posexplode(zip_with(starts, ends, (s, e) => struct(s.as("st"), e.as("en")))))
      .select(col("doc_id"), (col("pos") + 1).as("idx"),
        col("col.st").as("st"),
        (col("col.en") - col("col.st") + 1).cast("long").as("chunk_len"),
        md5(col("text").substr(col("col.st"),
          col("col.en") - col("col.st") + 1)).as("chunk_md5"))
  }

  /** Cross-document duplicate-chunk report over [[cdcChunks]]: the storage
    * dedup ledger — for every chunk content seen more than once, its
    * occurrence count, distinct-document spread, length, and the bytes a
    * content-addressed store would save. One (chunk_md5)-keyed aggregation
    * (32-hex keys + two longs through the shuffle, never chunk text); top-k
    * is TakeOrderedAndProject. md5 collisions merge ledger lines at
    * ~2^-64/pair — the q124 stance.
    */
  def cdcDupReport(chunks: DataFrame, topK: Int = 100): DataFrame =
    chunks.groupBy(col("chunk_md5"))
      .agg(count(lit(1)).as("n_occ"),
        count_distinct(col("doc_id")).as("n_docs"),
        min(col("chunk_len")).as("chunk_len"))
      .where(col("n_occ") >= 2)
      .withColumn("bytes_saved", (col("n_occ") - 1) * col("chunk_len"))
      .orderBy(col("n_occ").desc, col("chunk_md5").asc)
      .limit(topK)
}
