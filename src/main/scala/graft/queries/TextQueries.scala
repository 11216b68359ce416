package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Hashing, Num, Text}
import org.apache.spark.sql.functions._

/** Text-analysis extension queries over `documents` (language-ID heuristic,
  * quality scoring, token counting, fingerprinting) — SURVEY.md §7.2 step 8.
  */
object TextQueries {

  /** The fixed retrieval query shared by q91 (BM25) and q92 (hybrid RRF). */
  private val HybridTerms = Seq("join", "scan", "merge")

  /** DuckDB CTE chain ending in `bmranked(doc_id, score, rank)`: the exact
    * twin of `Text.bm25TopK`'s arithmetic (Lucene idf, k1=1.2, b=0.75,
    * per-term pivot columns added in term order; every fraction literal CAST
    * to DOUBLE so DuckDB's decimal literals can't shift the arithmetic).
    * Also defines `toks` (doc_id, tok), reused by q92's embedding CTEs.
    */
  private def duckBm25Ctes(terms: Seq[String]): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    val cs = terms.zipWithIndex.map { case (t, i) =>
      s"SUM(CASE WHEN tok = '$t' THEN contrib ELSE CAST(0.0 AS DOUBLE) END) AS c$i"
    }.mkString(", ")
    val scoreExpr = terms.indices.map(i => s"c$i").reduce((a, x) => s"($a + $x)")
    s"""toks AS (
       |  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok FROM documents),
       |dl AS (
       |  SELECT doc_id, CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS dl
       |  FROM documents),
       |stats AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS total_dl FROM dl),
       |tf AS (
       |  SELECT doc_id, tok, COUNT(*) AS tf FROM toks
       |  WHERE tok IN ($inList) GROUP BY 1, 2),
       |dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
       |contrib AS (
       |  SELECT tf.doc_id, tf.tok,
       |    ln(CAST(1.0 AS DOUBLE)
       |        + (CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))
       |          / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
       |      * (CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
       |      / (CAST(tf AS DOUBLE)
       |        + CAST(1.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
       |          + CAST(0.75 AS DOUBLE) * CAST(dl AS DOUBLE)
       |            / (CAST(total_dl AS DOUBLE) / CAST(n AS DOUBLE)))) AS contrib
       |  FROM tf JOIN dfreq USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats),
       |perdoc AS (
       |  SELECT doc_id, $cs
       |  FROM contrib GROUP BY 1),
       |bmranked AS (
       |  SELECT doc_id, $scoreExpr AS score,
       |    row_number() OVER (ORDER BY $scoreExpr DESC, doc_id ASC) AS rank
       |  FROM perdoc)""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // Marker-token language-ID heuristic (deterministic argmax).
    QueryDef(
      "q40_lang_id",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        docs.select(col("doc_id"), Text.langId(col("text")).as("lang_pred"))
      },
      Some(s"""SELECT doc_id, ${Text.duckLangId("text")} AS lang_pred FROM documents""")),

    // Quality features + composite score (integer-derived ratios: exact).
    QueryDef(
      "q41_quality_score",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val feats = Text.qualityFeatures(col("text"))
        docs.select(
          col("doc_id") +:
            feats.map { case (n, c) => c.as(n) } :+
            Text.qualityScore(col("text")).as("quality"): _*)
      },
      Some {
        val t = "string_split_regex(text, '\\s+')"
        val tl = "string_split_regex(lower(text), '\\s+')"
        val stop = Text.Stopwords.map(w => s"'$w'").mkString(", ")
        val nTok = s"CAST(len($t) AS BIGINT)"
        val nChars = "CAST(length(text) AS BIGINT)"
        val alpha = "CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT)"
        val stopHits = s"CAST(len(list_filter($tl, tok -> tok IN ($stop))) AS BIGINT)"
        val meanWl = s"(CAST($nChars AS DOUBLE) / CAST($nTok AS DOUBLE))"
        val stopRatio = s"(CAST($stopHits AS DOUBLE) / CAST($nTok AS DOUBLE))"
        val alphaRatio = s"(CAST($alpha AS DOUBLE) / CAST($nChars AS DOUBLE))"
        s"""SELECT doc_id,
           |  $nTok AS n_tokens,
           |  $nChars AS n_chars,
           |  $alphaRatio AS alpha_ratio,
           |  $meanWl AS mean_word_len,
           |  $stopRatio AS stopword_ratio,
           |  (CASE WHEN $nTok >= 20 AND $nTok <= 10000 THEN 1.0 ELSE 0.0 END) * 0.25
           |    + (CASE WHEN $meanWl >= 3.0 AND $meanWl <= 12.0 THEN 1.0 ELSE 0.0 END) * 0.25
           |    + (CASE WHEN $stopRatio >= 0.05 THEN 1.0 ELSE 0.0 END) * 0.25
           |    + $alphaRatio * 0.25 AS quality
           |FROM documents""".stripMargin
      }),

    // Token counting: whitespace tokens + BPE-ish regex pre-tokenization.
    QueryDef(
      "q42_token_count",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        docs.select(
          col("doc_id"),
          Text.wordCount(col("text")).as("ws_tokens"),
          Text.bpeishTokenCount(col("text")).as("bpeish_tokens"))
      },
      Some(s"""SELECT doc_id,
           |  len(string_split_regex(text, '\\s+')) AS ws_tokens,
           |  ${Text.duckBpeishTokenCount("text")} AS bpeish_tokens
           |FROM documents""".stripMargin)),

    // Rolling polynomial fingerprint over token hashes.
    QueryDef(
      "q43_fingerprint",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        docs.select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
      },
      Some(s"""SELECT doc_id, ${Text.duckFingerprint("text")} AS fp FROM documents""")),

    // Corpus-level n-gram statistics: top-50 bigram shingles by document
    // frequency with a deterministic tie-break — the vocabulary/contamination
    // profiling pass of a training-data pipeline. Distributed top-k: partial
    // counts shuffle once, TakeOrderedAndProject caps the result.
    QueryDef(
      "q45_top_ngrams",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        graft.ops.Dedup.shingleRows(docs, col("doc_id"), col("text"), 2)
          .groupBy(col("sh"))
          .agg(count(lit(1)).as("df"))
          .orderBy(col("df").desc, col("sh").asc)
          .limit(50)
      },
      Some(s"""SELECT sh, COUNT(*) AS df
           |FROM (SELECT doc_id, unnest(${Text.duckShingles("text", 2)}) AS sh FROM documents)
           |GROUP BY sh ORDER BY df DESC, sh ASC LIMIT 50""".stripMargin)),

    // EXACT heavy-hitter tokens via the native Misra-Gries sketch aggregate
    // (candidate pass) + exact verification of the candidates only — the
    // scale path that never shuffles the full vocabulary. minFrac=0.02 >
    // 1/(64+1), so recall is guaranteed and the output equals the oracle's
    // plain GROUP BY ... HAVING.
    QueryDef(
      "q49_heavy_hitter_tokens",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Text.heavyHitterTokens(docs, col("doc_id"), col("text"),
          capacity = 64, minFrac = 0.02)
      },
      Some("""WITH toks AS (
           |  SELECT unnest(string_split_regex(text, '\s+')) AS tok FROM documents),
           |tot AS (SELECT COUNT(*) AS total FROM toks)
           |SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok
           |HAVING COUNT(*) >= (SELECT ceil(total * 0.02) FROM tot)""".stripMargin)),

    // Signed feature-hashing embedding (32-dim): the vectorizer bridging
    // documents into the similarity stack — no vocabulary table, memory
    // O(dims). Output exploded to flat rows for the oracle compare.
    QueryDef(
      "q57_hashing_embedding",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Text.hashingTrickEmbedding(docs, col("doc_id"), col("text"), dims = 32)
          .select(col("doc_id"), posexplode(col("vec")).as(Seq("dim", "val")))
      },
      Some(s"""WITH toks AS (
           |  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok FROM documents),
           |contrib AS (
           |  SELECT doc_id, (h // 2) % 32 AS bucket,
           |    CASE WHEN h % 2 = 1 THEN 1 ELSE -1 END AS s
           |  FROM (SELECT doc_id, ${Hashing.duckHash60("tok")} AS h FROM toks)),
           |w AS (SELECT doc_id, bucket, SUM(s) AS w FROM contrib GROUP BY 1, 2)
           |SELECT d.doc_id, g.dim, CAST(COALESCE(w.w, 0) AS DOUBLE) AS val
           |FROM (SELECT DISTINCT doc_id FROM documents) d
           |CROSS JOIN (SELECT unnest(range(0, 32)) AS dim) g
           |LEFT JOIN w ON w.doc_id = d.doc_id AND w.bucket = g.dim""".stripMargin)),

    // Top-3 characteristic terms per document by TF-IDF (ties -> token asc).
    // The only corpus-wide statistic is the (token, df) table; the per-doc
    // rank compiles to WindowGroupLimit.
    QueryDef(
      "q59_tfidf_top_terms",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Text.tfidfTopTerms(docs, col("doc_id"), col("text"), k = 3)
      },
      Some("""WITH toks AS (
           |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok FROM documents),
           |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
           |dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
           |n AS (SELECT COUNT(*) AS n FROM documents)
           |SELECT doc_id, tok, tf, df, tfidf, rank FROM (
           |  SELECT tf.doc_id, tf.tok, tf.tf, dfreq.df,
           |    CAST(tf.tf AS DOUBLE) * ln(CAST(n.n AS DOUBLE) / CAST(dfreq.df AS DOUBLE)) AS tfidf,
           |    row_number() OVER (PARTITION BY tf.doc_id
           |      ORDER BY CAST(tf.tf AS DOUBLE) * ln(CAST(n.n AS DOUBLE) / CAST(dfreq.df AS DOUBLE)) DESC,
           |               tf.tok ASC) AS rank
           |  FROM tf JOIN dfreq USING (tok) CROSS JOIN n)
           |WHERE rank <= 3""".stripMargin)),

    // BM25 lexical top-20 for a fixed 3-term query — the lexical half of
    // hybrid retrieval beside the ANN operators. Per-term contributions are
    // pivoted to fixed columns and added in term order, so the double
    // arithmetic is reduction-order-free and the oracle reproduces it bit
    // for bit (ln from integer-derived ratios, same expression shape).
    QueryDef(
      "q91_bm25_topk",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Text.bm25TopK(docs, col("doc_id"), col("text"), HybridTerms, k = 20)
      },
      Some(s"""WITH ${duckBm25Ctes(HybridTerms)}
           |SELECT doc_id, score, rank FROM bmranked WHERE rank <= 20""".stripMargin)),

    // Hybrid retrieval: Reciprocal Rank Fusion of the BM25 top-100 and the
    // hashing-embedding cosine top-100 (query embedded by the document
    // vectorizer itself). Ranks are integers, so the fused score is
    // bit-reproducible; docs absent from one list contribute 0 from it.
    QueryDef(
      "q92_hybrid_rrf",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Text.hybridRrfTopK(docs, col("doc_id"), col("text"), HybridTerms,
          dims = 32, k = 20, perList = 100)
      },
      Some {
        val qvals = HybridTerms.map(t => s"('$t')").mkString(", ")
        s"""WITH ${duckBm25Ctes(HybridTerms)},
           |lex AS (SELECT doc_id, rank AS lex_rank FROM bmranked WHERE rank <= 100),
           |hcontrib AS (
           |  SELECT doc_id, (h // 2) % 32 AS bucket,
           |    CASE WHEN h % 2 = 1 THEN 1 ELSE -1 END AS s
           |  FROM (SELECT doc_id, ${Hashing.duckHash60("tok")} AS h FROM toks)),
           |hw AS (SELECT doc_id, bucket, SUM(s) AS w FROM hcontrib GROUP BY 1, 2),
           |dvec AS (
           |  SELECT d.doc_id, list(CAST(COALESCE(hw.w, 0) AS DOUBLE) ORDER BY g.dim) AS v
           |  FROM (SELECT DISTINCT doc_id FROM documents) d
           |  CROSS JOIN (SELECT unnest(range(0, 32)) AS dim) g
           |  LEFT JOIN hw ON hw.doc_id = d.doc_id AND hw.bucket = g.dim
           |  GROUP BY d.doc_id),
           |qcontrib AS (
           |  SELECT (h // 2) % 32 AS bucket, CASE WHEN h % 2 = 1 THEN 1 ELSE -1 END AS s
           |  FROM (SELECT ${Hashing.duckHash60("tok")} AS h FROM (VALUES $qvals) q(tok))),
           |qw AS (SELECT bucket, SUM(s) AS w FROM qcontrib GROUP BY 1),
           |qvec AS (
           |  SELECT list(CAST(COALESCE(qw.w, 0) AS DOUBLE) ORDER BY g.dim) AS qv
           |  FROM (SELECT unnest(range(0, 32)) AS dim) g
           |  LEFT JOIN qw ON qw.bucket = g.dim),
           |vecranked AS (
           |  SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS vec_rank
           |  FROM (
           |    SELECT doc_id, ${Num.duckDot("v", "qv")} / (${Num.duckNorm("v")} * ${Num.duckNorm("qv")}) AS cos
           |    FROM dvec CROSS JOIN qvec
           |    WHERE ${Num.duckNorm("v")} > 0 AND ${Num.duckNorm("qv")} > 0)),
           |vec AS (SELECT doc_id, vec_rank FROM vecranked WHERE vec_rank <= 100)
           |SELECT doc_id, lex_rank, vec_rank, rrf, rank FROM (
           |  SELECT doc_id, lex_rank, vec_rank,
           |    COALESCE(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + CAST(lex_rank AS DOUBLE)), CAST(0.0 AS DOUBLE))
           |      + COALESCE(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + CAST(vec_rank AS DOUBLE)), CAST(0.0 AS DOUBLE)) AS rrf,
           |    row_number() OVER (
           |      ORDER BY COALESCE(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + CAST(lex_rank AS DOUBLE)), CAST(0.0 AS DOUBLE))
           |        + COALESCE(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + CAST(vec_rank AS DOUBLE)), CAST(0.0 AS DOUBLE)) DESC,
           |      doc_id ASC) AS rank
           |  FROM lex FULL OUTER JOIN vec USING (doc_id))
           |WHERE rank <= 20""".stripMargin
      }),

    // Array-function surface over the token array: distinct/sort/slice/
    // contains/position composed to scalar outputs (scalars keep the oracle
    // compare engine-agnostic; the arrays themselves are exercised upstream
    // by the shingle/fingerprint paths).
    QueryDef(
      "q79_array_funcs",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val t = Text.tokens(col("text"))
        val dt = array_distinct(t)
        docs.select(
          col("doc_id"),
          size(dt).as("n_distinct"),
          array_contains(t, "the").as("has_the"),
          array_position(t, "the").cast("long").as("first_the"),
          concat_ws("|", slice(sort_array(dt), 1, 3)).as("first3_sorted"),
          element_at(t, 1).as("first_tok"),
          element_at(t, -1).as("last_tok"))
      },
      Some("""SELECT doc_id,
           |  len(list_distinct(toks)) AS n_distinct,
           |  list_contains(toks, 'the') AS has_the,
           |  CAST(COALESCE(list_position(toks, 'the'), 0) AS BIGINT) AS first_the,
           |  array_to_string(list_slice(list_sort(list_distinct(toks)), 1, 3), '|') AS first3_sorted,
           |  toks[1] AS first_tok,
           |  toks[-1] AS last_tok
           |FROM (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents)""".stripMargin)),

    // Higher-order lambda functions (transform/filter/exists/forall/
    // aggregate) composed to scalars — the §2.7 HOF surface exercised
    // directly (the hot paths use native expressions instead; this query
    // pins the built-in lambda semantics against DuckDB's list lambdas).
    QueryDef(
      "q82_higher_order_funcs",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val t = Text.tokens(col("text"))
        docs.select(
          col("doc_id"),
          size(filter(t, x => length(x) > 4)).as("n_long"),
          aggregate(transform(t, x => length(x).cast("long")),
            lit(0L), (acc, v) => acc + v).as("total_chars"),
          exists(t, x => x === lit("the")).as("has_the"),
          forall(t, x => length(x) < 20).as("all_short"))
      },
      Some("""SELECT doc_id,
           |  len(list_filter(toks, x -> length(x) > 4)) AS n_long,
           |  list_reduce(list_prepend(CAST(0 AS BIGINT),
           |    list_transform(toks, x -> CAST(length(x) AS BIGINT))), (a, v) -> a + v) AS total_chars,
           |  len(list_filter(toks, x -> x = 'the')) > 0 AS has_the,
           |  len(list_filter(toks, x -> length(x) >= 20)) = 0 AS all_short
           |FROM (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents)""".stripMargin)),

    // Marker-hit aggregation: docs per predicted language (argmax rollup).
    QueryDef(
      "q44_lang_distribution",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        docs.select(Text.langId(col("text")).as("lang_pred"))
          .groupBy(col("lang_pred"))
          .agg(count(lit(1)).as("n_docs"))
      },
      Some(s"""SELECT ${Text.duckLangId("text")} AS lang_pred, COUNT(*) AS n_docs
           |FROM documents GROUP BY 1""".stripMargin))
  )
}
