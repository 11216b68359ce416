package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** A persisted KLL quantile sketch table — the distributional member of the
  * durable sketch-table family (HLL q125 = distinct counts, theta q136 =
  * set ops, CMS q49 = point frequencies, moment shards q144 = exact
  * moments, sliding HLL q150 = time rollups): per key, one Datasketches
  * KLL sketch of the value distribution stored as BYTES, so any later
  * quantile read — one key, a key subset, the whole corpus — is a union
  * over stored sketches, never a rescan or a sort. The equi-width
  * [[HistIndex]] (q260) answers the same question at bin-width resolution
  * over a domain FROZEN at build time; KLL needs no frozen domain and its
  * resolution is a RANK guarantee (±ε of the requested rank, ε ≈ 1.33% at
  * 1σ for k=256) — drift can never push mass silently into edge bins.
  *
  * Maintenance contract: `getN` is additive and merge preserves the rank
  * error of the target k, so appending a delta shard and unioning equals a
  * from-scratch rebuild UP TO the rank-error contract (not bit-for-bit:
  * KLL compaction is randomized — see KllSketchExpression's determinism
  * caveat). The catalog therefore hash-checks the q26/q125 ESTIMATE
  * SURFACE: exact quantiles + within_bound/n_match verdicts, which the
  * DuckDB oracle reproduces as exact + TRUE (q386 build+serve, q387 the
  * append-maintained table through the identical surface).
  *
  * Scale: sketches are a few KB each and combine map-side — #tasks × #keys
  * partials cross the exchange, never value rows. The report's EXACT
  * verification columns group by (scope, value) first, so their windows
  * run over value-ALPHABET-bounded frames (doc lengths, token counts —
  * integer-valued at any corpus scale), not corpus rows; for real-valued
  * columns at 100 TB the verification path is a test-scale audit and the
  * sketch path is the product.
  */
object QuantileIndex {

  /** KLL sketch aggregate over a double column → sketch bytes. */
  def kllSketch(c: Column, k: Int): Column =
    ColumnBridge.column(graft.plans.KllDoublesAgg(
      ColumnBridge.expression(c.cast("double")), k).toAggregateExpression())

  /** Union of stored sketch bytes → merged sketch bytes. */
  def kllUnion(c: Column, k: Int): Column =
    ColumnBridge.column(graft.plans.KllUnionAgg(
      ColumnBridge.expression(c), k).toAggregateExpression())

  /** Quantile estimate at rank `q` from stored sketch bytes. */
  def kllQuantile(sk: Column, q: Column): Column =
    ColumnBridge.column(graft.plans.KllQuantile(
      ColumnBridge.expression(sk), ColumnBridge.expression(q.cast("double"))))

  /** Exact absorbed-value count of stored sketch bytes (deterministic). */
  def kllN(sk: Column): Column =
    ColumnBridge.column(graft.plans.KllN(ColumnBridge.expression(sk)))

  /** Sketch `value` per `key` group: (key, sk, n_rows). NULL values carry
    * no rank and are excluded from BOTH the sketch and n_rows, so
    * n_rows == getN(sk) by construction. Materialized so writes/merges
    * never replay the scan.
    */
  def build(df: DataFrame, key: Column, value: Column, k: Int): DataFrame =
    df.select(key.as("key"), value.cast("double").as("x"))
      .where(col("x").isNotNull)
      .groupBy(col("key"))
      .agg(kllSketch(col("x"), k).as("sk"), count(lit(1)).as("n_rows"))
      .localCheckpoint()

  /** Merge sketch tables (any number of shards, any order): same-key
    * sketches union from stored bytes; n_rows adds. One keyed aggregation
    * over #shards × #keys rows of KB-sized state.
    */
  def merge(shards: Seq[DataFrame], k: Int): DataFrame = {
    require(shards.nonEmpty, "merge needs at least one sketch shard")
    shards.reduce(_ unionByName _)
      .groupBy(col("key"))
      .agg(kllUnion(col("sk"), k).as("sk"), sum(col("n_rows")).as("n_rows"))
  }

  /** Persist the sketch table (#keys rows of KB-sized binary state). */
  def write(sk: DataFrame, path: String): Unit =
    sk.write.mode("overwrite").parquet(path)

  /** Load a stored sketch table (scan-only lineage). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** The hash-checkable ESTIMATE SURFACE (q26/q125 discipline): per key
    * scope plus the `__union__` rollup folded from stored bytes, for each
    * requested rank q — (scope, q, n, exact_q, n_match, within_bound)
    * where exact_q is the exact INCLUSIVE nearest-rank quantile computed
    * relationally from `raw` (deterministic, oracle-reproducible),
    * n_match pins getN(sketch) == the exact row count, and within_bound
    * pins the sketch estimate between the exact values at ranks
    * (q−eps)·n and (q+eps)·n — eps = 0.05 against k=256's ε ≈ 1.33% (1σ)
    * leaves > 3σ margin, so the verdict is TRUE up to astronomically
    * unlikely sketch failure, while the estimate itself (randomized)
    * stays out of the hashed columns.
    */
  def report(table: DataFrame, raw: DataFrame, key: Column, value: Column,
      qs: Seq[Double], eps: Double, k: Int): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q < 1.0),
      s"ranks must lie strictly inside (0, 1), got $qs")
    val t = table.localCheckpoint()
    val per = t.select(col("key").cast("string").as("scope"), col("sk"),
      col("n_rows"))
    val union = t
      .agg(kllUnion(col("sk"), k).as("sk"), sum(col("n_rows")).as("n_rows"))
      .select(lit("__union__").as("scope"), col("sk"), col("n_rows"))
    val scoped = per.unionByName(union)
    val qdf = broadcast(
      t.sparkSession.createDataFrame(qs.map(Tuple1.apply)).toDF("q"))
    val est = scoped.crossJoin(qdf)
      .select(col("scope"), col("q"),
        kllQuantile(col("sk"), col("q")).as("est"),
        kllN(col("sk")).as("n_sk"))

    // exact side: group to (scope, value) FIRST so every window below runs
    // on the value-alphabet frame, then cumulative-pick the three ranks
    val v0 = raw.select(key.cast("string").as("scope"),
        value.cast("double").as("x"))
      .where(col("x").isNotNull)
    val v = v0.unionByName(v0.select(lit("__union__").as("scope"), col("x")))
    val counts = v.groupBy(col("scope"), col("x")).agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("scope")).orderBy(col("x").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wN = Window.partitionBy(col("scope"))
    val cum = counts
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wN))
    val nD = col("n").cast("double")
    val exact = cum.crossJoin(qdf)
      .groupBy(col("scope"), col("q"), col("n"))
      .agg(
        min(when(col("cum") >= ceil(col("q") * nD), col("x"))).as("exact_q"),
        min(when(col("cum") >=
          greatest(lit(1L), ceil((col("q") - lit(eps)) * nD)), col("x")))
          .as("lo"),
        min(when(col("cum") >=
          least(col("n"), ceil((col("q") + lit(eps)) * nD)), col("x")))
          .as("hi"))

    // FULL outer: a stale/extra table key absent from `raw` (or a dropped
    // shard leaving `raw` scopes the table never saw) must surface as a
    // FALSE-verdict row, not silently vanish from the verification surface
    // — that's the whole "a fan-out or dropped shard flips the hash" claim.
    est.join(exact, Seq("scope", "q"), "full_outer")
      .select(col("scope"), col("q"), col("n"), col("exact_q"),
        coalesce(col("n_sk") === col("n"), lit(false)).as("n_match"),
        coalesce(col("est") >= col("lo") && col("est") <= col("hi"),
          lit(false)).as("within_bound"))
  }

  /** DuckDB twin of [[report]]: replays the exact INCLUSIVE nearest-rank
    * quantiles (same (scope, value) grouping, same ceil arithmetic on the
    * same doubles) and emits the verdicts as literal TRUE — the oracle
    * face of the sketch discipline.
    */
  def duckReport(tbl: String, keyExpr: String, valueExpr: String,
      qs: Seq[Double]): String = {
    val values = qs.map(q => s"($q)").mkString(", ")
    s"""WITH v0 AS (
       |  SELECT CAST($keyExpr AS VARCHAR) AS scope,
       |    CAST($valueExpr AS DOUBLE) AS x
       |  FROM $tbl WHERE CAST($valueExpr AS DOUBLE) IS NOT NULL),
       |v AS (
       |  SELECT scope, x FROM v0
       |  UNION ALL SELECT '__union__', x FROM v0),
       |c AS (SELECT scope, x, COUNT(*) AS cnt FROM v GROUP BY 1, 2),
       |w AS (
       |  SELECT scope, x,
       |    CAST(SUM(cnt) OVER (PARTITION BY scope ORDER BY x ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum,
       |    CAST(SUM(cnt) OVER (PARTITION BY scope) AS BIGINT) AS n
       |  FROM c),
       |qs AS (SELECT CAST(q AS DOUBLE) AS q FROM (VALUES $values) t(q))
       |SELECT scope, q, n,
       |  MIN(CASE WHEN cum >= CAST(CEIL(q * CAST(n AS DOUBLE)) AS BIGINT)
       |    THEN x END) AS exact_q,
       |  TRUE AS n_match, TRUE AS within_bound
       |FROM w CROSS JOIN qs GROUP BY 1, 2, 3""".stripMargin
  }
}
