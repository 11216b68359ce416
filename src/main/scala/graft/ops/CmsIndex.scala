package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A persisted Count-Min sketch table — the durable twin of
  * [[Text.countMinSketch]] (the q144/q198 mergeable-statistic discipline
  * applied to frequency sketches): sketch each key group ONCE, store the
  * depth×width counter arrays as parquet rows, and answer every later
  * point-frequency probe from the stored counters.
  *
  * CMS counters are LINEAR — each cell is a sum of per-row indicators — so
  * the table maintains additively: sketching a new-rows delta and merging
  * (elementwise array sum per key) equals a from-scratch rebuild of the
  * union EXACTLY, with no ordering contract at all (q216 hash-proves the
  * merged table through the estimate surface against the full relational
  * replay). This is the strongest maintenance class in the repo's
  * hierarchy: exact like q198's additive counts, but over a FIXED-size
  * state (depth×width longs per key) independent of item cardinality.
  */
object CmsIndex {

  /** Sketch `item` per `key` group: (key, sk) with sk = depth×width long
    * counters. Materialized so writes/merges never replay the scan.
    */
  def build(df: DataFrame, key: Column, item: Column, depth: Int,
      width: Int): DataFrame =
    df.groupBy(key.as("key"))
      .agg(Text.countMinSketch(item, depth, width).as("sk"))
      .localCheckpoint()

  /** Merge two sketch tables (base ∪ delta): same-key counter arrays sum
    * elementwise; keys present on one side pass through. Linearity makes
    * this exact — merge == rebuild on the unioned rows.
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("key"), col("sk").as("sk_a"))
      .join(b.select(col("key"), col("sk").as("sk_b")), Seq("key"), "full_outer")
      .select(col("key"),
        when(col("sk_a").isNull, col("sk_b"))
          .when(col("sk_b").isNull, col("sk_a"))
          .otherwise(zip_with(col("sk_a"), col("sk_b"), (x, y) => x + y))
          .as("sk"))

  /** Retract rows: sketch the removed rows alone and SUBTRACT counters
    * elementwise — CMS linearity works in both directions (unlike the
    * HLL/theta register max-folds, which cannot unabsorb), so the
    * decremented table equals a never-absorbed-them rebuild counter for
    * counter (CmsIndexSpec pins it). Keys whose counters all reach zero
    * drop. The q277/q278/q282 right-to-be-forgotten family's sketch
    * member.
    */
  def retract(full: DataFrame, removed: DataFrame): DataFrame =
    full.select(col("key"), col("sk").as("sk_a"))
      .join(removed.select(col("key"), col("sk").as("sk_b")), Seq("key"), "left_outer")
      .select(col("key"),
        when(col("sk_b").isNull, col("sk_a"))
          .otherwise(zip_with(col("sk_a"), col("sk_b"), (x, y) => x - y))
          .as("sk"))
      .where(exists(col("sk"), x => x > 0L))

  /** Persist the sketch table. No partitioning: rows are one fixed
    * depth×width array per key — the table is #keys rows regardless of
    * corpus size (that is the point of the sketch).
    */
  def write(sk: DataFrame, path: String): Unit =
    sk.write.mode("overwrite").parquet(path)

  /** Load a stored sketch table (scan-only lineage). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Point estimates for `probes` against every stored key group: the
    * q103 estimate surface ((key, probe, est)) from stored counters alone —
    * no rescan of the sketched rows. Probes broadcast; per (key, probe)
    * the estimate is `depth` array lookups.
    */
  def estimates(sk: DataFrame, probes: Seq[String], depth: Int,
      width: Int): DataFrame = {
    val p = sk.sparkSession.createDataFrame(
      probes.map(Tuple1.apply)).toDF("probe")
    sk.crossJoin(broadcast(p))
      .select(col("key"), col("probe"),
        Text.cmsEstimate(col("sk"), col("probe"), depth, width).as("est"))
  }
}
