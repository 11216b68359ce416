package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout helpers: bucketed tables for shuffle-free co-located
  * joins — the third leg of the join-strategy triad beside broadcast (small
  * dims) and repartition (one-shot co-location).
  *
  * At 100 TB, a fact-to-fact equi-join on a shared key shuffles both sides
  * every run; writing both sides bucketed (+ sorted) by the key ONCE makes
  * every later join on that key exchange-free — Catalyst matches the bucket
  * spec on both sides and plans a sort-merge join directly on the bucket
  * files (`PlanSpec` proves the plan has zero Exchange nodes). The write
  * itself costs one shuffle — amortized across every subsequent join,
  * aggregation, or dedup keyed on the same column.
  */
object Layout {

  /** Write `df` as a bucketed, bucket-sorted EXTERNAL table (data at `path`,
    * registered as `table` in the session catalog — bucketing metadata lives
    * in the catalog, which is why this is `saveAsTable`, not plain parquet).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      bucketCol: String,
      numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Co-located equi-join of two tables bucketed on the same key with the
    * same bucket count: no exchange on either side.
    */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Hive-style partitioned layout: one directory per value of `partCol`
    * (`path/partCol=value/...`). A filter on the partition column then never
    * opens a non-matching file — the scan's PartitionFilters prune whole
    * directories at PLANNING time, the coarse-grained pruning that makes
    * lang/date/source filters free at 100 TB (PlanSpec proves the pruned
    * scan). Choose partition columns with bounded cardinality (lang, date,
    * source) — one directory per value; high-cardinality keys belong in
    * [[writeBucketed]] buckets instead.
    */
  def writePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).parquet(path)

  /** Range-partition + sort within partitions on `sortCol`: globally ordered
    * output (file k's values all precede file k+1's) without a single-task
    * global sort — the layout that makes downstream range scans, time-ordered
    * reads, and min/max file pruning effective. The exchange samples the key
    * distribution (RangePartitioning), so output files are balanced even on
    * skewed keys.
    */
  def rangeSorted(df: DataFrame, sortCol: String, partitions: Int): DataFrame =
    df.repartitionByRange(partitions, org.apache.spark.sql.functions.col(sortCol))
      .sortWithinPartitions(sortCol)

  /** Write `df` range-sorted on `sortCol` (see [[rangeSorted]]). */
  def writeRangeSorted(df: DataFrame, path: String, sortCol: String, partitions: Int): Unit =
    rangeSorted(df, sortCol, partitions).write.mode("overwrite").parquet(path)
}
