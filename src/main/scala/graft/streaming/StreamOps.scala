package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming-specific stateful operators and observability — the pieces of
  * the streaming surface beyond the windowed aggregation itself.
  */
object StreamOps {

  /** Streaming exact dedup with bounded state (W5): drops rows whose key was
    * already seen within the watermark horizon — the streaming twin of
    * `Dedup.exactByKey` for ingest pipelines (e.g. re-delivered Kinesis
    * records after a producer retry). State for a key is evicted once the
    * watermark passes its event time + delay, so state size tracks the
    * watermark window, not the stream's lifetime.
    *
    * On a batch frame this falls back to plain dropDuplicates on the same
    * columns (the batch twin: no event-time horizon).
    */
  def dedupWithinWatermark(
      df: DataFrame,
      eventTime: String,
      delay: String,
      keyCols: Seq[String]): DataFrame =
    if (df.isStreaming)
      df.withWatermark(eventTime, delay)
        .dropDuplicatesWithinWatermark(keyCols)
    else
      df.dropDuplicates(keyCols)

  /** Stream-static enrichment join: broadcast a small static dimension
    * against the unbounded stream (the standard lookup-enrichment shape —
    * author metadata, domain reputation, allow/deny lists). Per micro-batch
    * Catalyst plans a broadcast hash join, so the stream side never shuffles;
    * the static side is re-resolved each batch, picking up dimension updates
    * on sources that support it. Works identically on batch frames.
    */
  def enrichWithStatic(
      stream: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      joinType: String = "left_outer"): DataFrame =
    stream.join(broadcast(dim), keys, joinType)

  /** Attach an `observe` metric stream counting parsed article rows and rows
    * with a null event time (the reference's silent failure modes: malformed
    * JSON → null struct, unparseable date → null timestamp). Readable per
    * micro-batch from `StreamingQueryProgress.observedMetrics("parse_metrics")`
    * — the dead-letter visibility SURVEY.md §2.8 W4 calls for, with zero
    * extra passes over the data.
    */
  def withParseMetrics(parsed: DataFrame): DataFrame =
    parsed.observe(
      "parse_metrics",
      count(lit(1)).as("n_rows"),
      count(when(col("publish_date").isNull, 1)).as("n_null_event_time"),
      count(when(col("article_id").isNull, 1)).as("n_unparsed_payload"))
}
