package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation — the heart of the reference pipeline
  * (`/root/reference/app/process_articles.py:78-82`: 5-minute window sliding
  * by 1 minute with a 10-second watermark, append mode).
  *
  * Works on both batch and streaming inputs:
  *   - streaming: declares a real `withWatermark`; append-mode emission of
  *     finalized windows is handled by the engine.
  *   - batch: the watermark is modeled explicitly (batch twin used by the
  *     DuckDB oracle): watermark = max(eventTime) - delay, and only windows
  *     with window_end <= watermark are "finalized" and emitted.
  */
object Windowing {

  /** Sliding (or tumbling, when slide == width) event-time aggregation.
    * Output columns: window_start, window_end, <keys...>, <aggs...>.
    */
  def slidingAgg(
      df: DataFrame,
      eventTime: String,
      width: String,
      slide: String,
      watermarkDelay: Option[String],
      keys: Seq[Column],
      aggs: Seq[Column]): DataFrame = {
    val withWm = watermarkDelay match {
      case Some(d) if df.isStreaming => df.withWatermark(eventTime, d)
      case _ => df
    }
    val grouped = withWm
      .groupBy(window(col(eventTime), width, slide) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

    watermarkDelay match {
      case Some(d) if !df.isStreaming =>
        // Batch twin of append-mode finalization: a window is emitted only
        // once the (global) watermark has passed its end. On inputs with no
        // non-null event time, max() is null and the <= predicate drops every
        // window — consistent: such rows produce no windows upstream either
        // (window() filters null timestamps), so `grouped` is already empty.
        val wm = df.agg((max(col(eventTime)) - expr(s"INTERVAL $d")).as("wm"))
        grouped
          .crossJoin(broadcast(wm))
          .where(col("window_end") <= col("wm"))
          .drop("wm")
      case _ => grouped
    }
  }

  /** Tumbling convenience: slide == width. */
  def tumblingAgg(
      df: DataFrame,
      eventTime: String,
      width: String,
      watermarkDelay: Option[String],
      keys: Seq[Column],
      aggs: Seq[Column]): DataFrame =
    slidingAgg(df, eventTime, width, width, watermarkDelay, keys, aggs)

  /** Session windows (gap-based); streaming-capable via session_window.
    * Batch twin note: DuckDB oracle expresses sessionization with a lag/gap
    * cumulative-sum — see SessionQueries.
    */
  def sessionAgg(
      df: DataFrame,
      eventTime: String,
      gap: String,
      watermarkDelay: Option[String],
      keys: Seq[Column],
      aggs: Seq[Column]): DataFrame = {
    val withWm = watermarkDelay match {
      case Some(d) if df.isStreaming => df.withWatermark(eventTime, d)
      case _ => df
    }
    withWm
      .groupBy(session_window(col(eventTime), gap) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("session_window.start"))
      .withColumn("window_end", col("session_window.end"))
      .drop("session_window")
  }
}
