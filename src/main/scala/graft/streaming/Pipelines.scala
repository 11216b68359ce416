package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import graft.ops.Articles

/** End-to-end streaming execution of the reference pipeline — the part of
  * `/root/reference/app/process_articles.py` the operator library alone
  * doesn't cover: `writeStream` in append mode to a parquet sink with a
  * checkpoint (`process_articles.py:85-91`), driven by a trigger.
  *
  * Semantics delivered by the engine (and asserted in StreamingSpec):
  *  - W1  watermark: 10 s on `publish_date` (inside `Articles.pipeline`);
  *  - W3  append mode: a (window × author) row is emitted exactly once, only
  *        after the watermark passes the window end;
  *  - W4  late data: rows whose every window is already finalized are dropped;
  *  - W5  state: the windowed sum/count state lives in the checkpoint's state
  *        store and survives query restarts;
  *  - W6  trigger: `Trigger.AvailableNow` drains the backlog then stops (the
  *        deterministic stand-in for the reference's default microbatch loop);
  *  - S2/S4 parquet sink + checkpoint: exactly-once file output via the sink's
  *        commit log — restarting on the same checkpoint re-emits nothing.
  */
object Pipelines {

  /** Run `Articles.pipeline` (parse → enrich → windowed avg per author) from
    * `source` to a parquet directory. Returns the started query; callers own
    * `awaitTermination`/`stop`.
    */
  def articlesToParquet(
      spark: SparkSession,
      source: StreamSource,
      outPath: String,
      checkpointPath: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    toParquet(Articles.pipeline(source.load(spark)), outPath, checkpointPath, trigger)

  /** Generic append-mode parquet writer for any finalized streaming frame. */
  def toParquet(
      df: DataFrame,
      outPath: String,
      checkpointPath: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpointPath)
      .trigger(trigger)
      .start()
}
