package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

import graft.ops.Articles
import graft.streaming.{KinesisEnvelope, Pipelines, StreamSource}

/** The engine's streaming execution path, end to end — the semantics the
  * reference exercises in production (`/root/reference/app/process_articles.py:53-91`)
  * run here as real StreamingQueries: watermark (W1), append-mode finalization
  * (W3), late-data drop (W4), state-store recovery across restarts (W5),
  * Trigger.AvailableNow lifecycle (W6), parquet sink + checkpoint exactly-once
  * (S2/S4), and the MemoryStream / file-dir / rate StreamSource impls (S1).
  */
class StreamingSpec extends AnyFunSuite with SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Producer-shaped article JSON (`populate_stream.py:73-80`). */
  private def artJson(author: String, publishDate: String, words: Int): String = {
    val content = (1 to words).map(i => s"w$i").mkString(" ")
    s"""{"article_id":"a-$author-$publishDate","title":"t one two","author":"$author","publish_date":"$publishDate","content":"$content"}"""
  }

  private var seq = 0L
  private def env(author: String, publishDate: String, words: Int): KinesisEnvelope = {
    seq += 1
    KinesisEnvelope.ofJson(artJson(author, publishDate, words), seq, ts("2024-01-01 00:00:00"))
  }

  /** The reference pipeline's batch twin on the same envelope rows — what the
    * streaming run must reproduce exactly (same watermark model: finalized =
    * window_end <= max(event time) - 10s).
    */
  private def batchTwin(rows: Seq[KinesisEnvelope]): Set[(Timestamp, Timestamp, String, Double)] = {
    import spark.implicits._
    val df = spark.createDataset(rows).toDF()
    collectWindows(Articles.pipeline(df))
  }

  private def collectWindows(df: DataFrame): Set[(Timestamp, Timestamp, String, Double)] =
    df.select("start", "end", "author", "average_word_count")
      .collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getString(2), r.getDouble(3)))
      .toSet

  private def readOut(path: String): Set[(Timestamp, Timestamp, String, Double)] =
    collectWindows(spark.read.schema(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("start", org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("end", org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("author", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("average_word_count", org.apache.spark.sql.types.DoubleType)
      ))).parquet(path))

  // -------------------------------------------------------------------------

  test("W1/W3/W4: watermark drops fully-late rows; append emits finalized windows once (MemoryStream)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val ms = MemoryStream[KinesisEnvelope]
    val out = tmpDir("stream-out")
    val ckpt = tmpDir("stream-ckpt")
    val q = Pipelines.toParquet(Articles.pipeline(ms.toDF()), out, ckpt,
      Trigger.ProcessingTime(0))

    // batch 1: three alice articles inside 10:00-10:02.
    val b1 = Seq(
      env("alice", "2024-01-01T10:00:00", 3),
      env("alice", "2024-01-01T10:00:30", 5),
      env("alice", "2024-01-01T10:02:00", 7))
    ms.addData(b1)
    q.processAllAvailable()

    // batch 2: a fully-late bob row (all its windows end 09:51-09:55, far
    // behind the watermark 10:01:50) that MUST be dropped, plus a flush row.
    val late = env("bob", "2024-01-01T09:50:00", 100)
    val flush1 = env("carol", "2024-01-01T10:30:00", 1)
    ms.addData(Seq(late, flush1))
    q.processAllAvailable()

    // batch 3: advance the watermark past every alice window end.
    val flush2 = env("carol", "2024-01-01T10:30:05", 1)
    ms.addData(Seq(flush2))
    q.processAllAvailable()
    q.stop()

    val got = readOut(out)
    val expected = batchTwin(b1 ++ Seq(flush1, flush2)) // late row excluded
    assert(got == expected)
    assert(!got.exists(_._3 == "bob"), "fully-late row must be dropped (W4)")
    assert(got.exists(_._3 == "alice"), "finalized alice windows must be emitted")
    assert(!got.exists(_._3 == "carol"), "open carol windows must NOT be emitted yet (W3)")
  }

  test("W6/S2/S4: Trigger.AvailableNow file source == batch twin; restart on same checkpoint re-emits nothing") {
    import spark.implicits._
    val envDir = tmpDir("stream-env")
    val out = tmpDir("stream-out2")
    val ckpt = tmpDir("stream-ckpt2")

    val b1 = Seq(
      env("alice", "2024-01-01T10:00:00", 3),
      env("alice", "2024-01-01T10:00:30", 5),
      env("dave", "2024-01-01T10:02:00", 7),
      env("carol", "2024-01-01T10:30:00", 2)) // flush: finalizes the 10:0x windows
    spark.createDataset(b1).toDF().coalesce(1).write.mode("append").parquet(envDir)

    def runOnce(): Unit = {
      val q = Pipelines.articlesToParquet(spark,
        StreamSource.FileEnvelopeSource(envDir), out, ckpt, Trigger.AvailableNow())
      q.awaitTermination()
    }

    runOnce()
    val afterRun1 = readOut(out)
    assert(afterRun1 == batchTwin(b1),
      "AvailableNow drain must equal the batch twin (watermark = max - 10s)")
    assert(afterRun1.nonEmpty)

    // Restart on the same checkpoint with no new data: exactly-once means the
    // sink's commit log prevents any re-emission.
    runOnce()
    assert(readOut(out) == afterRun1, "restart with no new data must append nothing (S4)")

    // New file arrives; restart recovers windowed state from the checkpoint
    // (W5) and finalizes carol's 10:30 windows exactly once.
    val b2 = Seq(env("erin", "2024-01-01T10:40:30", 4))
    spark.createDataset(b2).toDF().coalesce(1).write.mode("append").parquet(envDir)
    runOnce()
    assert(readOut(out) == batchTwin(b1 ++ b2),
      "state recovered across restart; newly-finalized windows appended once")
  }

  test("S1: rate source synthesizes parseable producer-shaped articles") {
    val src = StreamSource.RateEnvelopeSource(rowsPerSecond = 500)
    val parsed = Articles.enrich(Articles.parse(src.load(spark)))
    assert(parsed.isStreaming)
    val q = parsed.writeStream.format("memory").queryName("rate_smoke")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    try {
      Thread.sleep(1500)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("rate_smoke")
    assert(rows.count() >= 1)
    val r = rows.selectExpr("min(word_count)", "count(distinct author)").head()
    assert(r.getInt(0) >= 1, "content tokenized to >=1 words")
    assert(r.getLong(1) >= 1L)
  }

  test("streaming plan carries EventTimeWatermark + stateful aggregation (W1/W5)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[KinesisEnvelope]
    val df = Articles.pipeline(ms.toDF())
    assert(df.isStreaming)
    val analyzed = df.queryExecution.analyzed.toString()
    assert(analyzed.contains("EventTimeWatermark"), "watermark must be declared on the streaming path")
    assert(analyzed.contains("Aggregate"), "windowed aggregation present")
  }
}
