package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Num, Text, Windowing}
import org.apache.spark.sql.functions._

/** Batch twins of the reference's streaming surface (SURVEY.md §2.8), run on
  * the `events` table (`ts` plays publish_date, `event_type` plays author,
  * `value` plays word_count — FIXTURES.md §B), plus the JSON-parse and
  * enrichment stages on `events.props` / `documents.text`.
  */
object CoreQueries {

  private def slidingOracle(watermarkFilter: Boolean): String = {
    val wm = if (watermarkFilter)
      s" HAVING window_start + INTERVAL 5 MINUTE <= (SELECT max(ts) - INTERVAL 10 SECOND FROM ${Tables.duckEvents} ev2)"
    else ""
    s"""SELECT window_start,
       |       window_start + INTERVAL 5 MINUTE AS window_end,
       |       event_type,
       |       ${Num.duckDavg("value")} AS avg_value,
       |       COUNT(*) AS n
       |FROM (SELECT date_trunc('minute', ts) - to_minutes(CAST(k AS INT)) AS window_start,
       |             event_type, value
       |      FROM ${Tables.duckEvents} ev CROSS JOIN generate_series(0, 4) AS t(k))
       |GROUP BY 1, 2, 3$wm""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // The flagship pipeline itself (envelope -> cast -> from_json -> flatten
    // -> to_timestamp -> enrich -> watermarked sliding agg -> projection),
    // hash-verified end to end: the envelope is synthesized deterministically
    // from `documents` (publish_date from the cross-engine hash, author =
    // lang, content = text), so unlike `entry()` (uuid/current_timestamp
    // smoke path) every output cell is oracle-checkable.
    QueryDef(
      "q00_flagship_pipeline",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val pd = timestamp_seconds(lit(1704067200L) +
          pmod(graft.ops.Hashing.hash60(concat(lit("pd-"), col("doc_id"))), lit(7200L)))
        val payload = to_json(struct(
          concat(lit("doc-"), col("doc_id")).as("article_id"),
          col("source").as("title"),
          col("lang").as("author"),
          date_format(pd, "yyyy-MM-dd'T'HH:mm:ss").as("publish_date"),
          col("text").as("content")))
        val envelope = docs.select(
          payload.cast("binary").as("data"),
          lit(null).cast("timestamp").as("approximateArrivalTimestamp"),
          concat(lit("doc-"), col("doc_id")).as("partitionKey"),
          col("doc_id").cast("string").as("sequenceNumber"),
          lit("shardId-000000000000").as("kinesisShardId"))
        graft.ops.Articles.pipeline(envelope)
      },
      Some {
        val h = graft.ops.Hashing.duckHash60("('pd-' || CAST(doc_id AS VARCHAR))")
        s"""WITH arts AS (
           |  SELECT lang AS author,
           |    TIMESTAMP '2024-01-01 00:00:00' + to_seconds($h % 7200) AS pd,
           |    len(string_split_regex(text, '\\s+')) AS wc
           |  FROM documents)
           |SELECT window_start AS start,
           |       window_start + INTERVAL 5 MINUTE AS "end",
           |       author, AVG(wc) AS average_word_count
           |FROM (SELECT date_trunc('minute', pd) - to_minutes(CAST(k AS INT)) AS window_start,
           |             author, wc
           |      FROM arts CROSS JOIN generate_series(0, 4) AS t(k))
           |GROUP BY 1, 2, 3
           |HAVING window_start + INTERVAL 5 MINUTE <=
           |       (SELECT max(pd) - INTERVAL 10 SECOND FROM arts)""".stripMargin
      }),

    // W2/A1/A2: sliding event-time window aggregation (5m window, 1m slide),
    // the flagship twin of process_articles.py:78-82.
    QueryDef(
      "q01_sliding_window_avg",
      (s, dir) => {
        val events = Tables.load(s, dir, "events")
        Windowing.slidingAgg(events, "ts", "5 minutes", "1 minute", None,
          keys = Seq(col("event_type")),
          aggs = Seq(
            Num.davg(col("value")).as("avg_value"),
            count(lit(1)).as("n")))
      },
      Some(slidingOracle(watermarkFilter = false))),

    // W1/W3: same with the 10s watermark modeled as append-mode finalization
    // (only windows whose end the watermark has passed are emitted).
    QueryDef(
      "q02_sliding_window_watermark",
      (s, dir) => {
        val events = Tables.load(s, dir, "events")
        Windowing.slidingAgg(events, "ts", "5 minutes", "1 minute", Some("10 seconds"),
          keys = Seq(col("event_type")),
          aggs = Seq(
            Num.davg(col("value")).as("avg_value"),
            count(lit(1)).as("n")))
      },
      Some(slidingOracle(watermarkFilter = true))),

    // Tumbling window (slide == width) with count + exact sum.
    QueryDef(
      "q03_tumbling_window_sum",
      (s, dir) => {
        val events = Tables.load(s, dir, "events")
        Windowing.tumblingAgg(events, "ts", "10 minutes", None,
          keys = Seq(col("event_type")),
          aggs = Seq(
            count(lit(1)).as("n"),
            Num.dsum(col("value")).as("sum_value")))
      },
      Some(
        s"""SELECT date_trunc('minute', ts) - to_minutes(CAST(extract(minute FROM ts) AS INT) % 10) AS window_start,
          |       date_trunc('minute', ts) - to_minutes(CAST(extract(minute FROM ts) AS INT) % 10) + INTERVAL 10 MINUTE AS window_end,
          |       event_type, COUNT(*) AS n,
          |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
          |FROM ${Tables.duckEvents} ev GROUP BY 1, 2, 3""".stripMargin)),

    // F2 twin: JSON payload parsing (from_json on events.props).
    QueryDef(
      "q04_json_extract",
      (s, dir) => {
        val events = Tables.load(s, dir, "events")
        events
          .select(
            col("event_id"),
            from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType)
            ))).getField("k").as("k"))
          .where(col("k") >= 50)
      },
      Some(
        """SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k
          |FROM events WHERE CAST(json_extract(props, '$.k') AS INT) >= 50""".stripMargin)),

    // F4/F5 twin: tokenize + word_count per document (the enrichment stage).
    QueryDef(
      "q05_doc_word_count",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        docs.select(
          col("doc_id"),
          Text.wordCount(col("text")).as("word_count"),
          col("n_chars"))
      },
      Some(
        """SELECT doc_id, len(string_split_regex(text, '\s+')) AS word_count, n_chars
          |FROM documents""".stripMargin)),

    // A1/A2 twin over a plain (non-windowed) grouping: avg word count per
    // language — the reference's avg-per-author shape.
    QueryDef(
      "q06_avg_word_count_by_lang",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        docs
          .select(col("lang"), Text.wordCount(col("text")).as("wc"))
          .groupBy(col("lang"))
          .agg(
            avg(col("wc")).as("avg_word_count"),
            count(lit(1)).as("n_docs"))
      },
      Some(
        """SELECT lang,
          |       AVG(len(string_split_regex(text, '\s+'))) AS avg_word_count,
          |       COUNT(*) AS n_docs
          |FROM documents GROUP BY lang""".stripMargin)),

    // Session windows (gap-based sessionization) per user; batch twin uses
    // the classic gaps-and-islands formulation in the oracle.
    QueryDef(
      "q07_session_windows",
      (s, dir) => {
        val events = Tables.load(s, dir, "events")
        Windowing.sessionAgg(events, "ts", "30 minutes", None,
          keys = Seq(col("user_id")),
          aggs = Seq(
            count(lit(1)).as("n"),
            Num.dsum(col("value")).as("sum_value")))
      },
      Some(
        s"""WITH marked AS (
          |  SELECT user_id, ts, value,
          |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE
          |              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
          |              THEN 1 ELSE 0 END AS new_session
          |  FROM ${Tables.duckEvents} ev),
          |sessions AS (
          |  SELECT user_id, ts, value,
          |         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
          |  FROM marked)
          |SELECT user_id, COUNT(*) AS n,
          |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
          |       min(ts) AS window_start,
          |       max(ts) + INTERVAL 30 MINUTE AS window_end
          |FROM sessions GROUP BY user_id, sid""".stripMargin))
  )
}
