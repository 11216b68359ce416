package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Articles

/** Malformed-input behavior of the parse/enrich stages — the semantics pins
  * SURVEY.md §5.2 calls for (F2/F3/F5), verified against what Spark 4.1
  * (ANSI on by default) actually does.
  */
class ParseSpec extends AnyFunSuite with SparkSpec {

  private def parseOne(payloads: String*) = {
    import spark.implicits._
    val env = payloads.toSeq.toDF("json")
      .select(col("json").cast("binary").as("data"))
    Articles.enrich(Articles.parse(env))
  }

  private val goodJson =
    """{"article_id":"a1","title":"t","author":"alice","publish_date":"2024-01-01T10:00:00","content":"one two three"}"""

  test("F2: malformed JSON -> null article fields (PERMISSIVE), not an error") {
    val rows = parseOne("{ not json", goodJson)
      .select("article_id", "author", "publish_date").collect()
    val bad = rows.find(_.isNullAt(1)).get
    assert(bad.isNullAt(0) && bad.isNullAt(2))
    val good = rows.find(!_.isNullAt(1)).get
    assert(good.getString(1) == "alice")
  }

  test("F3: unparseable publish_date -> null timestamp (reference 3.5 semantics under ANSI via try_to_timestamp)") {
    val rows = parseOne(
      goodJson.replace("2024-01-01T10:00:00", "not-a-date"))
      .select("publish_date", "author").collect()
    assert(rows.length == 1 && rows(0).isNullAt(0) && rows(0).getString(1) == "alice")
  }

  test("F5: size(null array) pin — NULL under Spark 4 ANSI (3.0+ changed from the 2.x -1)") {
    val wc = parseOne("{ not json").select("word_count").head()
    assert(wc.isNullAt(0),
      "size(split(null)) must be NULL: malformed rows carry no fake count into aggregates")
    // and the aggregate drops such rows entirely (null event time -> no window)
    val agg = parseOne("{ not json")
    val windows = Articles.avgWordCountByAuthor(agg).count()
    assert(windows == 0L, "null-timestamp rows are excluded from windowed aggregation")
  }

  test("F9/F10: uuid + processing_timestamp columns exist, typed, non-null for valid rows") {
    val row = parseOne(goodJson)
      .select("unique_id", "processing_timestamp").head()
    assert(row.getString(0).matches("[0-9a-f-]{36}"))
    assert(row.getTimestamp(1) != null)
  }
}
