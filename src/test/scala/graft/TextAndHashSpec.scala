package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Hashing, Text}

/** Unit pins for the cross-engine hash and the text operators' edge cases. */
class TextAndHashSpec extends AnyFunSuite with SparkSpec {

  /** JVM-side reference implementation of hash60: first 15 hex chars of md5,
    * base 16 — what both the Spark column and the DuckDB fold must equal.
    */
  private def refHash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("hash60 matches the md5-prefix reference value and stays in [0, 2^60)") {
    import spark.implicits._
    val inputs = Seq("", "a", "hello world", "шницель", "a b c#7")
    val got = inputs.toDF("s").select(Hashing.hash60(col("s")).as("h"))
      .collect().map(_.getLong(0))
    inputs.zip(got).foreach { case (s, h) =>
      assert(h == refHash60(s), s"hash60($s)")
      assert(h >= 0L && h < (1L << 60))
    }
  }

  test("shingles: fewer than n tokens -> empty array; duplicates removed; order preserved") {
    import spark.implicits._
    val rows = Seq("one two", "a b c a b c a b", "x y z").toDF("t")
      .select(Text.shingles(col("t"), 3).as("sh")).collect()
      .map(_.getSeq[String](0))
    assert(rows(0).isEmpty, "2 tokens < n=3")
    assert(rows(1) == Seq("a b c", "b c a", "c a b"), "distinct keeps first occurrence order")
    assert(rows(2) == Seq("x y z"))
  }

  test("langId: marker argmax with fixed tie-break; 'und' when no markers hit") {
    import spark.implicits._
    val rows = Seq(
      "the cat and the dog of a house",  // en
      "el perro de la casa que y en",    // es
      "zzz qqq www",                     // no markers
      "the el"                           // 1-1 tie -> first in LangMarkers order = en
    ).toDF("t").select(Text.langId(col("t")).as("l")).collect().map(_.getString(0))
    assert(rows.toSeq == Seq("en", "es", "und", "en"))
  }

  test("fingerprint: order-sensitive (token swap changes it), deterministic, < 2^43") {
    import spark.implicits._
    val rows = Seq("alpha beta gamma", "beta alpha gamma", "alpha beta gamma")
      .toDF("t").select(Text.fingerprint(col("t")).as("f")).collect().map(_.getLong(0))
    assert(rows(0) == rows(2), "deterministic")
    assert(rows(0) != rows(1), "order-sensitive")
    rows.foreach(f => assert(f >= 0L && f < 8796093022208L))
  }

  test("bpeish token count: alpha runs, digit runs, single symbols") {
    import spark.implicits._
    val n = Seq("ab12 cd!e").toDF("t")
      .select(Text.bpeishTokenCount(col("t")).as("n")).head().getInt(0)
    // ab | 12 | cd | ! | e
    assert(n == 5)
  }
}
