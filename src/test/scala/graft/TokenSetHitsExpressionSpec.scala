package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Text

/** Native TokenSetHits must equal the HOF composition on arbitrary inputs
  * (case folding, messy whitespace, repeats) and propagate nulls. */
class TokenSetHitsExpressionSpec extends AnyFunSuite with SparkSpec {

  private val markers = Seq("the", "and", "of")

  test("native == composed on generated texts") {
    import spark.implicits._
    val word = Gen.oneOf("THE", "The", "the", "and", "of", "off", "theory", "x", "中文")
    val doc = for {
      k <- Gen.choose(0, 15)
      ws <- Gen.listOfN(k, word)
      lead <- Gen.oneOf("", "  ", "\t")
    } yield lead + ws.mkString(" ")
    val inputs = (Gen.listOfN(200, doc).sample.get :+ "" :+ "the the the").distinct
    val rows = inputs.toDF("t")
      .select(
        Text.markerHits(col("t"), markers).as("native"),
        Text.markerHitsComposed(col("t"), markers).as("composed"),
        col("t"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(0) == r.getInt(1), s"mismatch for '${r.getString(2)}'")
    }
    // occurrences, not distinct
    val trip = rows.find(_.getString(2) == "the the the").get
    assert(trip.getInt(0) == 3)
  }

  test("token_fingerprint: native == composed on generated texts; null -> null") {
    import spark.implicits._
    val word = Gen.oneOf("alpha", "beta", "x", "中文", "7", "")
    val doc = Gen.choose(0, 20).flatMap(k => Gen.listOfN(k, word)).map(_.mkString(" "))
    val inputs = (Gen.listOfN(150, doc).sample.get :+ "" :+ " leading and trailing ").distinct
    val rows = inputs.toDF("t")
      .select(Text.fingerprint(col("t")).as("n"),
        Text.fingerprintComposed(col("t")).as("c"), col("t"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), s"mismatch for '${r.getString(2)}'"))
    val nul = Seq[Option[String]](None).toDF("t")
      .select(Text.fingerprint(col("t")), Text.fingerprintComposed(col("t"))).head()
    assert(nul.isNullAt(0) && nul.isNullAt(1))
  }

  test("null text -> null in both forms; langId over documents unchanged") {
    import spark.implicits._
    val row = Seq[Option[String]](None).toDF("t")
      .select(Text.markerHits(col("t"), markers), Text.markerHitsComposed(col("t"), markers))
      .head()
    assert(row.isNullAt(0) && row.isNullAt(1))
    // langId end-to-end on real data must be stable under the native swap
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val dist = docs.select(Text.langId(col("text")).as("l"))
      .groupBy("l").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dist.values.sum == docs.count())
  }
}
