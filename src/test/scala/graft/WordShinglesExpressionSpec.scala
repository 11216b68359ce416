package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Text

/** Native WordShingles must equal the HOF composition on arbitrary inputs —
  * including messy whitespace, token counts below n, and null text — and
  * participate in whole-stage codegen.
  */
class WordShinglesExpressionSpec extends AnyFunSuite with SparkSpec {

  test("native == composed on generated texts (messy whitespace, unicode, short docs)") {
    import spark.implicits._
    val word = Gen.oneOf("alpha", "beta", "gamma", "x", "中文", "a-b", "7")
    val sep = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
    val doc = for {
      k <- Gen.choose(0, 12)
      ws <- Gen.listOfN(k, word)
      ss <- Gen.listOfN(math.max(k - 1, 0), sep)
      lead <- Gen.oneOf("", " ", "\t")
      trail <- Gen.oneOf("", " ", "\n")
    } yield lead + ws.zipAll(ss, "", "").map { case (w, s) => w + s }.mkString + trail
    val inputs = (Gen.listOfN(200, doc).sample.get :+ "" :+ "one two" :+ "a a a a a").distinct
    for (n <- Seq(1, 2, 3)) {
      val rows = inputs.toDF("t")
        .select(
          Text.shingles(col("t"), n).as("native"),
          Text.shinglesComposed(col("t"), n).as("composed"),
          col("t"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n mismatch for '${r.getString(2)}'")
      }
    }
  }

  test("null text -> empty array in both forms") {
    import spark.implicits._
    val row = Seq[Option[String]](None).toDF("t")
      .select(Text.shingles(col("t"), 3).as("n"), Text.shinglesComposed(col("t"), 3).as("c"))
      .head()
    assert(row.getSeq[String](0).isEmpty && row.getSeq[String](1).isEmpty)
  }

  test("codegen: word_shingles runs inside a whole-stage star over a parquet scan") {
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val df = docs.select(Text.shingles(col("text"), 3).as("sh"))
    val plan = df.queryExecution.executedPlan.toString()
    assert("\\*\\(\\d+\\) Project \\[coalesce\\(word_shingles".r.findFirstIn(plan).isDefined, plan)
    assert(df.limit(3).collect().forall(_.getSeq[String](0).nonEmpty))
  }
}
