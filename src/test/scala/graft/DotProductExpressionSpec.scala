package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Num

/** Native DotProduct must be bit-identical to the HOF composition, including
  * the edge semantics (empty -> 0.0, length mismatch -> null, null element
  * -> null), and participate in whole-stage codegen.
  */
class DotProductExpressionSpec extends AnyFunSuite with SparkSpec {

  test("native == composed, bit-for-bit, on random float vectors") {
    import spark.implicits._
    val gen = Gen.listOfN(150, Gen.listOfN(64, Gen.chooseNum(-10f, 10f)))
    val pairs = gen.sample.get.grouped(2).collect { case Seq(a, b) => (a.toArray, b.toArray) }.toSeq
    val rows = pairs.toDF("a", "b")
      .select(
        Num.dot(col("a"), col("b")).as("native"),
        Num.dotComposed(col("a"), col("b")).as("composed"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        s"native ${r.getDouble(0)} != composed ${r.getDouble(1)}")
    }
  }

  test("edge semantics: empty -> 0.0; length mismatch -> null; null array -> null") {
    import spark.implicits._
    val df = Seq(
      (Array.empty[Float], Array.empty[Float]),
      (Array(1f, 2f), Array(3f, 4f, 5f))
    ).toDF("a", "b")
    val rows = df.select(
      Num.dot(col("a"), col("b")).as("n"),
      Num.dotComposed(col("a"), col("b")).as("c")).collect()
    assert(rows(0).getDouble(0) == 0.0 && rows(0).getDouble(1) == 0.0)
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1), "length mismatch -> null in both forms")
    val nullArr = Seq(Tuple2(null.asInstanceOf[Array[Float]], Array(1f)))
      .toDF("a", "b").select(Num.dot(col("a"), col("b"))).head()
    assert(nullArr.isNullAt(0))
  }

  test("codegen: dot_product projection carries the whole-stage star over a parquet scan") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val df = emb.select(Num.dot(col("embedding"), col("embedding")).as("d"))
    val plan = df.queryExecution.executedPlan.toString()
    assert("\\*\\(\\d+\\) Project \\[dot_product".r.findFirstIn(plan).isDefined, plan)
    assert(df.limit(3).collect().forall(_.getDouble(0) >= 0.0))
  }
}
