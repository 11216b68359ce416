package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity

/** The native one-pass LSH bucket and L2² expressions must be bit-identical
  * to their interpreted HOF compositions on real and generated vectors.
  */
class AnnExpressionSpec extends AnyFunSuite with SparkSpec {

  test("signed_projection_bucket: native == composed on embeddings (float) and random doubles") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val mism = emb.select(
        Similarity.lshBucket(col("embedding"), 0, 8, 64).as("n"),
        Similarity.lshBucketComposed(col("embedding"), 0, 8, 64).as("c"))
      .where(col("n") =!= col("c")).count()
    assert(mism == 0, s"$mism bucket mismatches on float embeddings")

    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val dbl = (0 until 200).map(_ => Seq.fill(16)(rnd.nextGaussian())).toDF("v")
    val mism2 = dbl.select(
        Similarity.lshBucket(col("v"), 2, 12, 16).as("n"),
        Similarity.lshBucketComposed(col("v"), 2, 12, 16).as("c"))
      .where(col("n") =!= col("c")).count()
    assert(mism2 == 0, "double-element arrays must bucket identically")

    // length mismatch fails loudly in both forms
    val bad = Seq(Seq(1.0, 2.0)).toDF("v")
      .select(Similarity.lshBucket(col("v"), 0, 4, 16))
    intercept[Exception](bad.collect())
  }

  test("l2sq: native == composed; null propagation on null input") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val rows = (0 until 300).map { _ =>
      (Seq.fill(32)(rnd.nextFloat()), Seq.fill(32)(rnd.nextGaussian()))
    }.toDF("a", "b")
    val mism = rows.select(
        Similarity.l2sq(col("a"), col("b")).as("n"),
        Similarity.l2sqComposed(col("a"), col("b")).as("c"))
      .where(not(col("n") <=> col("c"))).count()
    assert(mism == 0, "native L2² must be bit-identical to the composed fold")

    val nul = Seq((Option.empty[Seq[Float]], Option(Seq(1.0, 2.0))))
      .toDF("a", "b")
      .select(Similarity.l2sq(col("a"), col("b"))).head()
    assert(nul.isNullAt(0), "null input -> null")
  }
}
