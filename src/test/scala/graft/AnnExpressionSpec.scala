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

  test("pcaPowerIteration: recovers a planted dominant direction; pc1 unit-norm; explained_frac sane") {
    import spark.implicits._
    // 120 vectors in R^8: strong variance along u = e1+e2 (normalized),
    // small deterministic perturbation on the remaining axes
    val d = 8
    val rows = (0 until 120).map { i =>
      val t = (i % 11).toDouble - 5.0 // dominant coordinate, variance ~10
      val base = Array.tabulate(d)(j =>
        if (j == 0 || j == 1) (t / math.sqrt(2.0)).toFloat
        else (math.sin(i * (j + 1)) * 0.05).toFloat)
      (i.toLong, base)
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = graft.ops.Similarity
      .pcaPowerIteration(df, col("vec_id"), col("embedding"), dims = d, iters = 25)
      .collect().sortBy(_.getLong(0))
    val pc1 = out.map(_.getDouble(2))
    val nrm = math.sqrt(pc1.map(x => x * x).sum)
    assert(math.abs(nrm - 1.0) < 1e-9, s"pc1 must be unit-norm, got $nrm")
    val target = 1.0 / math.sqrt(2.0)
    assert(math.abs(math.abs(pc1(0)) - target) < 0.01 &&
      math.abs(math.abs(pc1(1)) - target) < 0.01,
      s"pc1 must align with the planted direction, got ${pc1.take(3).toSeq}")
    val explained = out.head.getDouble(4)
    assert(explained > 0.95 && explained <= 1.0 + 1e-9,
      s"planted direction carries ~all variance, got $explained")
  }

  test("pcaTop2: deflation recovers a second planted direction, orthogonal to the first") {
    import spark.implicits._
    val d = 8
    // variance ~9 along e1, ~1 along e3, noise elsewhere
    val rows = (0 until 90).map { i =>
      val a = ((i % 10) - 4.5) * 2.0 / 3.0
      val b = ((i / 10) % 3 - 1).toDouble
      val v = Array.tabulate(d)(j =>
        if (j == 0) (a * 3.0).toFloat
        else if (j == 2) b.toFloat
        else (math.sin(i * (j + 3)) * 0.02).toFloat)
      (i.toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = graft.ops.Similarity
      .pcaTop2(df, col("vec_id"), col("embedding"), dims = d, iters = 25)
      .collect().sortBy(_.getLong(0))
    val pc1 = out.map(_.getDouble(2))
    val pc2 = out.map(_.getDouble(3))
    assert(math.abs(math.abs(pc1(0)) - 1.0) < 0.01, "pc1 ~ e1")
    assert(math.abs(math.abs(pc2(2)) - 1.0) < 0.01, "pc2 ~ e3")
    val dot = pc1.zip(pc2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-6, s"deflated component must be orthogonal (dot=$dot)")
    val (e1v, e2v) = (out.head.getDouble(4), out.head.getDouble(5))
    assert(e1v > e2v && e2v > 0.5, s"spectrum ordered: $e1v > $e2v")
  }

  test("pcaWhiten2: whitened axes have ~unit variance and ~zero mean on a planted spectrum") {
    import spark.implicits._
    val d = 8
    val rows = (0 until 90).map { i =>
      val a = ((i % 10) - 4.5) * 2.0 / 3.0
      val b = ((i / 10) % 3 - 1).toDouble
      val v = Array.tabulate(d)(j =>
        if (j == 0) (a * 3.0).toFloat
        else if (j == 2) b.toFloat
        else (math.sin(i * (j + 3)) * 0.02).toFloat)
      (i.toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val w = graft.ops.Similarity
      .pcaWhiten2(df, col("vec_id"), col("embedding"), dims = d, iters = 25)
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    def stats(xs: Array[Double]) = {
      val m = xs.sum / xs.length
      (m, xs.map(x => (x - m) * (x - m)).sum / xs.length)
    }
    val (m1, v1) = stats(w.map(_._1)); val (m2, v2) = stats(w.map(_._2))
    assert(math.abs(m1) < 1e-6 && math.abs(m2) < 1e-6, s"centered: $m1 $m2")
    assert(math.abs(v1 - 1.0) < 0.01 && math.abs(v2 - 1.0) < 0.01,
      s"unit variance per whitened axis: $v1 $v2")
  }

  test("pc1GroupDrift: law of total variance holds; shifted group shows between-group signal") {
    import spark.implicits._
    val d = 8
    // two labels along e1: label 0 centered at -2, label 1 at +2 (spread 0..1)
    val rows = (0 until 80).map { i =>
      val lab = i % 2
      val center = if (lab == 0) -2.0 else 2.0
      val v = Array.tabulate(d)(j =>
        if (j == 0) (center + (i % 5) * 0.25).toFloat
        else (math.cos(i * (j + 2)) * 0.03).toFloat)
      (i.toLong, v, lab)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val drift = graft.ops.Similarity
      .pc1GroupDrift(df, col("vec_id"), col("embedding"), col("label"), d, 20)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val projs = graft.ops.Similarity
      .pc1Projections(df, col("vec_id"), col("embedding"), d, 20)
      .collect().map(_.getDouble(1))
    val n = projs.length.toDouble
    val mean = projs.sum / n
    val totalVar = projs.map(p => (p - mean) * (p - mean)).sum / n
    val decomposed = drift.values.map { case (nl, _, dev, wv) =>
      (nl / n) * (dev * dev + wv)
    }.sum
    assert(math.abs(totalVar - decomposed) < 1e-9,
      s"between + within must reassemble the total variance ($totalVar vs $decomposed)")
    assert(math.abs(drift(0)._3) > 1.0 && math.abs(drift(1)._3) > 1.0,
      "the planted label shift dominates the between-group deviation")
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
