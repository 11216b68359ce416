package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.QuantileIndex

/** The durable KLL-table lifecycle. KLL bytes are NOT comparable across
  * build paths (randomized compaction — see KllSketchExpression), so the
  * pins here are exactly the guarantees the operator ships: getN is an
  * exact additive counter (bit-equal across append/rebuild), estimates are
  * actual input items within the rank-error contract, the disk roundtrip
  * preserves bytes (hence estimates) exactly, and the q386/q387 report
  * surface is all-TRUE verdicts over deterministic exact columns.
  */
class QuantileIndexSpec extends AnyFunSuite with SparkSpec {

  private val sf = TestSpark.sf0001
  private val K = 256

  private def docs = Tables.load(spark, sf, "documents")

  private def estimates(tbl: DataFrame, qs: Seq[Double]): Map[(String, Double), Double] = {
    val qdf = broadcast(
      spark.createDataFrame(qs.map(Tuple1.apply)).toDF("q"))
    tbl.crossJoin(qdf)
      .select(col("key").cast("string"), col("q"),
        QuantileIndex.kllQuantile(col("sk"), col("q")))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
  }

  private def exactRanks(scoped: Map[(String, Double), Double]): Unit = {
    // every estimate must be an actual value of its group with inclusive
    // rank within eps of the requested q (the sketch's contract; on this
    // small corpus KLL is in exact mode, so eps could even be 0)
    val rows = docs.select(col("source"), col("n_chars").cast("double"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val byKey = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    scoped.foreach { case ((key, q), est) =>
      val vs = byKey(key)
      assert(vs.contains(est), s"estimate $est for ($key, $q) is not an input value")
      val rank = vs.count(_ <= est).toDouble / vs.length
      val rankBelow = vs.count(_ < est).toDouble / vs.length
      assert(rankBelow - 0.05 <= q && q <= rank + 0.05,
        s"($key, $q): estimate $est has inclusive rank $rank (below $rankBelow) — outside tolerance")
    }
  }

  test("build: n_rows == group counts == getN (the deterministic surface)") {
    val tbl = QuantileIndex.build(docs, col("source"), col("n_chars"), K)
    val got = tbl.select(col("key"), col("n_rows"),
        QuantileIndex.kllN(col("sk")).as("n_sk"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = docs.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (nRows, nSk)) =>
      assert(nRows == want(k) && nSk == want(k),
        s"$k: n_rows=$nRows getN=$nSk want=${want(k)}")
    }
  }

  test("append == rebuild: getN bit-equal, estimates within the rank contract") {
    val base = docs.where(pmod(col("doc_id"), lit(3)) =!= 0)
    val delta = docs.where(pmod(col("doc_id"), lit(3)) === 0)
    val appended = QuantileIndex.merge(Seq(
      QuantileIndex.build(base, col("source"), col("n_chars"), K),
      QuantileIndex.build(delta, col("source"), col("n_chars"), K)), K)
    val rebuilt = QuantileIndex.build(docs, col("source"), col("n_chars"), K)
    val nA = appended.select(col("key"), QuantileIndex.kllN(col("sk")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nR = rebuilt.select(col("key"), QuantileIndex.kllN(col("sk")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(nA == nR, "merge must add getN exactly")
    val qs = Seq(0.5, 0.9, 0.99)
    exactRanks(estimates(appended, qs))
    exactRanks(estimates(rebuilt, qs))
  }

  test("disk roundtrip preserves the stored bytes, hence every estimate") {
    val tbl = QuantileIndex.build(docs, col("source"), col("n_chars"), K)
    val dir = java.nio.file.Files.createTempDirectory("kll-tbl").toString
    QuantileIndex.write(tbl, dir)
    val back = QuantileIndex.read(spark, dir)
    val qs = Seq(0.5, 0.9, 0.99)
    assert(estimates(back, qs) == estimates(tbl, qs),
      "same bytes in, same estimates out — the roundtrip must be lossless")
  }

  test("report: every verdict TRUE, exact_q is the true INCLUSIVE nearest-rank value") {
    val tbl = QuantileIndex.build(docs, col("source"), col("n_chars"), K)
    val rep = QuantileIndex.report(tbl, docs, col("source"), col("n_chars"),
      qs = Seq(0.5, 0.9, 0.99), eps = 0.05, k = K).collect()
    assert(rep.nonEmpty)
    val scopes = rep.map(_.getString(0)).toSet
    assert(scopes.contains("__union__"), "the rollup row must be served")
    rep.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("n_match")), s"n_match false: $r")
      assert(r.getBoolean(r.fieldIndex("within_bound")), s"within_bound false: $r")
    }
    // spot-check one exact quantile against a brute-force sort
    val all = docs.select(col("n_chars").cast("double")).collect()
      .map(_.getDouble(0)).sorted
    val med = rep.find(r => r.getString(0) == "__union__" &&
      r.getDouble(r.fieldIndex("q")) == 0.5).get
    val n = all.length
    val want = all(math.ceil(0.5 * n).toInt - 1)
    assert(med.getDouble(med.fieldIndex("exact_q")) == want,
      s"exact_q must be the ceil(q·n)-th order statistic: $med vs $want")
  }
}
