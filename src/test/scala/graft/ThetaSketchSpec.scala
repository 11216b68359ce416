package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Hashing

/** Determinism and accuracy pins for the theta sketch aggregate — the
  * properties that justify its presence in a hash-checked catalog query
  * (q136): partitioning-independence, exact-mode equality below k, and
  * estimation-mode error within the documented bound.
  */
class ThetaSketchSpec extends AnyFunSuite with SparkSpec {

  test("theta sketch bytes are identical under any partitioning and insertion order") {
    import spark.implicits._
    val xs = (0L until 20000L).map(x => x * 2654435761L % 1000003L)
    def bytesOf(parts: Int, seq: Seq[Long]): Array[Byte] =
      seq.toDF("v").repartition(parts)
        .agg(Hashing.thetaSketchAgg(col("v"), 12).as("sk"))
        .head().getAs[Array[Byte]]("sk")
    val a = bytesOf(1, xs)
    val b = bytesOf(32, xs)
    val c = bytesOf(7, scala.util.Random.shuffle(xs))
    assert(java.util.Arrays.equals(a, b), "partition count must not move the sketch")
    assert(java.util.Arrays.equals(a, c), "insertion order must not move the sketch")
  }

  test("exact below k; estimation-mode distinct and intersection estimates within 3σ bounds") {
    import spark.implicits._
    // exact mode: 3000 distinct < k = 4096 (lgK 12) -> estimate is EXACT
    val small = (0L until 3000L).toDF("v")
      .agg(Hashing.thetaEstimate(Hashing.thetaSketchAgg(col("v"), 12)).as("e"))
      .head().getDouble(0)
    assert(small == 3000.0, s"below-k sketch must be exact, got $small")

    // estimation mode: two 60k-element sets overlapping in 20k elements
    val a = (0L until 60000L).map(i => ("a", i))
    val b = (40000L until 100000L).map(i => ("b", i))
    val sk = (a ++ b).toDF("g", "v").groupBy(col("g"))
      .agg(Hashing.thetaSketchAgg(col("v"), 12).as("sk"))
    val row = sk.groupBy()
      .pivot(col("g"), Seq("a", "b")).agg(first(col("sk")))
      .select(
        Hashing.thetaEstimate(col("a")).as("ea"),
        Hashing.thetaIntersectEstimate(col("a"), col("b")).as("ei"))
      .head()
    val (ea, ei) = (row.getDouble(0), row.getDouble(1))
    val rse = 1.0 / math.sqrt(4096 - 1)
    assert(math.abs(ea - 60000.0) <= 3 * rse * 60000.0,
      s"distinct estimate $ea outside 3σ of 60000")
    // intersection bound scales with the UNION (100k), not the intersection
    assert(math.abs(ei - 20000.0) <= 3.0 * 100000.0 / math.sqrt(4096.0),
      s"intersection estimate $ei outside the union-scaled 3σ bound of 20000")
  }

  test("union re-aggregation over stored bytes == direct sketch; AnotB difference within bound") {
    import spark.implicits._
    // three shards of one logical set: sketch each, union the BYTES, compare
    // against sketching the concatenation directly (same retained set)
    val parts = (0L until 30000L).map(i => (i % 3, i))
    val shards = parts.toDF("shard", "v").groupBy(col("shard"))
      .agg(Hashing.thetaSketchAgg(col("v"), 12).as("sk"))
    val folded = shards.agg(Hashing.thetaUnionAgg(col("sk"), 12).as("u"))
      .select(Hashing.thetaEstimate(col("u"))).head().getDouble(0)
    val direct = parts.toDF("shard", "v")
      .agg(Hashing.thetaEstimate(Hashing.thetaSketchAgg(col("v"), 12)))
      .head().getDouble(0)
    assert(folded == direct,
      s"stored-bytes union ($folded) must equal the direct sketch ($direct)")
    // difference: |A \ B| with A = 0..60k, B = 40k..100k -> truth 40k
    val a = (0L until 60000L).map(i => ("a", i))
    val b = (40000L until 100000L).map(i => ("b", i))
    val sk = (a ++ b).toDF("g", "v").groupBy(col("g"))
      .agg(Hashing.thetaSketchAgg(col("v"), 12).as("sk"))
    val ed = sk.groupBy().pivot(col("g"), Seq("a", "b")).agg(first(col("sk")))
      .select(Hashing.thetaAnotBEstimate(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(ed - 40000.0) <= 3.0 * 100000.0 / math.sqrt(4096.0),
      s"difference estimate $ed outside the union-scaled 3σ bound of 40000")
  }
}
