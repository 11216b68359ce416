package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.FreqItemsSketch
import graft.ops.Text

/** The Misra-Gries aggregate: buffer mechanics (update/merge/serde), the
  * frequency guarantee under arbitrary partitioning, and the exact two-pass
  * heavy-hitter operator built on it.
  */
class FreqItemsSketchSpec extends AnyFunSuite with SparkSpec {

  test("buffer mechanics: eviction, merge offset, serde round-trip") {
    val sk = FreqItemsSketch(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.StringType, nullable = true), 2)
    val buf = sk.createAggregationBuffer()
    // capacity 2: a a a b c -> a survives with the canonical MG counters
    Seq("a", "a", "a", "b", "c").foreach { s =>
      val row = org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      sk.update(buf, row.copy())
    }
    // after aaa: {a:3}; +b: {a:3,b:1}; +c: full -> decrement all: {a:2}
    assert(buf.get("a") == 2L && buf.size() == 1)

    val other = sk.createAggregationBuffer()
    other.put("b", 5L)
    other.put("c", 4L)
    val merged = sk.merge(sk.deserialize(sk.serialize(buf)), other)
    // {a:2,b:5,c:4} over capacity 2 -> subtract 3rd-largest (2): {b:3,c:2}
    assert(!merged.containsKey("a") && merged.get("b") == 3L && merged.get("c") == 2L)
  }

  test("guarantee: items above n/(capacity+1) survive any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // skewed stream: "heavy" is ~20% of 5000 tokens, 400 rare fillers
    val stream = rnd.shuffle(
      Seq.fill(1000)("heavy") ++
        (0 until 4000).map(i => s"rare_${rnd.nextInt(400)}"))
    Seq(1, 3, 8).foreach { parts =>
      val cands = stream.toDF("tok").repartition(parts)
        .agg(Text.freqItemsSketch(col("tok"), 8).as("c"))
        .head().getSeq[String](0)
      assert(cands.contains("heavy"),
        s"freq 0.2 > 1/9 must survive with $parts partitions")
      assert(cands.size <= 8)
    }
  }

  test("heavyHitterTokens == exact GROUP BY/HAVING, capacity far below vocabulary") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    // 300 docs over a 500-word vocabulary; two planted heavy tokens
    val docs = (0 until 300).map { i =>
      val words = Seq.fill(20)(s"w${rnd.nextInt(500)}") ++
        Seq.fill(8)("alpha") ++ Seq.fill(5)("beta")
      (i.toLong, rnd.shuffle(words).mkString(" "))
    }.toDF("doc_id", "text")
    val got = Text.heavyHitterTokens(docs, col("doc_id"), col("text"),
        capacity = 40, minFrac = 0.05)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = docs.select(explode(Text.tokens(col("text"))).as("tok"))
      .groupBy("tok").count()
      .withColumn("th", ceil(lit(docs.select(
        sum(size(Text.tokens(col("text"))))).head().getLong(0) * 0.05)))
      .where(col("count") >= col("th"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact, s"two-pass result must equal the exact computation: $got vs $exact")
    assert(got.contains("alpha") && got.contains("beta"))
  }
}
