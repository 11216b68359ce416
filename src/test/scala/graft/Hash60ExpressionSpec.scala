package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Hashing

/** The native Hash60 expression must be bit-identical to the built-in
  * composition (and the JVM reference) on arbitrary inputs, stay inside
  * whole-stage codegen, and register for SQL via the extensions entry.
  */
class Hash60ExpressionSpec extends AnyFunSuite with SparkSpec {

  test("native == composed == JVM reference on generated strings (incl. unicode, empty, long)") {
    import spark.implicits._
    val gen = Gen.listOfN(300, Gen.oneOf(
      Gen.alphaNumStr,
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf("α", "β", "中", "文", "🙂", "a", " ")).map(_.mkString)))
    val inputs = (gen.sample.get :+ "" :+ ("x" * 10000)).distinct
    val rows = inputs.toDF("s")
      .select(col("s"),
        Hashing.hash60(col("s")).as("native"),
        Hashing.hash60Composed(col("s")).as("composed"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s, n, c) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(n == c, s"native != composed for '$s'")
      assert(n == Hashing.hash60JVM(s), s"native != JVM ref for '$s'")
      assert(n >= 0L && n < (1L << 60))
    }
  }

  test("native hash60 stays inside whole-stage codegen (no fallback to interpreted)") {
    import spark.implicits._
    // literal inputs constant-fold at plan time (which itself exercises the
    // interpreted path); a parquet scan forces runtime evaluation
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val df = docs.select(Hashing.hash60(col("text")).as("h"))
    val plan = df.queryExecution.executedPlan.toString()
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert("\\*\\(\\d+\\) Project \\[hash60".r.findFirstIn(plan).isDefined,
      s"hash60 projection must carry the codegen star:\n$plan")
    assert(df.limit(5).collect().forall(r => r.getLong(0) >= 0L))
    // nulls propagate
    val n = Seq[Option[String]](None).toDF("s")
      .select(Hashing.hash60(col("s"))).head()
    assert(n.isNullAt(0))
  }

  test("SQL registration: hash60() callable from Spark SQL via the registry entry") {
    val (id, info, builder) = graft.plans.Hash60.registryEntry
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    val got = spark.sql("SELECT hash60('hello world') AS h").head().getLong(0)
    assert(got == Hashing.hash60JVM("hello world"))
  }
}
