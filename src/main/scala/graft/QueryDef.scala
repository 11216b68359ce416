package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query in the engine's public catalog.
  *
  * @param name   stable identifier (drives `SparkEntry.queries` and the
  *               driver's correctness/bench harnesses)
  * @param fn     (spark, sfDir) => result; sfDir points at a testdata scale
  *               factor directory (TESTDATA.md)
  * @param oracle equivalent ANSI SQL runnable by DuckDB over the same parquet
  *               tables (table names = bare table names); None when the query
  *               is not SQL-expressible (driver falls back to rows-only check)
  * @param bench  include in the headline benchmark set (Bench.scala). Queries
  *               that are intentionally quadratic oracles (brute-force
  *               similarity) are excluded and represented by their scalable
  *               variants instead.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = true
)

object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one testdata table.
    *
    * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * TimestampType (µs) cannot represent — the vectorized reader rejects it
    * outright ([PARQUET_TYPE_ILLEGAL]). We read nanos as raw longs
    * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to µs with FLOOR
    * division (`(ts - pmod(ts,1000)) div 1000` — plain `div` truncates toward
    * zero and would diverge by 1µs from DuckDB's `//` on pre-1970
    * timestamps). Engine mains set the reader conf at session build; this
    * fallback only fires for externally-built sessions.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("(ts - pmod(ts, 1000)) div 1000")))
    else df
  }

  /** DuckDB twin of the events loader: µs-truncated ts, same column set. */
  val duckEvents: String =
    "(SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, user_id, event_type, value, props FROM events)"
}
