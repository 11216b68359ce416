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
    * `events.ts` has shipped in two parquet layouts across driver testdata
    * generations, both of which need normalizing to Spark's session-TZ
    * TimestampType so downstream `unix_micros`/window arithmetic resolves:
    *
    *  - TIMESTAMP(NANOS): Spark's TimestampType (µs) cannot represent it —
    *    the vectorized reader rejects it outright ([PARQUET_TYPE_ILLEGAL]).
    *    We read nanos as raw longs (`spark.sql.legacy.parquet.nanosAsLong`)
    *    and truncate to µs with FLOOR division (`(ts - pmod(ts,1000)) div
    *    1000` — plain `div` truncates toward zero and would diverge by 1µs
    *    from DuckDB's `//` on pre-1970 timestamps).
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
    *    TIMESTAMP_NTZ (`spark.sql.parquet.inferTimestampNTZ.enabled`
    *    default). Sessions here pin timeZone=UTC, so the NTZ→TZ cast is a
    *    pure re-tag of the same µs value — exactly what DuckDB's naive
    *    read of the same file yields.
    *
    * Engine mains set the reader conf at session build; the conf fallback
    * only fires for externally-built sessions.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("(ts - pmod(ts, 1000)) div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          df.col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
    else df
  }

  /** DuckDB twin of the events loader: µs-truncated ts, same column set. */
  val duckEvents: String =
    "(SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, user_id, event_type, value, props FROM events)"
}
