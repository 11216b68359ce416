package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.{Articles, DataGen}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query catalog is assembled from per-area groups; every entry with an
  * oracle participates in the DuckDB hash-match correctness gate.
  */
object SparkEntry {

  /** Per-area groups in stable order — the unit of session isolation for
    * `Bench --isolated` (fresh SparkSession per group).
    */
  val catalogGroups: Seq[(String, Seq[QueryDef])] = Seq(
    "core" -> CoreQueries.defs,
    "relational" -> RelationalQueries.defs,
    "text" -> TextQueries.defs,
    "dedup" -> DedupQueries.defs,
    "similarity" -> SimilarityQueries.defs,
    "media" -> MediaQueries.defs,
    "pipeline" -> PipelineQueries.defs)

  /** Full catalog, in stable order. */
  val catalog: Seq[QueryDef] = catalogGroups.flatMap(_._2)

  /** Flagship query: the reference's own pipeline (envelope → parse → enrich
    * → windowed avg word count per author), run on seeded generated articles
    * at sf0.001-ish volume. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val envelope = DataGen.articles(spark, n = 6000L)
    Articles.pipeline(envelope)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted for non-SQL-expressible ops (driver records
    * a weaker rows-only check).
    */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Headline benchmark subset (scale-representative; excludes the
    * intentionally-quadratic oracle variants).
    */
  def benchQueries: Seq[QueryDef] = catalog.filter(_.bench)
}
