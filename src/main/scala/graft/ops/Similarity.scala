package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Two paths:
  *  - brute-force cosine top-k: exact, O(n^2) — the correctness baseline,
  *    oracle-checked at small scale;
  *  - random-hyperplane LSH buckets: the scale path — candidate generation is
  *    an equi-join on bucket keys, so cost tracks bucket occupancy instead of
  *    n^2. Multiple tables (bands of planes) trade recall for cost.
  *
  * All dot products are sequential double left-folds (Num.dot) so results are
  * bit-identical to the DuckDB oracle.
  */
object Similarity {

  /** cosine(a, b) with precomputed norms. */
  private def cosine(dp: Column, na: Column, nb: Column): Column = dp / (na * nb)

  /** (id, vec, norm) helper projection. */
  def withNorm(df: DataFrame, id: Column, vec: Column): DataFrame =
    df.select(id.as("vid"), vec.as("vec"), Num.norm(vec).as("nrm"))

  /** Exact top-k cosine neighbors per vector (excluding self).
    * Output: (query_id, neighbor_id, cosine, rank), rank 1..k, ties broken by
    * neighbor id.
    */
  def bruteForceTopK(df: DataFrame, id: Column, vec: Column, k: Int): DataFrame = {
    val a = withNorm(df, id, vec)
      .select(col("vid").as("query_id"), col("vec").as("va"), col("nrm").as("na"))
    val b = withNorm(df, id, vec)
      .select(col("vid").as("neighbor_id"), col("vec").as("vb"), col("nrm").as("nb"))
    val pairs = a.crossJoin(b)
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(Num.dot(col("va"), col("vb")), col("na"), col("nb")).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** All pairs with cosine >= threshold (embedding near-dup detection),
    * id_a < id_b.
    */
  def cosineNearDupPairs(df: DataFrame, id: Column, vec: Column, threshold: Double): DataFrame = {
    val a = withNorm(df, id, vec)
      .select(col("vid").as("id_a"), col("vec").as("va"), col("nrm").as("na"))
    val b = withNorm(df, id, vec)
      .select(col("vid").as("id_b"), col("vec").as("vb"), col("nrm").as("nb"))
    a.crossJoin(b)
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(Num.dot(col("va"), col("vb")), col("na"), col("nb")))
      .where(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Deterministic ±1 hyperplane component for (table, plane, dim) — derived
    * from the cross-engine hash so the DuckDB oracle can reproduce buckets.
    */
  def planeComponent(table: Int, plane: Int, dim: Column): Column =
    when(Hashing.hash60(concat(lit(s"pl-$table-$plane-"), dim.cast("string"))) % 2 === 1, lit(1.0))
      .otherwise(lit(-1.0))

  /** Signed-random-projection bucket id for one table: bit j of the bucket is
    * sign(<vec, plane_j>) where plane components are deterministic ±1.
    */
  def lshBucket(vec: Column, table: Int, numPlanes: Int): Column = {
    val bits = (0 until numPlanes).map { j =>
      // <vec, plane_j> = sum_d vec[d] * pm1(j, d): sequential double fold.
      val dot = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, d) => x.cast("double") * planeComponent(table, j, d)),
        lit(0.0), (acc, v) => acc + v)
      when(dot > 0, expr(s"shiftleft(CAST(1 AS BIGINT), $j)")).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed approximate top-k: exact cosine ranking within each
    * single-table bucket. `numTables` > 1 unions tables and dedups candidates
    * before ranking (higher recall, same join shape).
    */
  def lshTopK(
      df: DataFrame,
      id: Column,
      vec: Column,
      k: Int,
      numPlanes: Int,
      numTables: Int = 1): DataFrame = {
    val base = withNorm(df, id, vec)
    val buckets = (0 until numTables).map { t =>
      base.select(col("vid"), col("vec"), col("nrm"),
        lit(t).as("tbl"), lshBucket(col("vec"), t, numPlanes).as("bucket"))
    }.reduce(_ unionByName _)
    val a = buckets.select(col("tbl"), col("bucket"),
      col("vid").as("query_id"), col("vec").as("va"), col("nrm").as("na"))
    val b = buckets.select(col("tbl"), col("bucket"),
      col("vid").as("neighbor_id"), col("vec").as("vb"), col("nrm").as("nb"))
    val cands = a.join(b, Seq("tbl", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("va"), col("na"), col("vb"), col("nb"))
      .distinct()
    val scored = cands.select(col("query_id"), col("neighbor_id"),
      cosine(Num.dot(col("va"), col("vb")), col("na"), col("nb")).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
