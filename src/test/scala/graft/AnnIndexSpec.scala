package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{AnnIndex, IvfPqIndex, Similarity}

/** The persisted-index lifecycle: build == write+read, append == rebuild
  * encode, and the stored-table serve path returns exactly what the
  * in-query trainer (q95/q99's `ivfPqTopK`) returns.
  */
class AnnIndexSpec extends AnyFunSuite with SparkSpec {

  private val sf = TestSpark.sf0001

  private def emb = Tables.load(spark, sf, "embeddings")

  private def coarseOf(df: DataFrame) =
    Similarity.materializeCentroids(Similarity.centroidArrays(
      Similarity.labelCentroidsFlat(df, col("embedding"), col("label"))))

  private def buildOn(df: DataFrame): IvfPqIndex =
    AnnIndex.build(df, col("vec_id"), col("embedding"), coarseOf(df),
      dims = 64, m = 8, k = 16, iters = 1)

  private def searchRows(idx: IvfPqIndex, queries: DataFrame): Set[(Long, Long, Int)] =
    AnnIndex.search(queries, col("vec_id"), col("embedding"), 3, idx, nprobe = 2)
      .select(col("query_id").cast("long"), col("neighbor_id").cast("long"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  private def codeRows(codes: DataFrame): Set[(Long, String)] =
    codes.select(col("vid").cast("long"),
        concat_ws(",", col("cluster"), concat_ws("-", col("codes"))).as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("write + read roundtrip: params survive and the read-back index serves identical results") {
    val idx = buildOn(emb)
    val dir = tmpDir("ann-idx")
    AnnIndex.write(idx, dir)
    val stored = AnnIndex.read(spark, dir)
    assert((stored.dims, stored.m, stored.codewords) == (idx.dims, idx.m, idx.codewords))
    assert(codeRows(stored.codes) == codeRows(idx.codes),
      "stored posting lists must match the built index exactly")
    val queries = emb.where(pmod(col("vec_id"), lit(10)) === 0)
    assert(searchRows(stored, queries) == searchRows(idx, queries),
      "search from the read-back index must equal search from the built index")
  }

  test("incremental append == full rebuild encode under the frozen model") {
    val base = emb.where(pmod(col("vec_id"), lit(7)) =!= 0)
    val delta = emb.where(pmod(col("vec_id"), lit(7)) === 0)
    val idx = buildOn(base)
    val appended = AnnIndex.append(idx,
      AnnIndex.encode(delta, col("vec_id"), col("embedding"), idx))
    val rebuilt = AnnIndex.encode(emb, col("vec_id"), col("embedding"), idx)
    assert(codeRows(appended.codes) == codeRows(rebuilt),
      "appending the frozen-model delta must equal re-encoding the union")
    assert(appended.codes.count() == emb.count(), "one posting row per vector")
  }

  test("stored-table serve path == in-query ivfPqTopK (same ADC, same ranks)") {
    val idx = buildOn(emb)
    val inQuery = Similarity.ivfPqTopK(emb, col("vec_id"), col("embedding"), 3,
        idx.centroids, idx.codebooks, dims = 64, m = 8, nprobe = 2)
      .select(col("query_id").cast("long"), col("neighbor_id").cast("long"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(searchRows(idx, emb) == inQuery,
      "the serve path must reproduce the in-query trainer's results exactly")
  }

  test("delete: exact key filter on the posting lists; removed vectors never serve") {
    val idx = buildOn(emb)
    val removed = emb.where(pmod(col("vec_id"), lit(11)) === 0)
      .select(col("vec_id").as("vid"))
    val removedIds = removed.collect().map(_.getLong(0)).toSet
    assert(removedIds.nonEmpty, "test needs a nonempty delete set")
    val kept = AnnIndex.delete(idx, removed)
    // codes: exactly the removed vids gone, survivors byte-identical
    assert(codeRows(kept.codes) ==
      codeRows(idx.codes).filterNot { case (vid, _) => removedIds.contains(vid) },
      "delete must be an exact key filter on the posting lists")
    // model tables untouched (frozen by design — retrain = new build)
    assert(kept.centroids eq idx.centroids)
    assert(kept.codebooks eq idx.codebooks)
    // a removed vector can still QUERY, but never serves as a neighbor
    val queries = emb.where(pmod(col("vec_id"), lit(10)) === 0)
    val rows = searchRows(kept, queries)
    assert(rows.nonEmpty)
    assert(!rows.exists { case (_, nb, _) => removedIds.contains(nb) },
      "post-delete serve must never return a removed vector")
  }

  test("reconstructionError: an out-of-range code EXCLUDES the vector instead of underreporting") {
    val idx = buildOn(emb)
    val base = AnnIndex.reconstructionError(emb, col("vec_id"), col("embedding"), idx)
    assert(base.count() == idx.codes.count(),
      "well-formed index: one audit row per indexed vector")
    assert(base.agg(min(col("err"))).head().getDouble(0) >= 0.0)
    // corrupt ONE row's first code to an impossible codeword: the joinless
    // subspace must drop the whole vector from the audit (a zero-filled
    // pivot would report a spuriously LOW error — the inversion of the
    // metric's purpose)
    val badVid = idx.codes.agg(min(col("vid"))).head().getLong(0)
    val corrupted = idx.copy(codes = idx.codes.withColumn("codes",
      when(col("vid") === badVid,
        concat(array(lit(999)), slice(col("codes"), 2, idx.m - 1)))
        .otherwise(col("codes"))))
    val audited = AnnIndex.reconstructionError(emb, col("vec_id"),
      col("embedding"), corrupted)
    assert(audited.count() == base.count() - 1)
    assert(audited.where(col("vid") === badVid).isEmpty,
      "the corrupt-coded vector must vanish from the audit, not read as near-zero error")
  }
}
