package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shared storage-truth rewrite recipe behind every durable table's
  * right-to-be-forgotten path — [[AnnIndex.deleteStored]]'s mechanics
  * (affected-partition dynamic overwrite, emptied-directory drop,
  * whole-table fail-fast) extracted so the text-side index families
  * ([[TextIndex]], [[ParaIndex]], [[MinHashIndex]], [[SimHashIndex]],
  * [[WinnowIndex]]) delete from their stored BYTES with the same bounded
  * I/O shape: only the int-valued partitions actually holding removed rows
  * are rewritten; at 100 TB an index with thousands of hash-bucket
  * partitions rewrites the handful the removal set touches and never scans
  * the rest back out to disk.
  *
  * All three entry points share one bounded driver transfer: the affected /
  * surviving partition-value sets (capped by the table's partition fan-out
  * — 64 for every index family here — the k-rows doctrine, never corpus
  * rows).
  *
  * Serving-concurrency contract (the [[AnnIndex.deleteStored]] stance): do
  * not serve from the table while a rewrite runs; a crash between the
  * overwrite and the emptied-directory drops is repaired by re-running the
  * SAME delete (the overwrite is idempotent). Where concurrent serving
  * during maintenance is required, use the [[SnapTables]] manifest layer —
  * the same bounded-I/O rewrite published as an immutable generation
  * behind an atomic pointer flip (q412), which removes the contract
  * instead of documenting it.
  */
object StoredTables {

  /** Rewrite the `affected` partitions of the parquet table at `path`
    * (partitioned by int column `partCol`) to hold exactly `survivors`
    * (which must cover ONLY those partitions), then drop the directories of
    * partitions the rewrite emptied — dynamic partition overwrite only
    * replaces partitions PRESENT in the write, so a fully-emptied bucket
    * would otherwise silently keep its stale files. Fails BEFORE mutating
    * if the rewrite would empty the whole table: a zero-file table rejects
    * its next read with an opaque schema-inference error far from the
    * cause; dropping the table directory is the caller's explicit decision.
    */
  def overwriteAffected(
      spark: SparkSession,
      path: String,
      partCol: String,
      affected: Seq[Int],
      survivors: DataFrame): Unit = {
    if (affected.isEmpty) return
    // materialize BEFORE the overwrite: Spark (correctly) refuses to
    // overwrite a path its plan is still reading
    val surv = survivors.localCheckpoint()
    val still = surv.select(col(partCol)).distinct()
      .collect().map(_.getInt(0)).toSet
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    val existing = fs.listStatus(hp).map(_.getPath.getName)
      .filter(_.startsWith(s"$partCol="))
      .map(_.stripPrefix(s"$partCol=").toInt).toSet
    require((existing -- (affected.toSet -- still)).nonEmpty,
      s"deleteStored: the removal empties the whole table at $path — an empty " +
        "table has no readable parquet; drop the table directory instead")
    surv.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol).parquet(path)
    affected.filterNot(still).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/$partCol=$v"), true)
    }
  }

  /** Storage-truth key-filter delete for a PER-KEY-LOCAL table (every row
    * derives from its own `keyCol` entity alone — the locality that makes
    * append exact makes this delete exact): semi-join finds the partitions
    * holding removed rows, anti-join rewrites their survivors, emptied
    * directories drop. Rows of unaffected partitions are never rewritten.
    * No broadcast hint on the removal set (the [[AnnIndex.deleteStored]]
    * stance): a typical right-to-be-forgotten batch broadcasts under AQE on
    * its own; a bulk purge must degrade to a shuffled join, not OOM.
    */
  def deleteByKey(
      spark: SparkSession,
      path: String,
      partCol: String,
      keyCol: String,
      removedKeys: DataFrame): Unit =
    deleteByKeyPlan(spark.read.parquet(path), partCol, keyCol, removedKeys)
      .foreach { case (affected, survivors) =>
        overwriteAffected(spark, path, partCol, affected, survivors)
      }

  /** The key-filter delete PLAN, shared verbatim by the in-place recipe
    * ([[deleteByKey]]) and the snapshot layer ([[SnapTables.deleteByKey]]) —
    * one semi-join to find the affected partitions, one anti-join for their
    * survivors; publication is the only thing the two paths may differ on.
    * None when no stored row matches (the no-op case). The bounded driver
    * transfer is the affected partition-value set, capped by the table's
    * fan-out.
    */
  private[ops] def deleteByKeyPlan(
      tbl: DataFrame,
      partCol: String,
      keyCol: String,
      removedKeys: DataFrame): Option[(Seq[Int], DataFrame)] = {
    val rm = removedKeys.select(col(keyCol))
    val affected = tbl.join(rm, Seq(keyCol), "left_semi")
      .select(col(partCol)).distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    if (affected.isEmpty) return None
    Some((affected,
      tbl.where(col(partCol).isin(affected: _*))
        .join(rm, Seq(keyCol), "left_anti")))
  }

  /** Exact count RETRACTION on a stored additive side table (the q282
    * NB-retract precedent): `deltas` carries per-key counts to subtract
    * (column `__dec`); affected partitions rewrite with the decremented
    * counts, rows reaching zero drop entirely (a bucket no surviving
    * document occupies must not exist — its presence would shift serve-path
    * guards), and emptied partitions drop their directories. Because the
    * side tables are ADDITIVE under append (new docs contribute new rows /
    * increments), subtraction of the removed docs' own contributions is
    * exact — the maintained table equals a survivors-only recompute.
    */
  def decrementCounts(
      spark: SparkSession,
      path: String,
      partCol: String,
      keyCols: Seq[String],
      countCol: String,
      deltas: DataFrame): Unit =
    decrementPlan(spark.read.parquet(path), partCol, keyCols, countCol,
        deltas, at = path)
      .foreach { case (affected, survivors) =>
        overwriteAffected(spark, path, partCol, affected, survivors)
      }

  /** The exact-subtraction PLAN with all three guards, shared verbatim by
    * the in-place recipe ([[decrementCounts]]) and the snapshot layer
    * ([[SnapTables.decrementCounts]]) — a guard fixed here is fixed for
    * both publication paths. None when no stored key matches after the
    * guards pass (the no-op case); `at` names the table in guard messages.
    */
  private[ops] def decrementPlan(
      tbl: DataFrame,
      partCol: String,
      keyCols: Seq[String],
      countCol: String,
      deltas: DataFrame,
      at: String): Option[(Seq[Int], DataFrame)] = {
    // normalize FIRST: duplicate key rows in `deltas` (two retraction rows
    // for one key — a union of per-batch retractions) must subtract their
    // SUM once; joined raw they would fan out the left join, duplicating
    // each matched stored row with each copy decremented by only its own
    // share. Checkpointed so the two validation actions and the rewrite
    // never recompute the caller's lineage.
    val dec = deltas.groupBy(keyCols.map(col): _*)
      .agg(sum(col("__dec")).as("__dec")).localCheckpoint()
    // a retraction keyed on something the table never counted is a caller
    // bug (retracting never-ingested docs, or a DOUBLE-submitted retraction
    // whose first pass already dropped the key at zero) — a silent no-op
    // would leave the caller believing the retraction landed
    val unknown = dec
      .join(tbl.select(keyCols.map(col): _*), keyCols, "left_anti")
      .limit(1).collect()
    require(unknown.isEmpty,
      s"decrementCounts: retraction key ${unknown.headOption.getOrElse("")} has no " +
        s"row in the stored table at $at — retracting something never counted " +
        "(or already retracted); refusing the whole batch")
    val affected = tbl.join(dec, keyCols, "left_semi")
      .select(col(partCol)).distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    if (affected.isEmpty) return None
    val cols = tbl.columns.toSeq
    val decremented = tbl
      .where(col(partCol).isin(affected: _*))
      .join(dec, keyCols, "left")
      .withColumn(countCol, col(countCol) - coalesce(col("__dec"), lit(0L)))
      .localCheckpoint()
    // over-retraction (__dec exceeding the stored count) must FAIL, not
    // silently ride the `> 0` survivor filter into a full delete: on an
    // additive side table that failure mode means a double-submitted
    // retraction batch corrupts counts with no error. Keys retracting to
    // exactly zero are the legitimate full-retraction case and drop below.
    val over = decremented.where(col(countCol) < 0)
      .select(keyCols.map(col): _*).limit(1).collect()
    require(over.isEmpty,
      s"decrementCounts: retraction of key ${over.headOption.getOrElse("")} exceeds " +
        s"its stored count at $at (double-submitted retraction batch?); " +
        "refusing the whole batch before mutating")
    Some((affected,
      decremented.where(col(countCol) > 0).select(cols.map(col): _*)))
  }
}
