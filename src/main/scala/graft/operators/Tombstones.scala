package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Logical deletes for the persisted lake indexes — the GDPR-erasure
  * leg of the index lifecycle (build → append → promote/refit →
  * DELETE → compact). An erasure request must take effect without
  * rewriting a 100 TB index: the deleted keys land in a tiny
  * `tombstones/batch=<id>` side table, every serve path anti-joins it
  * (tombstones are erasure-request-sized, so the anti-join broadcasts),
  * and the admin-cadence compaction folds the deletions into a fresh
  * base and retires the tombstones — returning the serve to its
  * minimal no-anti-join plan.
  *
  * Shared by the index families that own a per-row key table:
  * [[ScalarQuant]] / [[BinaryQuant]] (vec_id-keyed codes/bits) and
  * [[Search]] (doc_id-keyed postings; its tombstones also carry the
  * deleted doc's length so the corpus scalars N / Σdl adjust by exact
  * subtraction at serve time). Batch dirs are overwritten whole and
  * keyed by `batchId`, so retries are exactly-once — the
  * [[ScalarQuant.sqAppendBatch]] convention.
  */
object Tombstones {

  private def root(indexDir: String) = s"$indexDir/tombstones"

  /** Record a delete batch: `rows` carries the keys to erase (plus any
    * per-key adjustment columns the family needs). Overwrites its own
    * `batch=<id>` dir whole — re-running a failed request heals it.
    */
  def append(s: SparkSession, indexDir: String, rows: DataFrame,
      batchId: Long): Unit =
    rows.write.mode("overwrite")
      .parquet(s"${root(indexDir)}/batch=$batchId")

  /** All committed delete batches, or None when the index has no
    * pending deletions — the serve paths skip the anti-join entirely
    * then, keeping the undeleted plan minimal.
    */
  def read(s: SparkSession, indexDir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(root(indexDir))
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(s.read.parquet(p.toString).drop("batch"))
  }

  /** Retire every tombstone batch — called by the families' compaction
    * AFTER the rewritten base is swapped in (the staged-publish order:
    * a crash between swap and retire leaves tombstones whose keys are
    * already absent, and the serve-time anti-join of an absent key is
    * a no-op, so nothing double-deletes).
    */
  def clear(s: SparkSession, indexDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(root(indexDir))
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
  }
}
