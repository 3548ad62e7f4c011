package graft

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GDPR-erasure lifecycle for the frozen-geometry vector tiers (IVF
  * assignments, IVF-PQ codes, LSH buckets): a tombstoned vector must
  * vanish from the serve WITHOUT a refit — the geometry (centroids /
  * codebooks / planes) is fit on the full corpus and held fixed, so an
  * index whose live rows equal the survivors serves EXACTLY what a
  * survivors-only build under the same geometry serves. Each family is
  * exercised lifecycle-real (80% base + committed append batch +
  * tombstones all live at once), then compacted, and every stage must
  * equal the survivors-built reference row-for-row.
  */
class AnnEraseSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"
  private def emb = Tables.embeddings(spark, d)
  private def probes = emb.filter(col("vec_id") < 5)
  private val survivors = col("vec_id") % 7 =!= 6
  private def doomed = emb.filter(col("vec_id") % 7 === 6)
    .select("vec_id")

  private def sorted(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.toString)

  /** Build the lifecycle-real deleted index: 80% base + one committed
    * append batch + a tombstone batch, all live at once.
    */
  private def grownDeleted(dir: String,
      write: (String, Option[org.apache.spark.sql.Column]) => Unit,
      append: (String, DataFrame) => Unit): Unit = {
    write(dir, Some(col("vec_id") % 5 =!= 4))
    append(dir, emb.filter(col("vec_id") % 5 === 4))
    Similarity.annDeleteIds(spark, dir, doomed, batchId = 1L)
  }

  private def checkFamily(name: String, table: String,
      partitionCol: String,
      write: (String, Option[org.apache.spark.sql.Column]) => Unit,
      append: (String, DataFrame) => Unit,
      serve: String => DataFrame): Unit = {
    // ground truth: survivors-only build under the SAME frozen
    // geometry (fits read the full corpus regardless of assignOnly)
    val ref = tmpDir(s"${name}_del_ref")
    write(ref, Some(survivors))
    val want = sorted(serve(ref))
    assert(want.nonEmpty)
    val idx = tmpDir(s"${name}_del")
    grownDeleted(idx, write, append)
    // tombstoned: base + batch + tombstones all live — the anti-join
    // restores the survivors' candidate set exactly
    assert(sorted(serve(idx)) === want, s"$name tombstoned serve")
    // no deleted id may rank anywhere
    assert(!serve(idx).collect().exists(_.getLong(1) % 7 == 6))
    // compaction folds the deletions into a fresh base, retires the
    // side dirs, and the minimal one-scan plan serves the same rows
    Similarity.compactAnnDeletes(spark, idx, table, partitionCol)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idx/tombstones")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$idx/${table}_batches")))
    assert(sorted(serve(idx)) === want, s"$name compacted serve")
    Similarity.compactAnnDeletes(spark, idx, table, partitionCol)
    assert(sorted(serve(idx)) === want, s"$name compaction re-run")
    assert(spark.read.parquet(s"$idx/$table").count()
      === emb.filter(survivors).count())
  }

  test("IVF: tombstoned vectors vanish from the frozen-geometry serve; " +
      "compaction preserves the survivors' ranking") {
    // non-vacuous: a doomed id ranks in the FULL index's top-k
    val fullIdx = tmpDir("ivf_full_probe")
    Similarity.ivfWriteIndex(spark, d, fullIdx)
    assert(Similarity.ivfTopKFromIndex(spark, fullIdx, probes)
      .collect().exists(_.getLong(1) % 7 == 6))
    checkFamily("ivf", "assignments", "cell",
      (dir, only) => Similarity.ivfWriteIndex(spark, d, dir,
        assignOnly = only),
      (dir, batch) => Similarity.ivfAppendBatch(spark, dir, batch,
        batchId = 1L),
      dir => Similarity.ivfTopKFromIndex(spark, dir, probes))
  }

  test("IVF-PQ: deletion reaches the compressed tier; the exact " +
      "re-rank cannot resurrect a tombstoned id (shortlist derives " +
      "from the live codes)") {
    checkFamily("ivfpq", "codes", "cell",
      (dir, only) => Similarity.ivfPqWriteIndex(spark, d, dir,
        assignOnly = only),
      (dir, batch) => Similarity.ivfPqAppendBatch(spark, dir, batch,
        batchId = 1L),
      dir => Similarity.ivfPqTopKFromIndex(spark, dir, probes,
        refine = 100, refineFrom = Some(emb)))
  }

  test("LSH: tombstoned vectors vanish from the bucket serve under " +
      "the frozen plane set") {
    checkFamily("lsh", "buckets", "bucket",
      (dir, only) => Similarity.lshWriteIndex(spark, d, dir,
        assignOnly = only),
      (dir, batch) => Similarity.lshAppendBatch(spark, dir, batch,
        batchId = 1L),
      dir => Similarity.annTopKFromIndex(spark, dir, probes))
  }
}
