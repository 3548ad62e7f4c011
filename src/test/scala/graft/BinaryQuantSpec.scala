package graft

import graft.operators.{BinaryQuant, Similarity}
import org.apache.spark.sql.functions._

/** The binary (1-bit sign) embedding tier: hand-computed packed words
  * (incl. the sign-of-zero rule and bit-63 edge), Hamming identity
  * against a direct bit count, exact brute-force parity after re-rank,
  * and inline ≡ served ≡ grown ≡ promoted parity through a persisted
  * bit table.
  */
class BinaryQuantSpec extends SparkSuite {
  import spark.implicits._

  private def plantEmb(rows: Seq[(Long, Array[Float], Int)]): String = {
    val dir = tmpDir("bq_emb")
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("packing matches hand-computed words, incl. sign-of-zero and " +
      "the partial trailing word") {
    // 66 dims: word 0 fully populated (bit 63 included), word 1 holds
    // dims 65-66 with 62 zero pad bits
    val v = Array.tabulate(66)(i =>
      if (i == 0 || i == 63 || i == 64) 1.0f
      else if (i == 65) -1.0f
      else if (i == 1) 0.0f // zero is non-negative: bit set
      else -0.25f)
    val got = BinaryQuant.packed(
      Tables.embeddings(spark, plantEmb(Seq((0L, v, 0))))
        .select("vec_id", "embedding"))
      .collect()(0).getSeq[Long](1)
    // word 0: bits 0, 1, 63
    assert(got === Seq((1L << 0) | (1L << 1) | (1L << 63), 1L))
  }

  test("an empty (corrupt) vector packs as one zero word and still " +
      "Hamming-scores against real vectors instead of nulling out") {
    val d = plantEmb(Seq(
      (0L, Array.empty[Float], 0),
      (1L, Array.fill(64)(1.0f), 0)))
    val w = BinaryQuant.packed(
      Tables.embeddings(spark, d).select("vec_id", "embedding"))
    val byId = w.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(byId(0L) === Seq(0L)) // not sequence(0,-1)'s two phantom words
    val ham = w.filter(col("vec_id") === 0L)
      .crossJoin(w.filter(col("vec_id") === 1L)
        .withColumnRenamed("words", "w2").drop("vec_id"))
      .select(BinaryQuant.hamming(col("words"), col("w2")))
      .collect()(0)
    assert(!ham.isNullAt(0) && ham.getLong(0) === 64L)
  }

  test("hamming equals a direct per-dimension sign-disagreement count") {
    val rnd = new scala.util.Random(11)
    val a = Array.fill(128)(rnd.nextFloat() * 2 - 1)
    val b = Array.fill(128)(rnd.nextFloat() * 2 - 1)
    val expected = a.zip(b).count { case (x, y) => (x >= 0) != (y >= 0) }
    val d = plantEmb(Seq((0L, a, 0), (1L, b, 0)))
    val w = BinaryQuant.packed(
      Tables.embeddings(spark, d).select("vec_id", "embedding"))
    val got = w.filter(col("vec_id") === 0L)
      .crossJoin(w.filter(col("vec_id") === 1L)
        .withColumnRenamed("words", "w2").drop("vec_id"))
      .select(BinaryQuant.hamming(col("words"), col("w2")))
      .collect()(0).getLong(0)
    assert(got === expected.toLong)
  }

  test("bqTopK recovers the exact brute-force ranking (sf0.001)") {
    val d = "/root/testdata/sf0.001"
    val brute = Similarity.bruteForceTopK(spark, d).collect()
      .map(_.toSeq).toSeq.sortBy(_.toString)
    val bq = BinaryQuant.bqTopK(spark, d).collect()
      .map(_.toSeq).toSeq.sortBy(_.toString)
    assert(bq === brute)
  }

  test("delete lifecycle: tombstoned vectors vanish from the bit-tier " +
      "serve and compaction folds them into a fresh base") {
    val d = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, d)
    val ref = tmpDir("bq_del_ref")
    BinaryQuant.bqWriteIndex(spark, d, ref,
      assignOnly = Some(col("vec_id") % 7 =!= 6))
    def rows(dir: String) = BinaryQuant.bqTopKFromIndex(spark, dir,
      emb.filter(col("vec_id") < 5), emb).collect()
      .map(_.toSeq).toSeq.sortBy(_.toString)
    val want = rows(ref)
    val idx = tmpDir("bq_del")
    BinaryQuant.bqWriteIndex(spark, d, idx,
      assignOnly = Some(col("vec_id") % 5 =!= 4))
    BinaryQuant.bqAppendBatch(spark, idx,
      emb.filter(col("vec_id") % 5 === 4), batchId = 1L)
    BinaryQuant.bqDeleteIds(spark, idx,
      emb.filter(col("vec_id") % 7 === 6).select("vec_id"), batchId = 1L)
    assert(rows(idx) === want)
    BinaryQuant.compactDeletes(spark, idx)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idx/tombstones")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$idx/words_batches")))
    assert(rows(idx) === want)
    assert(spark.read.parquet(s"$idx/words").count()
      === emb.filter(col("vec_id") % 7 =!= 6).count())
  }

  test("append + promote lifecycle serves the one-shot ranking at " +
      "every stage, and the bit audit round-trips the packer") {
    val d = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, d)
    val oneShot = BinaryQuant.bqTopK(spark, d).collect()
      .map(_.toSeq).toSeq.sortBy(_.toString)
    val idx = tmpDir("bq_lifecycle")
    BinaryQuant.bqWriteIndex(spark, d, idx,
      assignOnly = Some(col("vec_id") % 5 =!= 4))
    BinaryQuant.bqAppendBatch(spark, idx,
      emb.filter(col("vec_id") % 5 === 4), batchId = 1L)
    def served() = BinaryQuant.bqTopKFromIndex(spark, idx,
      emb.filter(col("vec_id") < 5), emb).collect()
      .map(_.toSeq).toSeq.sortBy(_.toString)
    assert(served() === oneShot) // grown
    BinaryQuant.promoteBatches(spark, idx)
    assert(served() === oneShot) // promoted: one-scan plan, same rows
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$idx/words_batches")))
    BinaryQuant.promoteBatches(spark, idx) // idempotent re-run
    assert(served() === oneShot)
    assert(spark.read.parquet(s"$idx/words").count() === emb.count())
    // every persisted bit equals the raw float's sign
    val audit = BinaryQuant.bitsAudit(spark, idx)
    val fresh = emb
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), (col("pos") + 1).cast("int").as("dim"),
        when(col("col") >= 0.0f, 1).otherwise(0).cast("int").as("bit"))
    assert(audit.exceptAll(fresh).isEmpty && fresh.exceptAll(audit).isEmpty)
  }
}
