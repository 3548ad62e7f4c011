package graft.operators

import graft.Tables
import graft.operators.TextOps.tokens
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline over `documents`:
  * exact (hash-groupBy), MinHash+LSH near-dup, and n-gram Jaccard
  * verification. Designed scale-first:
  *
  *  - Exact dedup groups on a 64-bit content hash, not the text itself —
  *    the shuffle carries 8-byte keys, not documents.
  *  - MinHash LSH never compares all pairs: docs shuffle once keyed by
  *    (band, bandHash); only same-bucket docs meet. With b bands of r
  *    rows, collision prob. is 1-(1-j^r)^b — a sharp threshold around
  *    j ≈ (1/b)^(1/r). Candidate pairs are then verified with true
  *    shingle-set Jaccard, so false positives cost only the verify join.
  *  - Everything is built-in array expressions — no UDFs, no driver
  *    loops, no collect.
  */
object Dedup {

  /** Exact dedup: canonical (min) doc id and copy count per distinct
    * content hash. Returns one row per distinct document.
    */
  def exact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(xxhash64(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))

  /** Word 3-gram shingles of a document, distinct. */
  def shingles(text: Column): Column = {
    val toks = tokens(text)
    array_distinct(
      when(size(toks) < 3, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(0), size(toks) - 3),
          i => concat_ws(" ",
            element_at(toks, i + 1),
            element_at(toks, i + 2),
            element_at(toks, i + 3)))))
  }

  /** MinHash signature: k independent permutations approximated by
    * seeding xxhash64 with the hash index. Array of k longs per doc.
    */
  def minhashSignature(text: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      h => array_min(transform(shingles(text),
        sh => xxhash64(sh, h))))

  /** MinHash+LSH near-duplicate pairs, verified with true Jaccard over
    * shingle sets. `bands` × `rowsPerBand` must equal the signature
    * length k. Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.
    */
  def minhashPairs(s: SparkSession, d: String,
      bands: Int = 4, rowsPerBand: Int = 4,
      threshold: Double = 0.7): DataFrame = {
    val k = bands * rowsPerBand
    val docs = Tables.documents(s, d).select(
      col("doc_id"),
      shingles(col("text")).as("sh"),
      minhashSignature(col("text"), k).as("sig"))
    // one row per (doc, band): bucket key = hash of that band's slice
    val banded = docs.select(
      col("doc_id"), col("sh"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          xxhash64(concat_ws(",",
            slice(col("sig"), b * rowsPerBand + lit(1), lit(rowsPerBand))))
            .as("bucket")))).as("bb"))
      .select(col("doc_id"), col("sh"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val a = banded.select(col("band"), col("bucket"),
      col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bucket"),
      col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val union = size(array_union(col("sh_a"), col("sh_b")))
    a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (inter.cast("double") / union).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= threshold)
  }

  /** Direct n-gram Jaccard among documents sharing a (lang, source)
    * blocking key — the exact-verification path when buckets are small
    * enough to pair exhaustively. The blocking key bounds the quadratic
    * term: at 100 TB you block on something with enough cardinality
    * that each block fits comfortably in a task.
    */
  def ngramJaccardPairs(s: SparkSession, d: String,
      threshold: Double = 0.5): DataFrame = {
    val docs = Tables.documents(s, d).select(
      col("lang"), col("source"), col("doc_id"),
      shingles(col("text")).as("sh"))
    val a = docs.select(col("lang"), col("source"),
      col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = docs.select(col("lang"), col("source"),
      col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val union = size(array_union(col("sh_a"), col("sh_b")))
    a.join(b, Seq("lang", "source"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (inter.cast("double") / union).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
