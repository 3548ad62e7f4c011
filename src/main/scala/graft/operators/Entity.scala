package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Entity resolution: fuzzy-match a dirty catalog against a clean
  * dictionary with the block-then-verify shape every record-linkage
  * pipeline at scale uses — candidates come from an equi-join on an
  * edit-invariant blocking key (never an all-pairs cross join), the
  * expensive edit-distance verify runs only inside blocks, and the
  * best match per dirty row is a deterministic (distance, name) argmin.
  *
  * The driver instance derives the dirty side from part names by
  * dropping each name's second character — a deterministic corruption
  * both engines can recompute — and blocks on (first char, last char),
  * which that corruption provably preserves, so recall inside the
  * block is exact by construction. At 100 TB the blocking key becomes
  * a q-gram/phonetic signature with multiple keys per record (higher
  * recall, same join shape); `levenshtein` is codegen'd in-block.
  */
object Entity {

  def fuzzyMatch(s: SparkSession, d: String, maxDist: Int = 2)
      : DataFrame = {
    val clean = Tables.part(s, d).select(col("p_name")).distinct()
      .withColumn("bk", expr("concat(left(p_name, 1), right(p_name, 1))"))
    val dirty = Tables.part(s, d)
      .select(col("p_partkey").as("dirty_id"),
        expr("concat(left(p_name, 1), substring(p_name, 3))")
          .as("dirty_name"))
      .withColumn("bk",
        expr("concat(left(dirty_name, 1), right(dirty_name, 1))"))
    val w = Window.partitionBy(col("dirty_id"))
      .orderBy(col("dist"), col("p_name"))
    dirty.join(clean, "bk")
      .withColumn("dist", levenshtein(col("dirty_name"), col("p_name")))
      .filter(col("dist") <= maxDist)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("dirty_id"), col("dirty_name"),
        col("p_name").as("match_name"), col("dist"))
  }
}
