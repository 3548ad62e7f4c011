package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join split handles most cases
  * at runtime; explicit salting remains the tool when one join key
  * dominates so heavily that even split partitions overwhelm a task
  * (the classic null-key / celebrity-key problem at 100 TB).
  */
object Skew {

  /** The per-row salt. Two modes:
    *
    *  - `idCols` provided (PREFERRED): salt = hash of the row's unique
    *    identity columns — fully deterministic (independent of
    *    partitioning, row order, retries, AQE re-plans) AND full
    *    spread, since identical payloads still carry distinct ids. At
    *    100 TB every fact row has an ingest-unique key; use it.
    *  - no `idCols` (fallback): hash of the whole row content plus
    *    `spark_partition_id()`. Retry-stable (the partition id does not
    *    depend on intra-partition row order, unlike
    *    `monotonically_increasing_id`'s offset), but byte-identical
    *    rows CO-RESIDENT in one partition share a salt — and when the
    *    input is hash-partitioned BY THE JOIN KEY (a groupBy output,
    *    or one small split), every identical copy of the hot key sits
    *    in one partition and the spread collapses to a single salt.
    *    The fallback is only effective when identical hot rows span
    *    partitions (file scans of a large table); callers in the
    *    collapsed case must pass `idCols`.
    */
  private[graft] def saltCol(big: DataFrame, idCols: Seq[String],
      salts: Int): Column = {
    val h =
      if (idCols.nonEmpty) xxhash64(idCols.map(col): _*)
      else xxhash64((big.columns.toIndexedSeq.map(col) :+
        spark_partition_id()): _*)
    pmod(h, lit(salts)).cast("int")
  }

  /** Salted equi-join: the big (skewed) side gets a per-row salt in
    * [0, salts); the small side is replicated once per salt value; the
    * join key becomes (key, salt), spreading each hot key over `salts`
    * tasks. Result equals `big.join(small, key)` exactly — the salt
    * columns never escape. Pass the big side's unique identity columns
    * as `idCols` for a salt that is both deterministic and fully
    * spread (see [[saltCol]] for the two modes and the fallback's
    * documented collapse case).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int, idCols: Seq[String] = Nil): DataFrame = {
    require(salts > 0, "salts must be positive")
    val bigS = big.withColumn("__salt", saltCol(big, idCols, salts))
    val saltRange = explode(
      array((0 until salts).map(lit(_)): _*)).as("__salt")
    val smallS = small.select(col("*"), saltRange)
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
