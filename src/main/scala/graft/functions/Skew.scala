package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join split handles most cases
  * at runtime; explicit salting remains the tool when one join key
  * dominates so heavily that even split partitions overwhelm a task
  * (the classic null-key / celebrity-key problem at 100 TB).
  */
object Skew {

  /** Salted equi-join: the big (skewed) side gets a per-row salt in
    * [0, salts); the small side is replicated once per salt value; the
    * join key becomes (key, salt), spreading each hot key over `salts`
    * tasks. Result equals `big.join(small, key)` exactly — the salt
    * columns never escape.
    *
    * The salt derives from xxhash64 over the big side's whole row PLUS
    * the row's position (`monotonically_increasing_id`). Row content
    * alone is not enough entropy in exactly the worst case: the classic
    * null/default hot key often carries IDENTICAL payloads (same key,
    * same defaulted columns), and hashing only the content would land
    * every copy on ONE salt — the spread silently degrading exactly
    * when skew peaks. Mixing the position spreads identical rows too.
    * Still no rand(): the id is a function of partition id and
    * intra-partition offset, so a task RETRY over the same input split
    * recomputes the same salts (what matters for exactly-once sinks) —
    * though unlike the pure-content hash, a different upstream
    * partitioning produces a different (equally valid) spread.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val bigS = big.withColumn("__salt",
      pmod(xxhash64((big.columns.toIndexedSeq.map(col) :+
          monotonically_increasing_id()): _*),
        lit(salts)).cast("int"))
    val saltRange = explode(
      array((0 until salts).map(lit(_)): _*)).as("__salt")
    val smallS = small.select(col("*"), saltRange)
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
