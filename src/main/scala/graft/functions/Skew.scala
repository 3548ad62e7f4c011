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
    * The salt derives from xxhash64 over the big side's whole row, so
    * it is deterministic for a given row (no rand() → no re-execution
    * nondeterminism under task retries, which matters for exactly-once
    * sinks).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(big.columns.toIndexedSeq.map(col): _*),
        lit(salts)).cast("int"))
    val saltRange = explode(
      array((0 until salts).map(lit(_)): _*)).as("__salt")
    val smallS = small.select(col("*"), saltRange)
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
