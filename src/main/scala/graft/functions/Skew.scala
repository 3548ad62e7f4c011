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
    * `spark_partition_id()`. Row content alone is not enough entropy in
    * exactly the worst case: the classic null/default hot key often
    * carries IDENTICAL payloads (same key, same defaulted columns), and
    * hashing only the content would land every copy on ONE salt — the
    * spread silently degrading exactly when skew peaks. Mixing the
    * partition id spreads identical rows across partitions too. Still
    * no rand(), and — unlike `monotonically_increasing_id`, which
    * encodes the row's intra-partition OFFSET — the partition id does
    * not depend on row order within a partition: a partial stage retry
    * that recomputes a map task with rows in a different order still
    * assigns every row the same salt, because the row→partition mapping
    * is content-determined (hash shuffles) or split-determined (file
    * scans; round-robin repartitions sort locally first —
    * `spark.sql.execution.sortBeforeRepartition`). That order-
    * independence is what makes the join key deterministic under
    * retries — the indeterminate-key failure mode (row loss or
    * duplication on retry) cannot occur. The accepted cost: byte-
    * identical rows CO-RESIDENT in one partition share a salt, so the
    * spread for a hot key of identical payloads is bounded by how many
    * partitions carry it — at 100 TB a hot key spans many input splits,
    * which is exactly the case salting exists for.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val bigS = big.withColumn("__salt",
      pmod(xxhash64((big.columns.toIndexedSeq.map(col) :+
          spark_partition_id()): _*),
        lit(salts)).cast("int"))
    val saltRange = explode(
      array((0 until salts).map(lit(_)): _*)).as("__salt")
    val smallS = small.select(col("*"), saltRange)
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
