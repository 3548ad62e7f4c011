package graft.operators

import graft.Tables
import graft.functions.Fns._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** CDC apply — merge a changelog into a dimension snapshot. The
  * reference's aggregate upsert (S13, `clickhouse_etl.py:339-346`)
  * is delete-then-insert over recomputed aggregates; this is the
  * general form a warehouse needs: compact the changelog to one
  * last-writer-wins row per key, then a single keyed full-outer merge
  * against the base. Matched keys take the change's value, unmatched
  * base rows pass through, unmatched changes insert.
  *
  * Scale shape: the compaction is one entity-keyed window (the same
  * shuffle the merge needs, so at 100 TB the co-partitioning is
  * reused), the merge one key-equality full-outer join — both linear,
  * nothing broadcast-dependent. In a transactional lake format the
  * merge output is the MERGE INTO write; here it is emitted as the
  * resulting snapshot with each row's disposition.
  */
object Cdc {

  /** Generic last-writer-wins upsert: `changes` rows win over `base`
    * rows on `key`; `ordCols` define the writer order within a key.
    * Presence is tracked by explicit markers (`in_base`/`in_change`),
    * never by value-null checks — a change legitimately carrying NULL
    * must still win the merge.
    */
  def upsert(base: DataFrame, changes: DataFrame, key: String,
      valueCol: String, ordCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(ordCols.map(c => col(c).desc): _*)
    val latest = changes
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .withColumnRenamed(valueCol, "new_value")
      .withColumn("in_change", lit(true))
    base.withColumn("in_base", lit(true))
      .join(latest, Seq(key), "full_outer")
  }

  /** The driver-visible instance: customer account balances merged
    * with each customer's latest purchase value (user_id ≡ c_custkey),
    * emitting the post-merge snapshot with per-row disposition.
    */
  def applyPurchases(s: SparkSession, d: String): DataFrame = {
    val base = Tables.customer(s, d)
      .select(col("c_custkey").as("key"), col("c_acctbal"))
    val changes = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("key"), col("value"),
        col("ts"), col("event_id"))
    upsert(base, changes, "key", "value", Seq("ts", "event_id"))
      .select(col("key"),
        r4(when(col("in_change"), col("new_value"))
          .otherwise(col("c_acctbal"))).as("acctbal"),
        when(col("in_base").isNull, "inserted")
          .when(col("in_change").isNull, "kept")
          .otherwise("updated").as("disposition"))
  }
}
