package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout helpers — the write-side half of join/scan
  * performance at 100 TB:
  *
  *  - partitioned+sorted parquet (partition pruning + row-group
  *    min/max skipping), the MergeTree-ORDER-BY analog;
  *  - bucketed tables: both sides of a recurring equi-join bucketed by
  *    the key join WITHOUT a shuffle — the exchange disappears from the
  *    plan entirely, which is the single biggest win for repeated
  *    fact⋈fact joins at scale.
  */
object Layout {

  /** Partitioned, sorted-within-partition parquet. */
  def writePartitionedSorted(df: DataFrame, path: String,
      partitionCol: String, sortCols: Seq[String]): Unit =
    df.sortWithinPartitions((partitionCol +: sortCols).map(col): _*)
      .write.partitionBy(partitionCol).mode(SaveMode.Overwrite)
      .parquet(path)

  /** Bucket a DataFrame into a table, clustered and sorted by the join
    * key. Joins between two tables bucketed the same way plan as
    * shuffle-free sort-merge joins. `path` makes the table external
    * (data at a caller-owned location — the prepare hook uses this so
    * a fresh in-memory catalog never collides with a previous JVM's
    * managed location).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int, path: Option[String] = None): Unit = {
    val w = df.write
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .mode(SaveMode.Overwrite)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Co-located join of two same-bucketed tables. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
