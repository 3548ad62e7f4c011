package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
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

  /** Morton (Z-order) interleave of two non-negative bin indexes of
    * `bits` bits each: bit k of `a` lands at position 2k, bit k of `b`
    * at 2k+1. A Scala-side fold over bit positions — 2·bits literal
    * shift/mask terms, all inside whole-stage codegen.
    */
  def zValue(a: Column, b: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, k) =>
      acc + shiftleft(shiftright(a, k) % 2, 2 * k) +
        shiftleft(shiftright(b, k) % 2, 2 * k + 1)
    }

  /** Z-ordered parquet layout over two numeric columns — the 2-D
    * data-skipping counterpart of the 1-D sorted layout: a single sort
    * key serves rectangle predicates on EITHER or BOTH columns, because
    * Morton order keeps row groups coherent in both dimensions at once,
    * so parquet min/max column stats prune them (the Delta/Iceberg
    * OPTIMIZE ZORDER BY shape, built from plain Spark writes).
    *
    * One min/max stats pass (single-row bounded collect) scales both
    * columns into 2^bits bins; rows then range-repartition + sort by
    * the interleaved key. The z column is dropped before the write —
    * the layout is invisible to readers, which is what makes the
    * rectangle query's oracle layout-independent.
    */
  def writeZordered(df: DataFrame, path: String, colA: String,
      colB: String, bits: Int = 16, partitions: Int = 0): Unit = {
    val st = df.agg(
      min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
    val (loA, hiA, loB, hiB) =
      (st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3))
    val binMax = (1L << bits) - 1
    def bin(c: String, lo: Long, hi: Long): Column =
      (((col(c).cast("long") - lo).cast("double") /
        math.max(hi - lo, 1L)) * binMax).cast("long")
    val n =
      if (partitions > 0) partitions
      else df.sparkSession.sparkContext.defaultParallelism
    df.withColumn("__z", zValue(bin(colA, loA, hiA), bin(colB, loB, hiB),
        bits))
      .repartitionByRange(n, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
