package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Fns._

/** Same-hardware scaling probe: runs two representative aggregations
  * over the sf0.1 tables replicated 32× in-plan (19.2M lineitem rows /
  * 160k documents), so per-query fixed overhead stops dominating and
  * the compute slope shows. Compare against the DuckDB numbers in
  * COMPARE.md. Usage: `runMain graft.ScaleProbe [replication]`.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // replicate via an exploded literal array — a codegen'd generator,
    // unlike crossJoin's nested-loop join which would dominate the probe
    def replicate(df: org.apache.spark.sql.DataFrame) =
      df.repartition(32) // single-file testdata = 1 scan task otherwise
        .withColumn("__rep",
          explode(lit((0 until reps).toArray))).drop("__rep")
    // warm
    noop(Tables.lineitem(spark, d).limit(10))

    val li = replicate(Tables.lineitem(spark, d))
    time(s"spark ${reps}x lineitem count-only") {
      noop(li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1))))
    }
    time(s"spark ${reps}x lineitem Q1 no-decimal") {
      noop(li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")), avg(col("l_extendedprice")),
          count(lit(1))))
    }
    time(s"spark ${reps}x lineitem Q1") {
      noop(li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")), r4(avg(col("l_extendedprice"))),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
          count(lit(1))))
    }
    val docs = replicate(Tables.documents(spark, d))
    time(s"spark ${reps}x documents token explode") {
      noop(docs
        .select(explode(graft.operators.TextOps.tokens(col("text")))
          .as("token"))
        .groupBy(col("token")).agg(count(lit(1))))
    }
    spark.stop()
  }
}
