package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession

/** IVF parameter sweep: recall@10 vs brute force for (nCells, nProbe)
  * grids at a given SF dir — the measurement behind the defaults in
  * [[graft.operators.Similarity.ivfTopK]]. Run:
  * `sbt "runMain graft.IvfTune /root/testdata/sf0.01"`.
  */
object IvfTune {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val brute = Similarity.bruteForceTopK(spark, dir, nQueries = 5, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for {
      nCells <- Seq(16, 32)
      nProbe <- Seq(6, 8, 10, 12)
    } {
      val t0 = System.nanoTime()
      val ivf = Similarity.ivfTopK(spark, dir, nCells = nCells,
        nQueries = 5, k = 10, nProbe = nProbe)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = (brute & ivf).size.toDouble / brute.size
      println(f"cells=$nCells%3d probe=$nProbe%2d " +
        f"recall@10=$recall%.3f  ${sec}%.2fs")
    }
    spark.stop()
  }
}
