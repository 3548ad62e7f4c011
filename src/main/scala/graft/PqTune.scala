package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession

/** One-off recall sweep for the IVF-PQ geometry (tools-only, the
  * IvfTune pattern): recall@10 vs brute force over the registry's 5
  * queries at sf0.01, across (m, ksub, refine).
  */
object PqTune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val brute = Similarity.bruteForceTopK(spark, dir, nQueries = 5,
      k = 10).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (m <- Seq(8, 16); ksub <- Seq(16, 32);
         refine <- Seq(0, 50, 100)) {
      val got = Similarity.ivfPqTopK(spark, dir, m = m, ksub = ksub,
          refine = refine)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (brute & got).size.toDouble / brute.size
      println(f"m=$m%2d ksub=$ksub%3d refine=$refine%3d recall@10=$recall%.2f")
    }
    spark.stop()
  }
}
