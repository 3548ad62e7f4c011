package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextOps}
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    val docs = Tables.documents(spark, d)
    time("warm read")(noop(docs))
    val toks = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
    time("tokens")(noop(toks))
    val sh2 = toks.select(col("doc_id"), Dedup.shinglesFromTokens(col("toks")).as("sh"))
    time("shingles")(noop(sh2))
    val shh = sh2.select(col("doc_id"), col("sh"), transform(col("sh"), x => xxhash64(x)).as("shh"))
    time("sh+hash")(noop(shh))
    val sig = shh.select(col("doc_id"), Dedup.minhashSignature(col("shh"), 16).as("sig"))
    time("signature")(noop(sig))
    time("full pairs")(noop(Dedup.minhashPairs(spark, d)))
    spark.stop()
  }
}
