package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage timing for q_novelty — which piece of the
  * shingle→first-seen→score pipeline costs the 6 s at sf0.1?
  */
object NoveltyProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("novelty-probe").getOrCreate()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.Tables.parallelized(
      graft.Tables.documents(s, d).select(col("doc_id"), col("text")))
    // stage 1: tokenize only
    t("tokenize+count") {
      docs.select(col("doc_id"),
        graft.operators.TextOps.tokens(col("text")).as("toks"))
        .selectExpr("sum(size(toks))").collect()
    }
    // stage 2: shingle strings
    val sh = docs
      .select(col("doc_id"),
        graft.operators.TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        graft.operators.Dedup.shinglesFromTokens(col("toks")).as("sh"))
    t("shingle strings") { sh.selectExpr("sum(size(sh))").collect() }
    // stage 3: + hash + sort
    val shh = sh.select(col("doc_id"),
      array_sort(transform(col("sh"), x => xxhash64(x))).as("shh"))
    t("shingle+hash+sort") { shh.selectExpr("sum(size(shh))").collect() }
    // stage 3b: hash without sort
    val shhNs = sh.select(col("doc_id"),
      transform(col("sh"), x => xxhash64(x)).as("shh"))
    t("shingle+hash (no sort)") {
      shhNs.selectExpr("sum(size(shh))").collect()
    }
    // force the hash transform + sort (sum(size()) gets simplified
    // past size-preserving lambdas, so stage 3 lied)
    t("forced hash+sort") {
      shh.selectExpr("max(aggregate(shh, 0L, (a, x) -> a ^ x))")
        .collect()
    }
    // codegen alternative: explode shingle STRINGS, hash per row
    t("explode strings+xxhash64") {
      sh.select(col("doc_id"), explode(col("sh")).as("shingle"))
        .select(col("doc_id"), xxhash64(col("shingle")).as("g"))
        .selectExpr("count(*)", "max(g)").collect()
    }
    println(s"[probe] docs partitions: ${docs.rdd.getNumPartitions}, " +
      s"docs rows: ${docs.count()}")
    println("[probe] gram occurrences: " +
      shh.selectExpr("sum(size(shh))").collect()(0).getLong(0))
    t("explode+count repart32") {
      shh.repartition(32)
        .select(col("doc_id"), explode(col("shh")).as("g")).count()
    }
    // boilerplate-style: positions explode + slice hash
    t("boilerplate-style grams") {
      docs.select(col("doc_id"),
          graft.operators.TextOps.tokens(col("text")).as("ts"))
        .select(col("doc_id"), col("ts"),
          explode(when(size(col("ts")) >= 3,
            sequence(lit(1), size(col("ts")) - 2))
            .otherwise(array())).as("p"))
        .select(col("doc_id"),
          xxhash64(array_join(slice(col("ts"), col("p"), lit(3)), " "))
            .as("g"))
        .selectExpr("count(*)", "max(g)").collect()
    }
    // materialize the 5k-row array frame FIRST, then explode an
    // attribute — the generator no longer carries computed input
    t("ckpt arrays, then explode") {
      val m = shh.localCheckpoint()
      m.select(col("doc_id"), explode(col("shh")).as("g")).count()
    }
    t("no-sort ckpt arrays+explode") {
      val m = shhNs.localCheckpoint()
      m.select(col("doc_id"), explode(col("shh")).as("g")).count()
    }
    // stage 4 variants: explode alone, persist, checkpoint
    t("explode+count") {
      shh.select(col("doc_id"), explode(col("shh")).as("g")).count()
    }
    t("explode+persist+count") {
      val p = shh.select(col("doc_id"), explode(col("shh")).as("g"))
        .persist()
      p.count(); p.unpersist(true)
    }
    val grams = t("explode+checkpoint") {
      shh.select(col("doc_id"), explode(col("shh")).as("g"))
        .localCheckpoint()
    }
    // stage 5: first-seen aggregate
    val fs = t("first-seen agg+ckpt") {
      grams.groupBy(col("g"))
        .agg(min(col("doc_id")).as("first_doc"), count(lit(1)).as("df"))
        .localCheckpoint()
    }
    // stage 6: score join
    t("score join+agg") {
      val cold = fs.filter(col("df") < 1024)
        .select(col("g"), col("first_doc").as("fd_cold"))
      val hot = fs.filter(col("df") >= 1024)
        .select(col("g"), col("first_doc").as("fd_hot"))
      val probed = grams.join(broadcast(hot), Seq("g"), "left")
      val hotDone = probed.filter(col("fd_hot").isNotNull)
        .select(col("doc_id"), col("fd_hot").as("first_doc"))
      val coldDone = probed.filter(col("fd_hot").isNull)
        .join(cold, Seq("g"), "left")
        .select(col("doc_id"),
          coalesce(col("fd_cold"), col("doc_id")).as("first_doc"))
      hotDone.unionByName(coldDone)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          count(when(col("first_doc") === col("doc_id"), 1)).as("n_novel"))
        .collect()
    }
    t("full novelty (api)") {
      graft.operators.Dedup.novelty(s, d).collect()
    }
    s.stop()
  }
}
