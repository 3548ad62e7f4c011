package graft

import graft.operators.Shard
import org.apache.spark.sql.functions._

/** Training-shard permutation: hand-computed hash assignment, the
  * writer/audit agreement (file order IS the training order), and
  * shard balance on real data.
  */
class ShardSpec extends SparkSuite {
  import spark.implicits._

  test("assignment matches the closed-form hash permutation") {
    val d = tmpDir("shard_docs")
    (0L until 20L).map(i => (i, s"doc $i", "en", "src0", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$d/documents.parquet")
    val got = Shard.trainShards(spark, d, nShards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val expected = (0L until 20L).map { id =>
      (id, (id * 2654435761L) % 4294967296L)
    }.groupBy(t => (t._2 % 4).toInt)
      .flatMap { case (shard, members) =>
        members.sortBy(t => (t._2, t._1)).zipWithIndex
          .map { case ((id, _), i) => (id, shard, i + 1) }
      }.toSeq
    assert(got.sortBy(_._1).toSeq === expected.sortBy(_._1))
  }

  test("written shards stream in pos order and cover the corpus " +
      "(sf0.001)") {
    val d = "/root/testdata/sf0.001"
    val out = tmpDir("shards_out")
    Shard.writeShards(spark, d, out, nShards = 4)
    val audit = Shard.trainShards(spark, d, nShards = 4)
    val back = spark.read.parquet(out)
    assert(back.count() === Tables.documents(spark, d).count())
    // per shard: the file's physical row order equals the audit's pos
    // order (monotone file offsets once Spark tags input order)
    (0 until 4).foreach { sh =>
      val fileOrder = spark.read.parquet(s"$out/shard=$sh")
        .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
      val posOrder = audit.filter(col("shard") === sh)
        .orderBy("pos").select("doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(fileOrder === posOrder, s"shard $sh order")
    }
    // balance: no shard holds more than 2× its fair share
    val sizes = audit.groupBy("shard").count()
      .collect().map(_.getLong(1))
    assert(sizes.length === 4 && sizes.max <= 2 * sizes.min,
      sizes.mkString(","))
  }

  test("leakage-safe split keeps every near-dup component on one side " +
      "and matches the closed-form hash-range cut") {
    val d = tmpDir("leakage_docs")
    val trio = (1 to 40).map(i => s"tok$i").mkString(" ")
    val duo = (1 to 40).map(i => s"other$i").mkString(" ")
    val docs = (Seq(0L, 1L, 2L).map(i => (i, trio)) ++
      Seq(10L, 11L).map(i => (i, duo)) ++
      (20L to 29L).map(i => (i, (1 to 40).map(j => s"u${i}x$j")
        .mkString(" "))))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    docs.coalesce(1).write.mode("overwrite")
      .parquet(s"$d/documents.parquet")
    val got = Shard.leakageSafeSplit(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.length === 15) // one row per doc, no dup assignment
    val byDoc = got.map(t => t._1 -> t).toMap
    // component-min representatives: the trio collapses on 0, the duo
    // on 10, singletons label themselves
    Seq(0L, 1L, 2L).foreach(i => assert(byDoc(i)._2 === 0L, s"doc $i"))
    Seq(10L, 11L).foreach(i => assert(byDoc(i)._2 === 10L, s"doc $i"))
    (20L to 29L).foreach(i => assert(byDoc(i)._2 === i, s"doc $i"))
    // no component straddles a boundary
    assert(got.groupBy(_._2).values.forall(_.map(_._3).distinct.size == 1))
    // assignment is the closed-form Knuth hash-range cut of the rep
    got.foreach { case (id, rep, split) =>
      val h = (rep * 2654435761L) % 4294967296L
      val want =
        if (h < 4294967296L * 80 / 100) "train"
        else if (h < 4294967296L * 90 / 100) "val"
        else "test"
      assert(split === want, s"doc $id rep $rep")
    }
  }

  test("stratified split cuts every stratum at exact integer " +
      "fractions and is re-run deterministic (sf0.001)") {
    val d = "/root/testdata/sf0.001"
    val split = Shard.stratifiedSplit(spark, d)
    val got = split.groupBy("lang", "split").count().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val perLang = Tables.documents(spark, d).groupBy("lang").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    perLang.foreach { case (lang, n) =>
      val train = n * 80 / 100
      val valN = n * 10 / 100
      assert(got.getOrElse((lang, "train"), 0L) === train, s"$lang train")
      assert(got.getOrElse((lang, "val"), 0L) === valN, s"$lang val")
      assert(got.getOrElse((lang, "test"), 0L) === n - train - valN,
        s"$lang test")
    }
    // determinism: a second evaluation assigns identically
    val a = split.collect().map(_.toSeq).sortBy(_.toString)
    val b = Shard.stratifiedSplit(spark, d).collect()
      .map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq === b.toSeq)
  }
}
