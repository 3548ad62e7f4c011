package graft

import graft.operators.Graph

/** Integer PageRank: the distributed iteration against an independent
  * single-threaded reference of the same recurrence, hand-pinned
  * first-iteration values, and exactness invariants.
  */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  // a→x, b→x, b→y; x and y dangle
  private val edges = Seq(("a", "x"), ("b", "x"), ("b", "y"))

  /** The recurrence from Graph's scaladoc, computed naively. */
  private def reference(es: Seq[(String, String)], iters: Int)
      : Map[String, Long] = {
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val outdeg = es.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = (15L * (Graph.Scale / n)) / 100L
    var rank = nodes.map(_ -> Graph.Scale / n).toMap
    for (_ <- 1 to iters) {
      val dangShare = nodes.filterNot(outdeg.contains)
        .map(rank).sum / n
      val inflow = es.groupBy(_._2).view.mapValues(_.map { case (u, _) =>
        rank(u) / outdeg(u)
      }.sum).toMap
      rank = nodes.map(v => v ->
        (base + (85L * (inflow.getOrElse(v, 0L) + dangShare)) / 100L))
        .toMap
    }
    rank
  }

  private def run(iters: Int): Map[String, Long] =
    Graph.pageRankEdges(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("one iteration matches the hand-computed update") {
    // N=4, share=250e9, base=37.5e9; dang=5e11, dang/N=125e9;
    // inflow(x)=250e9+125e9, inflow(y)=125e9
    assert(run(1) === Map(
      "a" -> 143750000000L, "b" -> 143750000000L,
      "x" -> 462500000000L, "y" -> 250000000000L))
  }

  test("iterations 1-3 match the independent reference exactly") {
    for (i <- 1 to 3) assert(run(i) === reference(edges, i), s"iter $i")
  }

  test("ranks are exact: independent of shuffle width") {
    val narrow = run(2)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "17")
      assert(run(2) === narrow)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("authority ordering on the testdata graph is sane (sf0.001)") {
    val ranks = Graph.pageRank(spark, sf(), iters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val (supp, cust) = ranks.partition(_._1.startsWith("s"))
    assert(supp.nonEmpty && cust.nonEmpty)
    // suppliers absorb customer mass: the max supplier outranks every
    // customer (customers share the same no-inflow rank)
    assert(supp.map(_._2).max > cust.map(_._2).max)
    assert(cust.map(_._2).distinct.length === 1)
  }
}
