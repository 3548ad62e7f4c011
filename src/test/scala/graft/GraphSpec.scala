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

  test("triangle counts: hand-counted planted graph, celebrity node " +
      "included") {
    // K4 on 1-4 (each member of C(3,2)=3 triangles) + a celebrity hub
    // 9 connected to 1,2,5,6,7,8: adds triangle {1,2,9} only (5-8 are
    // mutually unconnected). Hand count: 1,2 → 4; 3,4 → 3; 9 → 1;
    // 5-8 → 0 triangles (absent from the output).
    val es = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 9L), (2L, 9L), (5L, 9L), (6L, 9L), (7L, 9L),
      (8L, 9L))
    val got = Graph.triangleCountsOfEdges(es.toDF("p1", "p2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 4L, 2L -> 4L, 3L -> 3L, 4L -> 3L,
      9L -> 1L))
  }

  test("triangle counts match an independent id-ordered 3-way join " +
      "on the full sf0.001 co-purchase graph") {
    import org.apache.spark.sql.functions._
    val e = graft.operators.Relational.coPurchase(spark, sf(), 1)
      .select(col("p1"), col("p2")).cache()
    val wedge = e.as("e1").join(e.as("e2"),
        col("e1.p2") === col("e2.p1"))
      .select(col("e1.p1").as("a"), col("e1.p2").as("b"),
        col("e2.p2").as("c"))
    val tri = wedge.join(e.as("e3"),
      col("a") === col("e3.p1") && col("c") === col("e3.p2"))
    val naive = tri.select(explode(array(col("a"), col("b"), col("c")))
        .as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Graph.triangleCountsOfEdges(e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty && got === naive)
  }

  test("k-hop BFS: hand-traced chain with a shortcut and an " +
      "unreachable island") {
    import org.apache.spark.sql.functions.col
    // chain 1-2-3-4-5 with shortcut 1-4; island 8-9. Seed {1}:
    // dist 1→0, 2→1, 4→1 (shortcut beats the chain's 3), 3→2, 5→2;
    // island absent; with maxHops=1 only {1,2,4} settle.
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L),
      (8L, 9L))
    val df = es.toDF("p1", "p2")
    val got3 = Graph.kHopOfEdges(df, 3, col("node") === 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got3 === Map(1L -> 0, 2L -> 1, 4L -> 1, 3L -> 2, 5L -> 2))
    val got1 = Graph.kHopOfEdges(df, 1, col("node") === 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got1 === Map(1L -> 0, 2L -> 1, 4L -> 1))
  }

  test("k-hop BFS matches naive bounded path enumeration on the " +
      "sf0.001 co-purchase graph") {
    import org.apache.spark.sql.functions._
    val e = graft.operators.Relational.coPurchase(spark, sf(), 2)
      .select(col("p1"), col("p2")).cache()
    val bidir = e.select(col("p1").as("s"), col("p2").as("t"))
      .unionAll(e.select(col("p2").as("s"), col("p1").as("t")))
    val seeds = e.select(col("p1").as("node"))
      .unionAll(e.select(col("p2").as("node"))).distinct()
      .filter(col("node") % 97 === 0)
    var paths = seeds.select(col("node"), lit(0).as("dist"))
    var last = paths
    for (h <- 1 to 3) {
      last = last.join(bidir, col("node") === col("s"))
        .select(col("t").as("node"), lit(h).as("dist")).distinct()
      paths = paths.unionByName(last)
    }
    val naive = paths.groupBy("node")
      .agg(min(col("dist")).cast("int").as("dist"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = Graph.kHopReachability(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.nonEmpty && got === naive)
  }

  test("bounded cheapest paths: a cheaper 2-hop path beats the " +
      "direct edge (where BFS settlement would be wrong)") {
    import org.apache.spark.sql.functions.col
    // 1-3 direct costs 10; 1-2-3 costs 2+3=5. 3-4 costs 1.
    // Seed {1}, 3 rounds: 1→0, 2→2, 3→5 (via 2, NOT 10), 4→6.
    // With rounds=1 node 3 holds the direct 10 and 4 is absent.
    val es = Seq((1L, 3L, 10L), (1L, 2L, 2L), (2L, 3L, 3L),
      (3L, 4L, 1L))
    val df = es.toDF("p1", "p2", "w")
    val got3 = Graph.cheapestPathsOfEdges(df, 3, col("node") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got3 === Map(1L -> 0L, 2L -> 2L, 3L -> 5L, 4L -> 6L))
    val got1 = Graph.cheapestPathsOfEdges(df, 1, col("node") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got1 === Map(1L -> 0L, 2L -> 2L, 3L -> 10L))
  }

  test("bounded cheapest paths match naive bounded path enumeration " +
      "on the sf0.001 co-purchase graph") {
    import org.apache.spark.sql.functions._
    val e = graft.operators.Relational.coPurchase(spark, sf(), 2)
      .select(col("p1"), col("p2"), expr("1000L div n_orders").as("w"))
      .cache()
    val bidir = e.select(col("p1").as("s"), col("p2").as("t"), col("w"))
      .unionAll(e.select(col("p2").as("s"), col("p1").as("t"),
        col("w")))
    val seeds = e.select(col("p1").as("node"))
      .unionAll(e.select(col("p2").as("node"))).distinct()
      .filter(col("node") % 97 === 0)
    var paths = seeds.select(col("node"), lit(0L).as("cost"))
    var last = paths
    for (_ <- 1 to 3) {
      last = last.join(bidir, col("node") === col("s"))
        .select(col("t").as("node"), (col("cost") + col("w"))
          .as("cost"))
      paths = paths.unionByName(last)
    }
    val naive = paths.groupBy("node").agg(min(col("cost")).as("cost"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Graph.boundedCheapestPaths(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty && got === naive)
  }

  test("connected components: planted two components + a long path " +
      "that needs several propagation rounds") {
    // component A: path 10-11-12-13-14-15 (min label must walk 5
    // hops); component B: triangle 20-21-22 plus pendant 23
    val es = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L),
      (14L, 15L), (20L, 21L), (20L, 22L), (21L, 22L), (22L, 23L))
    val got = Graph.componentsOfEdges(es.toDF("p1", "p2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      14L -> 10L, 15L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L,
      23L -> 20L))
  }

  test("components match an independent union-find on the full " +
      "sf0.001 co-purchase graph") {
    import org.apache.spark.sql.functions.col
    val e = graft.operators.Relational.coPurchase(spark, sf(), 2)
      .select(col("p1"), col("p2"))
    val edges = e.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(n => n -> find(n)).toMap
    val got = Graph.componentsOfEdges(e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty && got === want)
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
