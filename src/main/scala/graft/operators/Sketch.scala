package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Frequency / cardinality sketches whose whole arithmetic is exact
  * integer math over fixed public constants — so, unlike the HLL and
  * percentile sketches (tolerance oracles) or Space-Saving (guarantee
  * oracle), every emitted value here is reproducible bit-for-bit by a
  * second engine: the DuckDB oracles recompute the sketches themselves.
  *
  * Both sketches use the same hash family: h(k) = (a·k + b) mod p with
  * p = 2³¹−1 (Mersenne). Keys and coefficients stay below 2³¹, so the
  * product stays below 2⁶² — no BIGINT overflow in either engine (DuckDB
  * errors on overflow rather than wrapping, which is exactly why the
  * xxhash64-based operators elsewhere need golden oracles and these
  * don't).
  *
  * Scale: each sketch is one full-scan aggregate with map-side partial
  * combine into O(sketch) state — d·w counters for CMS, one counter per
  * seed for AMS. Nothing key-sized ever shuffles; this is the shape that
  * lets a planner "look at" a 100 TB join or frequency profile without
  * executing it.
  */
object Sketch {

  private val P = 2147483647L // 2^31 - 1

  /** (a, b) rows of the pairwise-independent hash family — small fixed
    * primes, public-knowledge construction (Carter–Wegman).
    */
  private val cmsCoef = Seq(
    (1299721L, 104659L), (7368787L, 1299709L),
    (104729L, 7368773L), (15485863L, 32452843L))

  private val amsCoef = Seq(
    (1299721L, 104659L), (7368787L, 1299709L), (104729L, 7368773L),
    (15485863L, 32452843L), (49979687L, 67867967L), (67867979L, 49979693L),
    (86028121L, 15485867L), (104395301L, 86028157L), (122949823L, 2750161L),
    (141650939L, 122949829L), (160481183L, 141650963L), (179424673L, 472882027L),
    (198491317L, 160481219L), (217645177L, 179424691L), (236887691L, 198491329L),
    (256203161L, 217645199L))

  /** CMS bucket for depth row i: ((a·k + b) mod p) mod w. */
  private def cmsBucket(k: Column, i: Int, w: Int): Column =
    ((lit(cmsCoef(i)._1) * k + lit(cmsCoef(i)._2)) % lit(P)) % lit(w)

  /** Count-min sketch over `l_partkey` frequencies, probed at a
    * deterministic key subset (partkey ≡ 0 mod `probeMod`).
    *
    * Build: one pass over lineitem exploding each row into `depth`
    * (row, bucket) cells, hash-aggregated — partial combine collapses
    * each input partition to ≤ depth·width rows before the (tiny)
    * shuffle, so the sketch costs a scan plus a depth·width-key
    * exchange at any corpus size. Probe: the depth·width counter table
    * broadcasts; est(k) = min over rows of counter[i][hᵢ(k)].
    *
    * The emitted `lb_ok` column pins the structural guarantee that
    * always holds (est ≥ exact — counters only ever overcount); the
    * estimate column itself is pinned exactly by the oracle's full
    * sketch recompute, so bucket-collision behavior can't drift
    * silently between engines.
    */
  def cmsProbe(s: SparkSession, d: String, depth: Int = 4,
      width: Int = 256, probeMod: Int = 50): DataFrame = {
    val keys = Tables.lineitem(s, d).select(col("l_partkey"))
    val cells = (0 until depth).map(i => struct(
      lit(i).as("r"), cmsBucket(col("l_partkey"), i, width).as("bkt")))
    val counters = keys
      .select(explode(array(cells: _*)).as("c"))
      .groupBy(col("c.r").as("r"), col("c.bkt").as("bkt"))
      .agg(count(lit(1)).as("cnt"))
    val exact = keys.filter(col("l_partkey") % probeMod === 0)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("exact_cnt"))
    val probes = exact.select(col("l_partkey"),
      explode(array((0 until depth).map(i => struct(lit(i).as("r"),
        cmsBucket(col("l_partkey"), i, width).as("bkt"))): _*)).as("c"))
      .select(col("l_partkey"), col("c.r").as("r"), col("c.bkt").as("bkt"))
    probes
      .join(broadcast(counters), Seq("r", "bkt"))
      .groupBy(col("l_partkey"))
      .agg(min(col("cnt")).as("cms_est"))
      .join(exact, Seq("l_partkey"))
      .select(col("l_partkey"), col("exact_cnt"), col("cms_est"),
        (col("cms_est") >= col("exact_cnt")).as("lb_ok"))
  }

  /** AMS sign for seed j: 1 − 2·(((a·k + b) mod p) mod 2) ∈ {−1, +1}. */
  private def amsSign(k: Column, j: Int): Column =
    lit(1L) - lit(2L) * (((lit(amsCoef(j)._1) * k + lit(amsCoef(j)._2))
      % lit(P)) % lit(2L))

  /** AMS (F₂) self-join-size estimate for `l_partkey` — the original
    * Alon–Matias–Szegedy use: |lineitem ⋈ lineitem on l_partkey| =
    * Σₖ f(k)² is what a cost-based optimizer needs to size the join
    * BEFORE running it, and the sketch gets it from ONE streaming pass
    * with 16 counters (each Zⱼ = Σ_rows sⱼ(k); E[Zⱼ²] = F₂).
    *
    * All 16 sums are columns of a single whole-stage-codegen aggregate
    * — no explode, no shuffle beyond the 16-value partial merge. The
    * estimate mean(Zⱼ²) divides an integer by 16, so the double is
    * exact and the oracle recomputes it bit-for-bit; the exact F₂ for
    * the error column is one keys-only groupBy(count) aggregate.
    */
  def amsJoinSize(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_partkey"))
    val zCols = amsCoef.indices.map(j =>
      sum(amsSign(col("l_partkey"), j)).as(s"z$j"))
    val zs = li.agg(zCols.head, zCols.tail: _*)
    val estCol = (amsCoef.indices.map(j => col(s"z$j") * col(s"z$j"))
      .reduce(_ + _) / lit(amsCoef.size.toLong)).cast("double")
    val est = zs.select(estCol.as("ams_est"))
    val exact = li.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c")).as("exact_f2"))
    est.crossJoin(exact).select(col("exact_f2"), col("ams_est"),
      graft.functions.Fns.r4(abs(col("ams_est") - col("exact_f2"))
        / col("exact_f2")).as("rel_err"))
  }

  /** The oracle SQL mirror of [[amsSign]]/[[amsJoinSize]] — generated
    * from the same coefficient table so the two engines can never
    * drift on the constants. exact_f2 is CAST back to BIGINT because
    * DuckDB widens integer sums to HUGEINT (pandas → float64), which
    * the driver's value-hash distinguishes from Spark's int64.
    */
  def amsOracleSql: String = {
    val zDefs = amsCoef.zipWithIndex.map { case ((a, b), j) =>
      s"sum(1 - 2 * ((($a * l_partkey + $b) % $P) % 2)) AS z$j"
    }.mkString(",\n  ")
    val sq = amsCoef.indices.map(j => s"z$j * z$j").mkString(" + ")
    s"""WITH z AS (SELECT
       |  $zDefs
       |  FROM lineitem),
       |f2 AS (SELECT sum(c * c) AS exact_f2 FROM (
       |  SELECT count(*) AS c FROM lineitem GROUP BY l_partkey))
       |SELECT CAST(exact_f2 AS BIGINT) AS exact_f2,
       |  CAST(($sq) / ${amsCoef.size} AS DOUBLE) AS ams_est,
       |  round(abs(CAST(($sq) / ${amsCoef.size} AS DOUBLE) - exact_f2)
       |    / exact_f2, 4) AS rel_err
       |FROM z CROSS JOIN f2""".stripMargin
  }

  /** The oracle SQL mirror of [[cmsProbe]] — full sketch recompute. */
  def cmsOracleSql(depth: Int = 4, width: Int = 256,
      probeMod: Int = 50): String = {
    def bkt(i: Int, k: String) =
      s"(((${cmsCoef(i)._1} * $k + ${cmsCoef(i)._2}) % $P) % $width)"
    val cellRows = (0 until depth).map(i =>
      s"SELECT $i AS r, ${bkt(i, "l_partkey")} AS bkt FROM lineitem")
      .mkString("\n  UNION ALL ")
    val probeRows = (0 until depth).map(i =>
      s"SELECT l_partkey, $i AS r, ${bkt(i, "l_partkey")} AS bkt FROM ex")
      .mkString("\n  UNION ALL ")
    s"""WITH counters AS (
       |  SELECT r, bkt, count(*) AS cnt FROM (
       |  $cellRows) GROUP BY r, bkt),
       |ex AS (
       |  SELECT l_partkey, count(*) AS exact_cnt FROM lineitem
       |  WHERE l_partkey % $probeMod = 0 GROUP BY l_partkey),
       |probes AS (
       |  $probeRows),
       |est AS (
       |  SELECT p.l_partkey, min(c.cnt) AS cms_est
       |  FROM probes p JOIN counters c ON p.r = c.r AND p.bkt = c.bkt
       |  GROUP BY p.l_partkey)
       |SELECT e.l_partkey, ex.exact_cnt, e.cms_est,
       |  e.cms_est >= ex.exact_cnt AS lb_ok
       |FROM est e JOIN ex ON e.l_partkey = ex.l_partkey""".stripMargin
  }
}
