package graft

import graft.operators.Similarity
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** IVF geometry sweep: recall@10 vs brute force and probed-fraction for
  * the DERIVED `cellsFor`/`probesFor` geometry and nearby probe counts,
  * at two corpus sizes and two cluster structures — the measurement
  * behind [[graft.operators.Similarity.ivfTopK]]'s defaults. Writes
  * `tools/ivf_tune.json`.
  *
  * Corpora:
  *  - the driver sf0.01 embeddings (~500 vectors, isotropic) — the
  *    floor geometry (16 cells / 10 probes, 62% probed);
  *  - a 25k isotropic corpus (GrowthProbe's deterministic generator) —
  *    derived geometry 98 cells / 13 probes, ~13% probed. Isotropic
  *    data has NO cluster structure, so recall ≈ probed fraction here
  *    is the data's property, not the index's — the honest baseline;
  *  - a 25k CLUSTERED corpus (32 deterministic centers + bounded
  *    noise) — same derived geometry, where neighbors share the query's
  *    cell and recall holds high at the same falling probed fraction.
  *    This is the regime IVF exists for.
  *
  * Run: `sbt "runMain graft.IvfTune"` (~2 min).
  */
object IvfTune {

  /** Deterministic clustered embeddings: `n` 64-d vectors in
    * `nClusters` cells — unit-ish center(c) picked by splitmix-style
    * xxhash, vector = center + `noise`·uniform. All SQL expressions,
    * no RNG state (same discipline as GrowthProbe.writeCorpus).
    */
  def writeClusteredEmbeddings(s: SparkSession, n: Long, outDir: String,
      nClusters: Int = 32, noise: Double = 0.25): Unit = {
    val base = s.range(n).select(col("id").as("vec_id"),
      pmod(xxhash64(col("id"), lit(7)), lit(nClusters.toLong)).as("c"))
    def u(salt: Column, i: Column): org.apache.spark.sql.Column =
      ((pmod(xxhash64(salt, i), lit(2000001L)) - lit(1000000L))
        .cast("double") / 1e6)
    val emb = transform(sequence(lit(0), lit(63)), i =>
      (u(col("c") + lit(1000000L), i) + lit(noise) * u(col("vec_id"), i))
        .cast("float"))
    base.select(col("vec_id"), emb.as("embedding"),
        pmod(col("c"), lit(3)).cast("int").as("label"))
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // shared generate-or-reuse guard (GrowthProbe.ensureCorpus): a
    // params marker written only after a successful generation and
    // deleted before regenerating, so stale or half-written corpora
    // are never silently reused
    def ensureCorpus(dir: String, params: String)(gen: => Unit): Unit =
      GrowthProbe.ensureCorpus(dir, params)(gen)
    val iso25k = "/tmp/graft_ivf/iso25000"
    ensureCorpus(iso25k, "growthprobe-v1 n=25000") {
      GrowthProbe.writeCorpus(spark, 25000L, iso25k)
    }
    val clu25k = "/tmp/graft_ivf/clustered25000"
    ensureCorpus(clu25k, "clustered-v1 n=25000 nClusters=32 noise=0.25") {
      writeClusteredEmbeddings(spark, 25000L, clu25k)
    }

    val corpora = Seq(
      ("sf0.01_isotropic", "/root/testdata/sf0.01"),
      ("25k_isotropic", iso25k),
      ("25k_clustered", clu25k))

    // Assignment-plan comparison (r9): centroid argmax via the
    // NearestCentroids reference-object expression (the default) vs the
    // r8 literal-array trees, at the derived geometry on the clustered
    // corpus AND at the 256-cell cap on a 66k corpus — the regime the r8
    // advice flagged as unmeasured (literal codegen already fell back at
    // 98 cells; 256 was untested territory for planning time and
    // constant-pool pressure). Also asserts both plans return identical
    // rows at both sizes.
    val clu66k = "/tmp/graft_ivf/clustered66000"
    ensureCorpus(clu66k, "clustered-v1 n=66000 nClusters=32 noise=0.25") {
      writeClusteredEmbeddings(spark, 66000L, clu66k)
    }
    val cmpRows = Seq(("25k_clustered", clu25k), ("66k_clustered", clu66k))
      .flatMap { case (label, dir) =>
        val n = Tables.embeddings(spark, dir).count()
        val cells = Similarity.cellsFor(n)
        val probes = Similarity.probesFor(cells)
        val results = Seq(false, true).map { literal =>
          val t0 = System.nanoTime()
          val rows = Similarity.ivfTopK(spark, dir, nCells = cells,
            nQueries = 5, k = 10, nProbe = probes,
            literalCentroids = literal).collect()
          val sec = (System.nanoTime() - t0) / 1e9
          val mode = if (literal) "literal" else "ref"
          println(f"$label%-14s n=$n%6d cells=$cells%3d probes=$probes%3d " +
            f"assign=$mode%-7s $sec%.1fs")
          (mode, sec, rows.map(_.toString).sorted.toSeq)
        }
        assert(results(0)._3 == results(1)._3,
          s"assignment plans disagree on $label")
        results.map { case (mode, sec, _) =>
          f"""  {"corpus": "$label", "n": $n, "cells": $cells, """ +
            f""""probes": $probes, "assign": "$mode", "sec": $sec%.2f}"""
        }
      }

    // Sharded scale path (r9): past [[Similarity.shardsFor]]'s 65k
    // capacity the corpus splits into per-shard indexes (own centroid
    // fits, cross-shard top-k merge). Measured against the single
    // capped index on the same 66k clustered corpus — the regime the
    // sharding exists for: the single index runs at occupancy 258 over
    // its 256-cell cap, the sharded form keeps every shard at the
    // derived geometry.
    val shardRows = {
      val n = Tables.embeddings(spark, clu66k).count()
      val brute = Similarity
        .bruteForceTopKAgg(spark, clu66k, nQueries = 5, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      Seq(
        ("single_capped", () => Similarity.ivfTopK(spark, clu66k,
          nQueries = 5, k = 10)),
        ("sharded", () => Similarity.ivfTopKSharded(spark, clu66k,
          nQueries = 5, k = 10))
      ).map { case (mode, run) =>
        val t0 = System.nanoTime()
        val got = run().collect().map(r => (r.getLong(0), r.getLong(1)))
          .toSet
        val sec = (System.nanoTime() - t0) / 1e9
        val recall = (brute & got).size.toDouble / brute.size
        println(f"66k_clustered  mode=$mode%-13s recall@10=$recall%.3f " +
          f"$sec%.1fs")
        f"""  {"corpus": "66k_clustered", "n": $n, "mode": "$mode", """ +
          f""""recall_at_10": $recall%.3f, "sec": $sec%.2f}"""
      }
    }

    val rows = corpora.flatMap { case (label, dir) =>
      val n = Tables.embeddings(spark, dir).count()
      val cells = Similarity.cellsFor(n)
      val derived = Similarity.probesFor(cells)
      val brute = Similarity
        .bruteForceTopKAgg(spark, dir, nQueries = 5, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // derived probe count plus half/double, bounded to [1, cells]
      val probeGrid = Seq(derived / 2, derived, derived * 2)
        .map(p => math.max(1, math.min(cells, p))).distinct
      probeGrid.map { probes =>
        val t0 = System.nanoTime()
        val ivf = Similarity.ivfTopK(spark, dir, nCells = cells,
          nQueries = 5, k = 10, nProbe = probes)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val sec = (System.nanoTime() - t0) / 1e9
        val recall = (brute & ivf).size.toDouble / brute.size
        val frac = probes.toDouble / cells
        println(f"$label%-18s n=$n%6d cells=$cells%3d probes=$probes%3d " +
          f"(frac=$frac%.3f${if (probes == derived) " derived" else ""}) " +
          f"recall@10=$recall%.3f  $sec%.1fs")
        f"""  {"corpus": "$label", "n": $n, "cells": $cells, """ +
          f""""probes": $probes, "derived": ${probes == derived}, """ +
          f""""probed_fraction": $frac%.4f, "recall_at_10": $recall%.3f, """ +
          f""""sec": $sec%.2f}"""
      }
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get("tools/ivf_tune.json"),
      (rows ++ cmpRows ++ shardRows).mkString("[\n", ",\n", "\n]\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println("ivf tune written (tools/ivf_tune.json)")
    spark.stop()
  }
}
