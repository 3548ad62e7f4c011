package graft

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-growth probe for the text/dedup family: measures candidate-
  * pair counts and runtimes for the minhash, n-gram-jaccard, and
  * embedding LSH paths across 10–50× synthetic corpus growth, backing
  * the banding math in Dedup/Similarity with numbers instead of
  * argument. The claim under test: candidate pairs grow ~LINEARLY in
  * corpus size because (a) true near-dups are injected at a fixed rate
  * (1 in 20 docs duplicates its predecessor), (b) random cross-doc
  * similarity is negligible, and (c) the embedding path derives planes
  * and bands from the corpus count (Similarity.planesFor/bandsFor), so
  * bucket occupancy — and with it accidental collisions — stays bounded
  * as n grows.
  *
  * Corpora are fully deterministic (every value derives from
  * xxhash64(seed, salt)); the testdata parquet is never touched.
  * Usage: `runMain graft.GrowthProbe` → tools/growth_probe.json +
  * stdout summary. ~1 min at the default sizes.
  */
object GrowthProbe {

  /** Generate-or-reuse guard for /tmp tool corpora, shared with
    * IvfTune: a params marker written only AFTER a successful
    * generation, and DELETED before regenerating — so an interrupted
    * `gen` can never leave a marker that validates a half-written
    * corpus (not even when params later revert to the marker's value).
    */
  def ensureCorpus(dir: String, params: String)(gen: => Unit): Unit = {
    val marker = java.nio.file.Paths.get(dir, "params.marker")
    val fresh = java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker),
        java.nio.charset.StandardCharsets.UTF_8) == params
    if (!fresh) {
      java.nio.file.Files.deleteIfExists(marker)
      gen
      java.nio.file.Files.createDirectories(marker.getParent)
      java.nio.file.Files.write(marker,
        params.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  // mirrors the driver corpus: ~25-word shared vocab, 40-token docs
  private val Vocab = Seq("group", "row", "vector", "table", "data",
    "value", "key", "hash", "spark", "scan", "filter", "window", "sort",
    "merge", "join", "line", "query", "order", "slow", "big", "small",
    "column", "part", "stream", "agg")
  private val Langs = Seq("en", "de", "es", "fr", "zh")
  private val Sources = Seq("web", "wiki", "books")

  /** Write a deterministic n-doc corpus (documents + embeddings) under
    * `outDir`. Doc i with i % 20 == 0 (i > 0) reuses doc i−1's seed —
    * an exact text/vector duplicate — so the true near-dup pair count
    * is exactly ⌊(n−1)/20⌋: linear in n by construction.
    */
  def writeCorpus(s: SparkSession, n: Long, outDir: String): Unit = {
    val vocabLit = array(Vocab.map(lit(_)): _*)
    val seed = when(col("id") % 20 === 0 && col("id") > 0, col("id") - 1)
      .otherwise(col("id"))
    val base = s.range(n).select(col("id").as("doc_id"),
      seed.as("seed"))
    val toks = transform(sequence(lit(1), lit(40)),
      i => element_at(vocabLit,
        (pmod(xxhash64(col("seed"), i), lit(Vocab.size)) + 1)
          .cast("int")))
    val docs = base
      .select(col("doc_id"), col("seed"),
        concat_ws(" ", toks).as("text"))
      .select(col("doc_id"), col("text"),
        element_at(array(Langs.map(lit(_)): _*),
          (pmod(xxhash64(col("seed"), lit(-1)), lit(Langs.size)) + 1)
            .cast("int")).as("lang"),
        element_at(array(Sources.map(lit(_)): _*),
          (pmod(xxhash64(col("seed"), lit(-2)), lit(Sources.size)) + 1)
            .cast("int")).as("source"),
        length(col("text")).cast("long").as("n_chars"))
    docs.write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    // dense 64-d vectors, components uniform in [-1, 1]
    val emb = transform(sequence(lit(0), lit(63)),
      i => ((pmod(xxhash64(col("seed"), i + 1000), lit(2000001L))
        - lit(1000000L)).cast("double") / 1e6).cast("float"))
    base.select(col("doc_id").as("vec_id"), emb.as("embedding"),
        pmod(col("seed"), lit(3)).cast("int").as("label"))
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sizes = Seq(500L, 5000L, 12500L, 25000L)
    val rows = sizes.map { n =>
      val dir = s"/tmp/graft_growth/n$n"
      ensureCorpus(dir, s"growthprobe-v1 n=$n") {
        writeCorpus(spark, n, dir)
      }
      // candidate stages (the growth claim) + verified outputs (recall
      // that the verify step holds at every size). Candidates are
      // materialized ONCE (localCheckpoint): the pair count and the
      // verify-input distinct both read the same computed set, so the
      // probe doesn't pay (or silently omit) a second corpus-wide
      // signature pipeline. verifyDocs is the distinct candidate
      // MEMBERS the prune admits to the re-shingle pass (minhashPairs'
      // memberIds semi join) — the r7 prune's scaling claim is that
      // this, not n, is what the second corpus pass pays per-row text
      // work for: ~2 members per true-dup pair ⇒ ~n/10, linear.
      val ((mhCand, verifyDocs), tMhc) = timed {
        val cand = Dedup.minhashCandidates(spark, dir).localCheckpoint()
        (cand.count(),
          cand.select(explode(array(col("doc_a"), col("doc_b")))
            .as("doc_id")).distinct().count())
      }
      val (mhPairs, tMhp) = timed(Dedup.minhashPairs(spark, dir).count())
      val (embCand, tEc) = timed(
        Dedup.embeddingCandidates(spark, dir).count())
      val (embDups, tEd) = timed(
        Dedup.embeddingNearDups(spark, dir, threshold = 0.95).count())
      val (ngPairs, tNg) = timed(
        Dedup.ngramJaccardPairs(spark, dir, threshold = 0.5,
          maxBlockSize = 1000).count())
      // the exhaustive-path comparison volume: sum of m·(m−1)/2 over
      // (lang, source) blocks ≤ maxBlockSize — the quantity the block
      // guard bounds
      val ngCand = Tables.documents(spark, dir)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("m"))
        .agg(sum(when(col("m") <= 1000,
          col("m") * (col("m") - 1) / 2).otherwise(0L)).cast("long"))
        .head().getLong(0)
      val trueDups = (n - 1) / 20
      println(f"n=$n%6d true=$trueDups%5d | minhash cand=$mhCand%7d " +
        f"verify-docs=$verifyDocs%6d (${100.0 * verifyDocs / n}%4.1f%%) " +
        f"pairs=$mhPairs%5d (${tMhc + tMhp}%4.1fs) | emb cand=$embCand%7d " +
        f"dups=$embDups%5d (${tEc + tEd}%4.1fs) | ngram cand=$ngCand%9d " +
        f"pairs=$ngPairs%5d ($tNg%4.1fs)")
      (n, trueDups, mhCand, verifyDocs, mhPairs, embCand, embDups, ngCand,
        ngPairs, tMhc + tMhp, tEc + tEd, tNg)
    }
    // ---- incremental path: FIXED batch vs GROWING standing index ----
    // The scaladoc claim under test (Dedup.incrementalMinhashPairsFromIndex):
    // per-run work scales with the batch, not the index. Fixture: the
    // 500-doc corpus replays as the daily batch (ids shifted to keep
    // ingest-uniqueness) against standing indexes 10×–50× its size.
    // Every batch doc has an exact text twin in every index (same
    // generator, same seeds), so the TRUE pair set is identical at
    // every index size — any growth in work is index-size overhead,
    // which is exactly what the design says must not happen (the index
    // contributes only its 24 B/row bucket scan to the probe join).
    val batch = Tables.documents(spark, "/tmp/graft_growth/n500")
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
    val incRows = Seq(5000L, 12500L, 25000L).map { n =>
      val dir = s"/tmp/graft_growth/n$n"
      val idxDocs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
      // index BUILD scales with the corpus — priced separately here to
      // contrast with the batch-sized serve cost
      val (_, tBuild) = timed {
        Dedup.minhashBuckets(idxDocs).write.mode("overwrite")
          .parquet(s"$dir/minhash_buckets")
      }
      val (pairs, tServe) = timed {
        Dedup.incrementalMinhashPairsFromIndex(
          spark.read.parquet(s"$dir/minhash_buckets"), idxDocs, batch)
          .count()
      }
      println(f"incremental index=$n%6d batch=500 pairs=$pairs%5d " +
        f"build=$tBuild%5.1fs serve=$tServe%5.1fs")
      (n, pairs, tBuild, tServe)
    }
    // the pair set is index-size-invariant by construction — a drift
    // means the probe join's semantics leak index size
    assert(incRows.map(_._2).distinct.size == 1,
      s"incremental pair count varies with index size: $incRows")
    // serve cost must not track the 5× index growth (noise floor: the
    // sandbox jitters small timings, so allow 3× or +2 s, whichever is
    // looser — both far under the 5× data growth)
    val serveMin = incRows.map(_._4).min
    val serveMax = incRows.map(_._4).max
    assert(serveMax <= math.max(serveMin * 3, serveMin + 2.0),
      f"incremental serve time tracks index size: $serveMin%.1f -> " +
        f"$serveMax%.1f s over a 5x index")
    val json = rows.map {
      case (n, t, mc, vd, mp, ec, ed, nc, np, t1, t2, t3) =>
      f"""  {"n": $n, "true_dups": $t, "minhash_candidates": $mc, """ +
        f""""minhash_verify_docs": $vd, "minhash_pairs": $mp, """ +
        f""""embedding_candidates": $ec, """ +
        f""""embedding_neardups": $ed, "ngram_block_comparisons": $nc, """ +
        f""""ngram_pairs": $np, "sec_minhash": $t1%.2f, """ +
        f""""sec_embedding": $t2%.2f, "sec_ngram": $t3%.2f}"""
    }.mkString("{\n \"growth\": [\n", ",\n", "\n ],\n") +
      incRows.map { case (n, p, tb, ts) =>
        f"""  {"index_n": $n, "batch_n": 500, "pairs": $p, """ +
          f""""sec_index_build": $tb%.2f, "sec_batch_serve": $ts%.2f}"""
      }.mkString(" \"incremental\": [\n", ",\n", "\n ]\n}\n")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("tools/growth_probe.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // growth checks. minhash: candidates/doc is flat (true-dup rate +
    // negligible random band collisions). embedding: candidates must
    // respect the designed occupancy bound n·(occ/2)·bands with
    // occ = n/2^planesFor(n) — the bound is tight on isotropic data
    // (uniform bucket splits), so a 1.5x fudge covers split skew.
    // This is exactly the assertion that caught the r6 finding: with
    // the old 4096 occupancy target the 25k corpus measured 39M
    // candidates against a designed expectation of ~2M.
    val perDoc = rows.map { case (n, _, mc, _, _, ec, _, _, _, _, _, _) =>
      (n, mc.toDouble / n, ec.toDouble / n) }
    val (n0, m0, _) = perDoc(1) // 5000-doc point
    val (n1, m1, _) = perDoc.last
    println(f"minhash candidates/doc: $m0%.2f@$n0 -> $m1%.2f@$n1")
    assert(m1 <= m0 * 3 + 1,
      s"minhash candidate growth super-linear: $m0/doc -> $m1/doc")
    // verify-prune linearity: the fraction of the corpus admitted to
    // the re-shingle pass must stay ~flat at the dup-member rate
    // (≈ 2 members / 20-doc dup window = 10%), not creep toward 100%
    // — creeping fraction means the prune degenerates to a full second
    // corpus pass and the "verify cost is linear in dups" claim dies.
    rows.foreach { case (n, t, _, vd, _, _, _, _, _, _, _, _) =>
      val frac = vd.toDouble / n
      println(f"verify prune n=$n%6d admitted=$vd%6d ($frac%5.3f of corpus," +
        f" ${2 * t} dup members)")
      assert(vd >= 2 * t - 2, s"prune dropped true-dup members at n=$n")
      assert(frac <= 0.15,
        f"verify prune admits $frac%.2f of corpus at n=$n — not dup-bounded")
    }
    rows.foreach { case (n, _, _, _, _, ec, _, _, _, _, _, _) =>
      val planes = graft.operators.Similarity.planesFor(n)
      val bands = graft.operators.Similarity.bandsFor(planes)
      val occ = n.toDouble / (1L << planes)
      val bound = n * (occ / 2) * bands * 1.5
      println(f"embedding n=$n%6d cand=$ec%9d designed-bound=$bound%12.0f" +
        f" (planes=$planes bands=$bands occ=$occ%.0f)")
      assert(ec <= bound,
        s"embedding candidates $ec exceed designed bound $bound at n=$n")
    }
    // ---- exact-substring incremental path (r15): same fixture ----
    // Claim under test (Substring.incrementalSpansFromIndex): only the
    // batch is re-grammed, and the probe pair set is index-size-
    // INVARIANT here because every batch doc's exact twin (ids 0..499
    // exist in every index with identical text) contributes one
    // full-doc span while random 8-gram collisions are nil on this
    // vocabulary. The index side DOES contribute a linearly-growing
    // posting scan+shuffle to the probe join (reported, not hidden) —
    // the 100 TB mitigation is h-partitioned index layout so the probe
    // co-partitions, the same story as the BM25 postings tier.
    val subRows = Seq(5000L, 12500L, 25000L).map { n =>
      val dir = s"/tmp/graft_growth/n$n"
      val idxDocs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
      val (_, tBuild) = timed {
        graft.operators.Substring.writePositionIndex(spark, idxDocs,
          s"$dir/substr")
      }
      val (spans, tServe) = timed {
        graft.operators.Substring.incrementalSpansFromIndex(spark,
          s"$dir/substr", batch).count()
      }
      println(f"substring index=$n%6d batch=500 spans=$spans%5d " +
        f"build=$tBuild%5.1fs serve=$tServe%5.1fs")
      (n, spans, tBuild, tServe)
    }
    assert(subRows.map(_._2).distinct.size == 1,
      s"substring span count varies with index size: $subRows")
    val subJson = subRows.map { case (n, p, tb, ts) =>
      f"""  {"index_n": $n, "batch_n": 500, "spans": $p, """ +
        f""""sec_index_build": $tb%.2f, "sec_batch_serve": $ts%.2f}"""
    }.mkString(" \"substring_incremental\": [\n", ",\n", "\n ]\n")
    // ---- BPE-substring ingest path (r16): same fixture, frozen
    // tokenizer. Claim under test (Substring.bpeAppendBatch): the
    // batch re-encodes and re-grams ONLY itself under the persisted
    // vocabulary + merge sequence, so append cost is batch-sized while
    // the index build scales with the corpus; and the batch's span
    // contribution is index-size-INVARIANT (every batch doc's exact
    // text twin exists in every corpus — the incremental-minhash
    // argument, replayed post-tokenizer). minLen = 56 symbols (~10
    // words) keeps random window collisions nil on this 25-word
    // vocabulary (25^10 >> corpus positions) while twin docs still
    // share their full ~230-symbol stream.
    val bpeRows = Seq(5000L, 12500L, 25000L).map { n =>
      val dir = s"/tmp/graft_growth/n$n"
      val idx = s"$dir/substr_bpe"
      val (_, tBuild) = timed {
        graft.operators.Substring.writeBpeIndex(spark, dir, idx,
          minLen = 56, nMerges = 8)
      }
      // min-of-2: re-appending the same batchId is the documented
      // idempotent heal path (every slot overwrites), so the second
      // run doubles as a warm re-measure — the first append lands
      // right after the corpus-sized build and inherits its JVM noise
      val tAppend = Seq.fill(2)(timed {
        graft.operators.Substring.bpeAppendBatch(spark, idx, batch,
          batchId = 1L, minLen = 56)
      }._2).min
      val (spans, tServe) = timed {
        graft.operators.Substring.substringDupsBpeFromIndex(spark, idx,
          minLen = 56).filter(col("doc_b") >= 10000000L).count()
      }
      println(f"bpe index=$n%6d batch=500 spans=$spans%5d " +
        f"build=$tBuild%5.1fs append=$tAppend%5.1fs serve=$tServe%5.1fs")
      (n, spans, tBuild, tAppend, tServe)
    }
    assert(bpeRows.map(_._2).distinct.size == 1,
      s"bpe batch span contribution varies with index size: $bpeRows")
    val bpeJson = bpeRows.map { case (n, p, tb, ta, ts) =>
      f"""  {"index_n": $n, "batch_n": 500, "spans": $p, """ +
        f""""sec_index_build": $tb%.2f, "sec_batch_append": $ta%.2f, """ +
        f""""sec_probe_serve": $ts%.2f}"""
    }.mkString(" \"bpe_ingest\": [\n", ",\n", "\n ]\n")
    // splice the substring section into the written JSON (kept as a
    // separate rewrite so the earlier sections' schema is untouched)
    val p = java.nio.file.Paths.get("tools/growth_probe.json")
    val body = new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
    val spliced = body.replaceFirst("\\n\\}\\n$",
      ",\n" + subJson + ",\n" + bpeJson + "}\n")
    // a drift in the earlier writer's trailing format must not silently
    // drop the substring section from the artifact (r15 ADVICE)
    require(spliced != body,
      "growth_probe.json splice anchor (trailing \"\\n}\\n\") not found")
    java.nio.file.Files.write(p,
      spliced.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println("growth probe OK (tools/growth_probe.json written)")
    spark.stop()
  }
}
