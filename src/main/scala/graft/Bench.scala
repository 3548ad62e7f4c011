package graft
import org.apache.spark.sql.SparkSession

/** Driver benchmark: times every registered query at the target SF and
  * prints ONE JSON line. Measurement rules (r8 — the record must be
  * evidence, not noise):
  *
  *  - **min-of-N iterations** (default 2, `SPARK_GRAFT_ITERS`): the r7
  *    single-iteration record showed 3–7× "regressions" on untouched
  *    queries (q_semi_join 4.85 s recorded vs 0.62 s re-measured) —
  *    GC/compilation hiccups land in one run, not both, and min is the
  *    right estimator for "what does this plan cost".
  *  - **failures are explicit**: a query that throws at the target SF is
  *    recorded under `"errors"` with the exception, never as a
  *    plausible-looking timing (a `-1`-count run previously timed the
  *    failure path and reported it as a result).
  *  - **the FULL per-query record is written to a file**
  *    (`SPARK_GRAFT_BENCH_OUT`, default `tools/bench_latest.json`): the
  *    driver keeps only the tail of stdout (~4 KB — 23 of 90 queries
  *    were truncated out of BENCH_r07), so the committed file is the
  *    authoritative per-query ledger.
  *  - **warm timing, disclosed**: every query's codegen/JIT path is
  *    warmed at sf0.001 first (r6's record showed 5 s first-run skew on
  *    1 s queries), and the JSON carries `"warmed"` + `"warm_sec"` so a
  *    reader comparing rounds knows cold rounds (r1–r6) and warm rounds
  *    (r7+) are not like-for-like.
  *  - **GC time and peak heap per iteration** (r10): "machine noise"
  *    claims about slow runs must be measurable, not asserted. Each
  *    iteration records the JVM-wide GC time that elapsed during it
  *    (GarbageCollectorMXBeans) and the peak heap-pool usage
  *    (MemoryPoolMXBeans, peaks reset at iteration start), so a reader
  *    of the ledger can tell "the plan got slower" from "this run spent
  *    40% of its wall clock collecting a pressured heap".
  */
object Bench {
  private val gcBeans =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
  private val heapPools = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP).toSeq
  }
  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    gcBeans.asScala.map(b => math.max(0L, b.getCollectionTime)).sum
  }
  private def resetHeapPeaks(): Unit = heapPools.foreach(_.resetPeakUsage())
  private def peakHeapMb(): Double =
    heapPools.flatMap(p => Option(p.getPeakUsage).map(_.getUsed)).sum / 1e6

  /** One timed iteration: wall seconds, GC millis spent during it, and
    * the peak heap (MB) the JVM touched while it ran. */
  final case class Iter(sec: Double, gcMs: Long, peakMb: Double)

  /** Block-manager boundary cleanup (r15). `localCheckpoint` persists
    * its RDD at MEMORY_AND_DISK and frees it only when ContextCleaner
    * GC-collects the RDD object — `System.gc()` alone queues the
    * cleanup asynchronously, so across a 218-query JVM the blocks
    * ACCUMULATE (driver r14: q_pagerank 11.35 s in-suite at 9.4 GB
    * peak heap vs 3.77 s isolated at 3.4 GB, identical code — the
    * fourth adjudication of this class after q_components r13,
    * q_histogram/q_source_drift r14). This makes the cleanup
    * synchronous: every persistent RDD still registered is unpersisted
    * blocking, cached tables are dropped, and THEN the boundary GC
    * runs against an empty block manager. Returns what the previous
    * query left behind (count, MB) so the ledger carries the evidence
    * per query instead of a one-off adjudication. */
  private def dropLeftoverBlocks(spark: SparkSession): (Int, Double) = {
    val left = LeakGate.leftBlocks(spark)
    LeakGate.sweep(spark)
    left
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session/scheduler/codegen startup outside the timed loop so
    // the first query's number measures the query, not the JVM
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }
    // SPARK_GRAFT_ONLY=q_a,q_b restricts the run — local iteration aid;
    // the driver never sets it, so driver benches always cover the suite
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      if (unknown.nonEmpty)
        // loud, not silent: a typo'd ONLY list used to run zero queries
        // and print total 0.0 — indistinguishable from a very fast run
        System.err.println("[bench] WARNING: SPARK_GRAFT_ONLY names " +
          s"match no registered query: ${unknown.toSeq.sorted.mkString(",")}")
    }
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(q => names(q._1))
      case None        => SparkEntry.queries
    }
    // Warm every query's codegen/JIT path on the smallest SF before
    // timing: per-query numbers then measure the query at the target
    // SF, not whichever queries happened to run first paying compile
    // cost — the steady state a long-lived cluster session sees.
    // Skipped when the warmup dir is absent or SPARK_GRAFT_NO_WARMUP is
    // set. Warmup failures are swallowed HERE (the query may only work
    // at the target SF) but never in the timed loop below.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.001")
    // *_served queries read lake indexes built by the prepare hook —
    // build them OUTSIDE the timed loop (the production shape: index
    // once, serve many; per-query numbers measure serving)
    if (selected.keys.exists(_.endsWith("_served"))) {
      SparkEntry.prepare(spark, sfDir)
      if (!sys.env.contains("SPARK_GRAFT_NO_WARMUP") &&
          new java.io.File(warmDir).isDirectory && warmDir != sfDir)
        SparkEntry.prepare(spark, warmDir)
    }
    val warmT0 = System.nanoTime()
    val warmed = !sys.env.contains("SPARK_GRAFT_NO_WARMUP") &&
      new java.io.File(warmDir).isDirectory
    if (warmed)
      selected.foreach { case (_, fn) =>
        try { fn(spark, warmDir).count() } catch { case _: Throwable => () }
      }
    val warmSec = (System.nanoTime() - warmT0) / 1e9
    // the warmup pass itself leaves a suite's worth of localCheckpoint
    // blocks behind — sweep them before the first timed query
    dropLeftoverBlocks(spark)
    val iters = sys.env.get("SPARK_GRAFT_ITERS")
      .flatMap(s => scala.util.Try(s.toInt).toOption)
      .filter(_ >= 1).getOrElse(2)
    // per query: `iters` timed runs; keep the min of the successful ones
    // (steady-state plan cost), or the first error if none succeeded.
    // Boundary hygiene between queries AND between iterations (r8 GC,
    // r15 block sweep): in the r8 record, scan-bound queries measured
    // 3–4× their isolated steady state (q_membership 0.86 s min-of-2
    // in-suite vs 0.31 s isolated) because heap pressure from earlier
    // queries bleeds into BOTH iterations — min-of-N cannot wash out a
    // shared degraded context. r14 showed System.gc() alone is not
    // enough: localCheckpoint blocks survive the boundary (see
    // dropLeftoverBlocks) and the suite's slowest row ran 2.4× its
    // isolated cost. The sweep runs OUTSIDE the timed window, exactly
    // like the isolated-run adjudications it replaces, and each row
    // records the blocks the query left behind (left_rdds/left_mb).
    val runsByQuery
        : Seq[(String, (Seq[Either[String, Iter]], Int, Double))] =
      selected.toSeq.sortBy(_._1).map { case (name, fn) =>
        val timed = (1 to iters).map { _ =>
          resetHeapPeaks()
          val gc0 = gcMillis()
          val t0 = System.nanoTime()
          val r: Either[String, Iter] = try {
            fn(spark, sfDir).count()
            val sec = (System.nanoTime() - t0) / 1e9
            Right(Iter(sec, gcMillis() - gc0, peakHeapMb()))
          } catch {
            case e: Throwable =>
              Left(s"${e.getClass.getSimpleName}: " +
                Option(e.getMessage).getOrElse("").replace('\n', ' ')
                  .take(200))
          }
          // per-iteration sweep: iteration 2 must not run against
          // iteration 1's leftover blocks (that was never "the query"),
          // and the NEXT query starts from an empty block manager. The
          // sweep reports what this iteration left behind.
          val (leftN, leftMb) = dropLeftoverBlocks(spark)
          (r, leftN, leftMb)
        }
        val runs = timed.map(_._1)
        // steady per-run block footprint: max across iterations — the
        // evidence column that marks a checkpoint-heavy row
        val leftN = timed.map(_._2).max
        val leftMb = timed.map(_._3).max
        name -> ((runs, leftN, leftMb))
      }
    val times = runsByQuery.flatMap { case (name, (runs, _, _)) =>
      val ok = runs.collect { case Right(it) => it.sec }
      if (ok.nonEmpty) Some(name -> ok.min) else None
    }
    val errors = runsByQuery.flatMap { case (name, (runs, _, _)) =>
      if (runs.forall(_.isLeft))
        Some(name -> runs.collectFirst { case Left(m) => m }.get)
      else None
    }
    // intermittent failures must not hide behind a healthy-looking min:
    // a query that threw in SOME iterations is listed with its failed
    // count even though `queries` carries the min of its good runs
    val unstable = runsByQuery.flatMap { case (name, (runs, _, _)) =>
      val failed = runs.count(_.isLeft)
      if (failed > 0 && failed < runs.size) Some(name -> failed) else None
    }
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = times.map { case (k, v) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val unst = unstable.map { case (k, v) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val total = times.map(_._2).sum
    // GC seconds accumulated across every timed iteration — one number
    // that says how heap-pressured the whole run was (the per-query
    // split lives in the ledger file)
    val gcSecTotal = runsByQuery.flatMap(_._2._1).collect {
      case Right(it) => it.gcMs
    }.sum / 1e3
    val line = f"""{"metric":"total","value":$total,"unit":"sec","n_queries":${times.size},"n_errors":${errors.size},"iters":$iters,"warmed":$warmed,"warm_sec":$warmSec%.2f,"gc_sec":$gcSecTotal%.2f,"sf":${jstr(sfDir)},"errors":$errs,"unstable":$unst,"queries":$qs}"""
    // authoritative per-query artifact: stdout gets tail-truncated by the
    // driver, the file never is. Includes every raw iteration so a
    // reader can see run-to-run variance, not just the min.
    // round-agnostic default: the driver passes the round-stamped name
    // via the env var; a hardcoded tools/bench_rN.json silently
    // overwrote a file whose name claimed to be round-N data
    // a filtered (SPARK_GRAFT_ONLY) run must not clobber the full-suite
    // record under the default name — route it to a scratch artifact
    // unless the caller named one explicitly
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (only.isDefined) "tools/bench_only.json"
      else "tools/bench_latest.json")
    try {
      // ledger row per query: wall seconds, GC ms, and peak heap MB for
      // every iteration — the evidence columns a noise-vs-regression
      // adjudication needs (an inflated run shows its gc_ms/peak_mb)
      val perQuery = runsByQuery.map {
        case (name, (runs, leftN, leftMb)) =>
          val secs = runs.map {
            case Right(it) => f"${it.sec}%.3f"
            case Left(m)   => jstr("ERROR " + m)
          }.mkString("[", ",", "]")
          val gcs = runs.map {
            case Right(it) => it.gcMs.toString
            case Left(_)   => "null"
          }.mkString("[", ",", "]")
          val peaks = runs.map {
            case Right(it) => f"${it.peakMb}%.0f"
            case Left(_)   => "null"
          }.mkString("[", ",", "]")
          s"""  ${jstr(name)}: {"sec": $secs, "gc_ms": $gcs, """ +
            f""""peak_mb": $peaks, "left_rdds": $leftN, """ +
            f""""left_mb": $leftMb%.1f}"""
      }.mkString("{\n", ",\n", "\n}")
      val body = f"""{"total_sec": $total%.2f, "iters": $iters, "warmed": $warmed, "warm_sec": $warmSec%.2f, "gc_sec": $gcSecTotal%.2f, "sf": ${jstr(sfDir)}, "n_queries": ${times.size}, "n_errors": ${errors.size},\n "runs_per_query": $perQuery}\n"""
      val p = java.nio.file.Paths.get(out)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(p,
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] could not write $out: ${e.getMessage}")
    }
    println(line)
    spark.stop()
  }
}
