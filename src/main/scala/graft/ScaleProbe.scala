package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Fns._

/** Same-hardware scaling probe: runs two representative aggregations
  * over the sf0.1 tables replicated 32× in-plan (19.2M lineitem rows /
  * 160k documents), so per-query fixed overhead stops dominating and
  * the compute slope shows. Compare against the DuckDB numbers in
  * COMPARE.md. Usage: `runMain graft.ScaleProbe [replication]`.
  *
  * `runMain graft.ScaleProbe shard` instead measures SCAN parallelism:
  * the driver testdata is one parquet file per table (= one scan task,
  * the known cap noted in COMPARE.md), so it copies lineitem/documents
  * to a 32-file layout in /tmp and times identical scan-bound
  * aggregations against both layouts. On a real deployment data arrives
  * multi-file; this records the slope the single-file cap hides.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("shard")) { shardProbe(); return }
    if (args.headOption.contains("shardbench")) { shardBench(); return }
    if (args.headOption.contains("pq")) { pqProbe(); return }
    if (args.headOption.contains("bm25")) { bm25Probe(); return }
    if (args.headOption.contains("bm25growth")) {
      bm25GrowthProbe(); return
    }
    if (args.headOption.contains("skew")) { skewProbe(); return }
    if (args.headOption.contains("int8")) { int8Probe(); return }
    if (args.headOption.contains("bq")) { bqProbe(); return }
    if (args.headOption.contains("zorder")) { zorderProbe(); return }
    if (args.headOption.contains("fetch")) { fetchProbe(); return }
    if (args.headOption.contains("substr")) { substrProbe(); return }
    if (args.headOption.contains("bpe")) { bpeProbe(); return }
    if (args.headOption.contains("loops")) { loopsProbe(); return }
    if (args.headOption.contains("erasure")) { erasureProbe(); return }
    if (args.headOption.contains("modelerase")) {
      modelEraseProbe(); return
    }
    val reps = args.headOption.map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // replicate via an exploded literal array — a codegen'd generator,
    // unlike crossJoin's nested-loop join which would dominate the probe
    def replicate(df: org.apache.spark.sql.DataFrame) =
      df.repartition(32) // single-file testdata = 1 scan task otherwise
        .withColumn("__rep",
          explode(lit((0 until reps).toArray))).drop("__rep")
    // warm
    noop(Tables.lineitem(spark, d).limit(10))

    val li = replicate(Tables.lineitem(spark, d))
    probeTime(s"spark ${reps}x lineitem count-only") {
      noop(li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1))))
    }
    probeTime(s"spark ${reps}x lineitem Q1 no-decimal") {
      noop(li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")), avg(col("l_extendedprice")),
          count(lit(1))))
    }
    probeTime(s"spark ${reps}x lineitem Q1") {
      noop(li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")), r4(avg(col("l_extendedprice"))),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
          count(lit(1))))
    }
    val docs = replicate(Tables.documents(spark, d))
    probeTime(s"spark ${reps}x documents token explode") {
      noop(docs
        .select(explode(graft.operators.TextOps.tokens(col("text")))
          .as("token"))
        .groupBy(col("token")).agg(count(lit(1))))
    }
    spark.stop()
  }

  /** `runMain graft.ScaleProbe skew`: when does AQE's runtime
    * skew-join split suffice, and when is explicit salting
    * ([[graft.functions.Skew.saltedJoin]]) still required? Planted
    * fixture at 32× sf0.1: ~19M fact rows where 60% share ONE join
    * key, sort-merge-joined (broadcast disabled) against a 100k-key
    * dim. Three measured runs:
    *
    *  1. AQE on (defaults): the skewed partition is split at runtime —
    *     evidence printed straight from the adaptive plan
    *     (`skew=true` on the SMJ sort children) alongside wall time;
    *  2. AQE off: the single-task hot partition, the degenerate
    *     baseline;
    *  3. AQE off + saltedJoin: the explicit spread recovers the
    *     parallelism by construction.
    *
    * The conclusion this records for SCALE.md: a plain shuffle JOIN
    * with one celebrity key is AQE's case — ship it unsalted and let
    * the runtime split carry it; salting remains for the shapes AQE
    * cannot rewrite (skewed AGGREGATE keys, and joins whose skewed
    * side feeds a co-partitioned consumer that must not see splits).
    */
  /** Z-order vs 1-D-sorted layout at 32× lineitem (19.2M rows ON
    * DISK each): times the q_zorder_served rectangle aggregate on
    * both layouts and — the direct evidence — reads every parquet
    * footer and counts row groups whose (l_orderkey, l_partkey)
    * min/max stats intersect the rectangle. The 1-D layout prunes
    * only the orderkey band (~¼ of groups, each spanning all
    * partkeys); Morton order keeps groups coherent in both keys, so
    * the ¼×¼ rectangle maps to ~1/16 of groups plus boundary.
    */
  /** Exact-substring scale probe at constant duplicate DENSITY:
    * documents replicated 32× (160k docs) with every token salted by
    * its replica id, so cross-replica gram matches are impossible and
    * the true span set scales exactly 32× — the honest "same data
    * distribution, 32× the rows" cost measurement (the all-duplicates
    * stress case is GrowthProbe's incremental section; boundedness
    * under dfCap is its pigeonhole guarantee). Records positions,
    * spans and wall time vs the 1× baseline.
    */
  /** Phase attribution for the BPE family (r17 measure-first): where do
    * q_substring_dups_bpe's seconds actually go — trainer rounds,
    * corpus encode, gram hashing, or the span join? Usage:
    * `runMain graft.ScaleProbe bpe`. Times each public seam at sf0.1
    * after a sf0.001 warm pass, steady state = min of 2.
    */
  private def bpeProbe(): Unit = {
    import graft.operators.{Bpe, Substring}
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val nRuns = sys.env.get("GRAFT_PROBE_RUNS")
      .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(2)
    def min2(name: String)(f: => Unit): Unit = {
      val ts = (1 to nRuns).map { _ =>
        val t0 = System.nanoTime(); f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: ${ts.min}%.2f s (runs: ${ts.map(t => f"$t%.2f")
        .mkString(", ")})")
    }
    // warm codegen/JIT on the small SF
    Bpe.merges(spark, "/root/testdata/sf0.001").count()
    Substring.substringDupsBpe(spark, "/root/testdata/sf0.001").count()
    min2("wordFreq (corpus pass + vocab agg)") {
      Bpe.wordFreq(spark, d).count(); ()
    }
    // interleaved A/B of the trainer's AQE-free rounds (Iterate knob)
    val armTimes = (1 to nRuns).flatMap { _ =>
      Seq("false", "true").map { keep =>
        sys.props("graft.iterate.keepAqe") = keep
        val t0 = System.nanoTime(); Bpe.learn(spark, d)._1
        (keep, (System.nanoTime() - t0) / 1e9)
      }
    }
    sys.props.remove("graft.iterate.keepAqe")
    def arm(k: String) = armTimes.filter(_._1 == k).map(_._2)
    println(f"learn 16 rounds: AQE-scoped-off min ${arm("false").min}%.2f s" +
      f" (${arm("false").map(t => f"$t%.2f").mkString(",")}) | " +
      f"AQE-kept min ${arm("true").min}%.2f s" +
      f" (${arm("true").map(t => f"$t%.2f").mkString(",")})")
    min2("learn + encoded-state materialize") {
      Bpe.learn(spark, d)._2.count(); ()
    }
    min2("encodeStats (trainer + corpus encode + agg)") {
      Bpe.encodeStats(spark, d).count(); ()
    }
    min2("fertility (trainer + encode + group agg)") {
      Bpe.fertility(spark, d).count(); ()
    }
    min2("substringDupsBpe (trainer + encode + grams + spans)") {
      Substring.substringDupsBpe(spark, d).count(); ()
    }
    min2("substringScrubBpe (… + cut + reassembly)") {
      Substring.substringScrubBpe(spark, d).count(); ()
    }
    spark.stop()
  }

  /** Interleaved A/B of the iterative graph/dedup loops with AQE on vs
    * off (r17): the host is noisy, so runs alternate A,B,A,B,… in one
    * JVM and each arm reports its min. Usage:
    * `runMain graft.ScaleProbe loops`.
    */
  private def loopsProbe(): Unit = {
    import graft.operators.{Graph, Dedup, Sampling}
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    graft.SparkEntry.prepare(spark, d)
    val fns: Seq[(String, () => Unit)] = Seq(
      "components" -> (() =>
        { graft.SparkEntry.queries("q_components")(spark, d).count(); () }),
      "pagerank" -> (() =>
        { graft.SparkEntry.queries("q_pagerank")(spark, d).count(); () }),
      "dup_clusters" -> (() =>
        { graft.SparkEntry.queries("q_dup_clusters")(spark, d).count(); () }),
      "coreset" -> (() =>
        { graft.SparkEntry.queries("q_coreset")(spark, d).count(); () }))
    val nRuns = sys.env.get("GRAFT_PROBE_RUNS")
      .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(3)
    fns.foreach { case (name, f) =>
      f() // warm
      val times = (1 to nRuns).flatMap { _ =>
        Seq(true, false).map { aqe =>
          spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
          val t0 = System.nanoTime(); f()
          (aqe, (System.nanoTime() - t0) / 1e9)
        }
      }
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      def arm(aqe: Boolean) = times.filter(_._1 == aqe).map(_._2)
      println(f"$name: AQE-on min ${arm(true).min}%.2f s " +
        f"(${arm(true).map(t => f"$t%.2f").mkString(",")}) | " +
        f"AQE-off min ${arm(false).min}%.2f s " +
        f"(${arm(false).map(t => f"$t%.2f").mkString(",")})")
    }
    spark.stop()
  }

  private def substrProbe(): Unit = {
    import graft.operators.Substring
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val reps = 32
    val corpus = "/tmp/graft_substr_scale"
    def timeL(name: String)(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$name: $r rows, $s%.2f s"); (r, s)
    }
    if (!new java.io.File(s"$corpus/documents.parquet").exists()) {
      val toks = graft.operators.TextOps.tokens(col("text"))
      Tables.documents(spark, "/root/testdata/sf0.1")
        .withColumn("__rep", explode(lit((0 until reps).toArray)))
        .select((col("doc_id") * reps + col("__rep")).as("doc_id"),
          concat_ws(" ", transform(toks,
            t => concat(t, lit("_"), col("__rep")))).as("text"),
          col("lang"), col("source"), col("n_chars"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$corpus/documents.parquet")
    }
    // warm the codegen/JIT path so the 1× number is the steady state
    // (a cold first run measured 6.3 s vs the 1.5 s bench-ledger row —
    // the ratio must not flatter itself with session startup)
    Substring.substringDups(spark, "/root/testdata/sf0.001").count()
    val (s1, t1) =
      timeL("substring spans 1x (5k docs)") {
        Substring.substringDups(spark, "/root/testdata/sf0.1").count()
      }
    val (s32, t32) =
      timeL(s"substring spans ${reps}x (160k docs)") {
        Substring.substringDups(spark, corpus).count()
      }
    // constant density ⇒ the span set scales exactly with the corpus;
    // a mismatch means replica salting leaked cross-replica matches
    assert(s32 == s1 * reps, s"span set not $reps x: $s1 -> $s32")
    println(f"substr scale: spans $s1%d -> $s32%d (exactly ${reps}x), " +
      f"wall $t1%.2f -> $t32%.2f s (${t32 / t1}%.1fx cost for " +
      f"${reps}x data on fixed local[32])")
    // the curation cut at the same 32× (r15 VERDICT #3): on top of the
    // span pipeline it adds the (doc, pos, token) explode, the keyed
    // anti-join against the cut set, and the per-doc ordered
    // reassembly — the one token-carrying exchange in the family.
    // Summing BOTH n_cut and the reassembled text length keeps column
    // pruning from skipping the collect_list leg; the cut-token mass
    // is the invariant (within-replica duplicate structure is
    // identical, so the cut set replicates exactly)
    def scrubMass(dir: String): Long = {
      val r = Substring.substringScrub(spark, dir)
        .agg(sum(col("n_cut")), sum(length(col("clean_text")))).head()
      r.getLong(1) // forces reassembly; return value is the cut mass
      r.getLong(0)
    }
    val (c1, ct1) = timeL("substring scrub 1x cut-token mass") {
      scrubMass("/root/testdata/sf0.1")
    }
    val (c32, ct32) = timeL(s"substring scrub ${reps}x cut-token mass") {
      scrubMass(corpus)
    }
    assert(c32 == c1 * reps,
      s"cut-token mass not $reps x: $c1 -> $c32")
    println(f"substr scrub scale: cut tokens $c1%d -> $c32%d (exactly " +
      f"${reps}x), wall $ct1%.2f -> $ct32%.2f s (${ct32 / ct1}%.1fx " +
      f"cost for ${reps}x data on fixed local[32])")
  }

  private def zorderProbe(): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_zorder_probe"
    val fact = Tables.lineitem(spark, d)
      .repartition(32)
      .withColumn("__rep", explode(lit((0 until 32).toArray)))
      .drop("__rep")
    probeTime("write 1-D sorted (l_orderkey)") {
      fact.repartitionByRange(64, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite").parquet(s"$root/sorted")
    }
    probeTime("write z-ordered (l_orderkey, l_partkey)") {
      graft.sources.Layout.writeZordered(fact, s"$root/zorder",
        "l_orderkey", "l_partkey", partitions = 64)
    }
    def rect(path: String): Unit =
      graft.operators.Relational.zorderRectangle(spark, path, d)
        .write.format("noop").mode("overwrite").save()
    rect(s"$root/sorted") // warm
    val tS = (1 to 3).map(_ =>
      probeTime("rectangle agg, sorted layout")(rect(s"$root/sorted"))).min
    val tZ = (1 to 3).map(_ =>
      probeTime("rectangle agg, z-ordered layout")(rect(s"$root/zorder"))).min
    println(f"min-of-3: sorted $tS%.2f s vs z-ordered $tZ%.2f s")
    // footer-level evidence: row groups a stats-pruning reader must read
    val st = Tables.lineitem(spark, d).agg(
      min(col("l_orderkey")), max(col("l_orderkey")),
      min(col("l_partkey")), max(col("l_partkey"))).head()
    val (loO, hiO, loP, hiP) =
      (st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3))
    val (o1, o2) = (loO + (hiO - loO) / 4, loO + (hiO - loO) / 2)
    val (p1, p2) = (loP + (hiP - loP) / 4, loP + (hiP - loP) / 2)
    import scala.jdk.CollectionConverters._
    def rowGroups(path: String): (Int, Int) = {
      val conf = new org.apache.hadoop.conf.Configuration()
      val files = new java.io.File(path).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
      var total = 0; var needed = 0
      files.foreach { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getFooter.getBlocks.asScala.foreach { b =>
          total += 1
          def range(name: String): (Long, Long) = {
            val c = b.getColumns.asScala
              .find(_.getPath.toDotString == name).get
            val s = c.getStatistics
            (s.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
              s.genericGetMax.asInstanceOf[java.lang.Long].longValue())
          }
          val (oMin, oMax) = range("l_orderkey")
          val (pMin, pMax) = range("l_partkey")
          if (oMax >= o1 && oMin <= o2 && pMax >= p1 && pMin <= p2)
            needed += 1
        } finally r.close()
      }
      (needed, total)
    }
    val (nS, tSg) = rowGroups(s"$root/sorted")
    val (nZ, tZg) = rowGroups(s"$root/zorder")
    println(s"row groups intersecting the rectangle: " +
      s"sorted $nS/$tSg vs z-ordered $nZ/$tZg")
    // granularity sweep: at finer row groups the 1-D layout stays at
    // the ¼ orderkey band while Morton converges toward the ¼×¼ AREA
    // fraction — the gap that matters when the corpus outruns cache
    probeTime("write both layouts at 256 groups") {
      fact.repartitionByRange(256, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite").parquet(s"$root/sorted256")
      graft.sources.Layout.writeZordered(fact, s"$root/zorder256",
        "l_orderkey", "l_partkey", partitions = 256)
    }
    val (nS2, tS2) = rowGroups(s"$root/sorted256")
    val (nZ2, tZ2) = rowGroups(s"$root/zorder256")
    println(s"row groups intersecting the rectangle at 256: " +
      s"sorted $nS2/$tS2 vs z-ordered $nZ2/$tZ2")
  }

  /** `runMain graft.ScaleProbe fetch`: the shortlist-fetch pruning
    * evidence (r16 VERDICT gap #2). At 64× sf0.1 (320k vectors) the
    * raw embedding store is written vec_id-SORTED (repartitionByRange
    * + sortWithinPartitions — the Layout 1-D machinery, i.e. how a
    * 100 TB cold tier is laid out), so every parquet row group carries
    * a disjoint vec_id band. The int8 serve's exact re-rank pushes the
    * bounded shortlist's vec_id set into that scan as an In filter
    * ([[graft.operators.ScalarQuant]] rerankFetch); this probe prints
    * (1) bytes read + wall time of the OLD full-store fetch scan vs
    * the pruned one, (2) the footer-level row-group evidence (groups
    * whose vec_id band intersects the shortlist vs total), and (3)
    * row-equality of the pruned serve against the scan-everything
    * plan reconstructed inline — the pruning must change bytes, never
    * rows.
    */
  private def fetchProbe(): Unit = {
    import graft.operators.ScalarQuant
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val reps = 256
    val corpus = "/tmp/graft_fetch_scale"
    ensureScaleEmbeddings(spark, corpus, reps)
    // the cold tier written vec_id-sorted with ~64 KB row groups: the
    // probe corpus is small, so group granularity stands in for lake
    // scale — what transfers is ids-per-group, and at 100 TB the group
    // count outruns any shortlist by orders of magnitude, so the
    // pruned fetch converges to (shortlist size × one group) while the
    // unpruned one stays at the corpus
    val store = s"$corpus/raw_sorted"
    if (!new java.io.File(store).exists())
      Tables.embeddings(spark, corpus)
        .repartitionByRange(16, col("vec_id"))
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .option("parquet.block.size", (64 << 10).toString)
        .parquet(store)
    val idx = s"$corpus/int8_fetch_idx"
    if (!new java.io.File(idx).exists())
      ScalarQuant.sqWriteIndex(spark, corpus, idx)
    def raw = spark.read.parquet(store)
    val queries = Tables.embeddings(spark, corpus)
      .filter(col("vec_id") < 5)
    // production-width shortlist (refine 50 × 5 queries) — the point
    // is k·queries rows against a half-million-vector store
    val refine = 50
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // the shortlist the re-rank fetches: serve with k = refine emits
    // exactly the refine-width candidate set
    val slIds = ScalarQuant.sqTopKFromIndex(spark, idx, queries, raw,
        k = refine, refine = refine)
      .select(col("vec_id")).collect().map(_.getLong(0)).distinct.toSeq
    println(s"shortlist: ${slIds.length} distinct ids of " +
      s"${Tables.embeddings(spark, corpus).count()} vectors")
    noop(raw.select(col("vec_id"), col("embedding"))) // warm page cache
    val tFull = (1 to 3).map(_ =>
      probeTime("fetch scan, FULL store (old plan)") {
        noop(raw.select(col("vec_id"), col("embedding")))
      }).min
    val tPruned = (1 to 3).map(_ =>
      probeTime("fetch scan, In-pruned store") {
        noop(raw.select(col("vec_id"), col("embedding"))
          .filter(col("vec_id").isin(slIds: _*)))
      }).min
    // footer-level evidence — deterministic, reader-independent: row
    // groups whose vec_id band holds any shortlisted id are ALL a
    // stats-pruning reader opens; sum their on-disk bytes
    import scala.jdk.CollectionConverters._
    val sortedIds = slIds.sorted.toArray
    def intersects(lo: Long, hi: Long): Boolean = {
      val i = java.util.Arrays.binarySearch(sortedIds, lo)
      val at = if (i >= 0) i else -i - 1
      at < sortedIds.length && sortedIds(at) <= hi
    }
    val conf = new org.apache.hadoop.conf.Configuration()
    var total = 0; var needed = 0
    var bytesAll = 0L; var bytesNeeded = 0L
    new java.io.File(store).listFiles()
      .filter(_.getName.endsWith(".parquet")).foreach { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getFooter.getBlocks.asScala.foreach { b =>
          total += 1
          val sz = b.getColumns.asScala.map(_.getTotalSize).sum
          bytesAll += sz
          val c = b.getColumns.asScala
            .find(_.getPath.toDotString == "vec_id").get
          val st = c.getStatistics
          if (intersects(
              st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
              st.genericGetMax.asInstanceOf[java.lang.Long].longValue())) {
            needed += 1; bytesNeeded += sz
          }
        } finally r.close()
      }
    println(f"row groups a stats-pruning reader opens: $needed/$total " +
      f"(${bytesNeeded / 1e6}%.1f of ${bytesAll / 1e6}%.1f MB on disk " +
      f"— ${bytesAll.toDouble / math.max(bytesNeeded, 1L)}%.1fx fewer " +
      f"bytes); wall: full $tFull%.2f s vs pruned $tPruned%.2f s " +
      "(min-of-3)")
    // rows must be identical to the scan-everything plan — reconstruct
    // the pre-pruning fetch inline and compare the final rankings
    val qs = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q"))
    val shortlist = ScalarQuant.sqTopKFromIndex(spark, idx, queries,
        raw, k = refine, refine = refine)
      .select(col("query_id"), col("vec_id")).join(qs, "query_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    val unpruned = raw.select(col("vec_id"), col("embedding"))
      .join(broadcast(shortlist), Seq("vec_id"))
      .select(col("query_id"), col("vec_id"),
        graft.functions.FusedCosineSimilarity.fusedCosine(
          col("q"), col("embedding")).as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select(col("query_id"), col("vec_id"),
        r4(col("sim")).as("sim"), col("rk"))
      .collect().map(_.toString).sorted.toSeq
    val pruned = ScalarQuant.sqTopKFromIndex(spark, idx, queries, raw,
        refine = refine)
      .collect().map(_.toString).sorted.toSeq
    println(s"pruned serve ${if (pruned == unpruned) "IDENTICAL to"
      else "DIVERGES from"} the scan-everything plan " +
      s"(${pruned.length} rows)")
    spark.stop()
  }

  private def skewProbe(): Unit = {
    import graft.functions.Skew
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // force the SMJ regime: a 100k-row dim would otherwise broadcast
      // and hide the skew entirely (which is itself the first answer)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      // AQE's skew thresholds assume production partition sizes
      // (256 MB); scale them to the probe's ~20 MB hot partition so
      // the runtime exhibits at local scale exactly what it does at
      // cluster scale — a split is triggered by RELATIVE skew (5x
      // median) past an absolute floor, and the floor is the knob
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "8m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    // ~19M rows, 60% on key 0, the rest uniform over 100k keys; the
    // row id (l_orderkey, l_linenumber, __rep) stays as salt identity.
    // `pad` is 8 incompressible bytes per row: AQE's skew detection
    // reads COMPRESSED map output sizes, and a constant-key fixture
    // lz4s to ~0.6 B/row — real fact rows don't
    val fact = Tables.lineitem(spark, d)
      .repartition(32)
      .withColumn("__rep", explode(lit((0 until 32).toArray)))
      .select(col("l_orderkey"), col("l_linenumber"), col("__rep"),
        when(col("l_orderkey") % 5 < 3, lit(0L))
          .otherwise(pmod(xxhash64(col("l_orderkey"),
            col("l_linenumber"), col("__rep")), lit(100000L)))
          .as("k"),
        col("l_quantity"),
        xxhash64(col("l_orderkey"), col("l_linenumber"), col("__rep"),
          lit(7)).as("pad"))
    val dim = spark.range(100000).select(col("id").as("k"),
      (col("id") * 2).as("payload"))
    def joined = fact.join(dim, "k")
      .agg(sum(col("l_quantity") * col("payload")).as("s"),
        sum(col("pad") % 1000).as("p"), count(lit(1)).as("n"))
    // warm the scan/codegen so the three timed runs compare fairly
    joined.collect()
    // 1. AQE on: runtime skew split
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    var aqePlan = ""
    val tAqe = probeTime("skewed SMJ, AQE on (runtime split)") {
      val df = joined
      df.collect()
      aqePlan = df.queryExecution.executedPlan.toString
    }
    val split = aqePlan.linesIterator
      .filter(_.contains("skew=true")).take(4).toSeq
    println(s"AQE skew-split evidence (${split.size} marked nodes):")
    split.foreach(l => println("  " + l.trim.take(120)))
    if (split.isEmpty) {
      println("-- no skew marker; adaptive plan was:")
      aqePlan.linesIterator.take(40).foreach(l =>
        println("  " + l.take(130)))
    }
    // 2. AQE off: the hot key lands on one task
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val tOff = probeTime("skewed SMJ, AQE off (single hot task)") {
      joined.collect()
    }
    // 3. AQE off + explicit salt: parallel by construction
    val tSalt = probeTime("saltedJoin(32), AQE off") {
      Skew.saltedJoin(fact, dim, "k", salts = 32,
          idCols = Seq("l_orderkey", "l_linenumber", "__rep"))
        .agg(sum(col("l_quantity") * col("payload")).as("s"),
          sum(col("pad") % 1000).as("p"), count(lit(1)).as("n"))
        .collect()
    }
    println(f"summary: aqe=$tAqe%.2f s, off=$tOff%.2f s, " +
      f"salted=$tSalt%.2f s, aqe_skew_nodes=${split.size}")
    spark.stop()
  }

  /** `runMain graft.ScaleProbe pq`: the sharded IVF-PQ serve tier
    * measured at 32× the sf0.1 embeddings (160k vectors) — genuinely
    * past the ~65k single-index capacity wall, so [[graft.operators
    * .Similarity.shardsFor]] picks a real shard count (3) and the probe
    * exercises per-shard fits, the (shard, cell)-partitioned codes
    * write, cross-shard ADC, and the broadcast-shortlist re-rank at a
    * scale where fixed overhead stops dominating. Reports index build
    * (one corpus encode pass), codes footprint vs the raw store, and
    * min-of-3 serve latency for a 5-query batch — the compressed
    * tier's measured point for COMPARE.md, like Q1's 32× row.
    */
  private def pqProbe(): Unit = {
    import graft.operators.Similarity
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // 64×: sf0.1 has 2k vectors, so 128k — past the ~65k wall, a real
    // 2-shard geometry
    val reps = 64
    val corpus = "/tmp/graft_pq_scale"
    val idx = s"$corpus/ivfpq_sharded_idx"
    ensureScaleEmbeddings(spark, corpus, reps)
    val n = Tables.embeddings(spark, corpus).count()
    val shards = Similarity.shardsFor(n)
    println(s"corpus: $n vectors, shardsFor -> $shards shards")
    val tBuild = probeTime(s"ivf-pq sharded index build (${n} vectors)") {
      Similarity.ivfPqWriteIndexSharded(spark, corpus, idx)
    }
    val rawMb = dirBytes(s"$corpus/embeddings.parquet") / 1e6
    val codesMb = dirBytes(s"$idx/codes") / 1e6
    println(f"footprint: raw store $rawMb%.1f MB, codes $codesMb%.1f MB " +
      f"(${rawMb / codesMb}%.1fx smaller)")
    val queries = Tables.embeddings(spark, corpus)
      .filter(col("vec_id") < 5)
    def serve(refine: Int): Long =
      Similarity.ivfPqTopKShardedFromIndex(spark, idx, queries,
        refine = refine,
        refineFrom =
          if (refine > 0) Some(Tables.embeddings(spark, corpus))
          else None).count()
    serve(0) // warm
    val tAdc = (1 to 3).map(_ =>
      probeTime("serve 5 queries, ADC-only")(serve(0))).min
    val tRefined = (1 to 3).map(_ =>
      probeTime("serve 5 queries, refine=100")(serve(100))).min
    println(f"pq-probe summary: build $tBuild%.1f s, " +
      f"adc-serve $tAdc%.2f s, refined-serve $tRefined%.2f s " +
      f"(min-of-3, $n vectors, $shards shards)")
    spark.stop()
  }

  /** Int8 warm-tier probe at the pq-probe's 64× corpus (128k vectors):
    * build cost, on-disk footprint vs the raw store, and the
    * shortlist+re-rank serve vs the raw brute-force scan it replaces —
    * the tier's claim is "brute-force answers from a quarter of the
    * bytes, exactly".
    */
  /** Shared by the embedding-tier probes (pq-sharded / int8 / bq):
    * wall-time a block, recursive dir size, and the 64×-replicated
    * embedding corpus under one /tmp dir — built once and reused so
    * the tiers' footprint/serve numbers stay comparable.
    */
  private def probeTime(name: String)(f: => Unit): Double = {
    val t0 = System.nanoTime(); f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"$name: $s%.2f s"); s
  }

  private def dirBytes(p: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(walk).sum else f.length()
    walk(new java.io.File(p))
  }

  private def ensureScaleEmbeddings(spark: SparkSession, corpus: String,
      reps: Int): Unit =
    if (!new java.io.File(s"$corpus/embeddings.parquet").exists())
      Tables.embeddings(spark, "/root/testdata/sf0.1")
        .withColumn("__rep", explode(lit((0 until reps).toArray)))
        .select((col("vec_id") + col("__rep") * lit(1000000L))
          .as("vec_id"), col("embedding"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")

  private def int8Probe(): Unit = {
    import graft.operators.{ScalarQuant, Similarity}
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val reps = 64
    val corpus = "/tmp/graft_pq_scale" // shared with pqProbe
    val idx = s"$corpus/int8_idx"
    ensureScaleEmbeddings(spark, corpus, reps)
    val n = Tables.embeddings(spark, corpus).count()
    val tBuild = probeTime(s"int8 codes build ($n vectors)") {
      ScalarQuant.sqWriteIndex(spark, corpus, idx)
    }
    val rawMb = dirBytes(s"$corpus/embeddings.parquet") / 1e6
    val codesMb = dirBytes(s"$idx/codes") / 1e6
    println(f"footprint: raw store $rawMb%.1f MB, int8 codes " +
      f"$codesMb%.1f MB (${rawMb / codesMb}%.1fx smaller)")
    val queries = Tables.embeddings(spark, corpus)
      .filter(col("vec_id") < 5)
    def brute(): Long =
      Similarity.bruteForceTopKAgg(spark, corpus).count()
    def served(): Long =
      ScalarQuant.sqTopKFromIndex(spark, idx, queries,
        Tables.embeddings(spark, corpus)).count()
    served() // warm
    val tBrute = (1 to 3).map(_ =>
      probeTime("brute-force 5 queries over the raw store")(brute())).min
    val tServe = (1 to 3).map(_ =>
      probeTime("int8 shortlist + exact re-rank, 5 queries")(served())).min
    // measured, not asserted: shortlist recall at this corpus size
    val bruteRows = Similarity.bruteForceTopKAgg(spark, corpus)
      .collect().map(_.toString).sorted.toSeq
    val servedRows = ScalarQuant.sqTopKFromIndex(spark, idx, queries,
      Tables.embeddings(spark, corpus))
      .collect().map(_.toString).sorted.toSeq
    val exact = bruteRows == servedRows
    println(f"int8-probe summary: build $tBuild%.1f s, raw-brute " +
      f"$tBrute%.2f s vs int8-served $tServe%.2f s (min-of-3, " +
      f"$n vectors, served ranking ${if (exact) "IDENTICAL to"
        else "DIVERGES from"} the exact brute force)")
    spark.stop()
  }

  /** `runMain graft.ScaleProbe bq`: the binary bit tier at 64×
    * embeddings (128k vectors) — build wall, on-disk footprint vs the
    * raw store and the int8 codes, and serve latency vs raw brute
    * force. Replication degeneracy note: the probe corpus is 64 exact
    * replicas of each base vector, so every Hamming distance class is
    * 64× as populated as on real data — the refine width scales by the
    * replication factor (288·64) to see past the replica ties; on
    * non-degenerate data the base width is the measured bound
    * ([[graft.operators.BinaryQuant]] scaladoc). Ranking identity vs
    * brute force is measured and printed, not assumed.
    */
  private def bqProbe(): Unit = {
    import graft.operators.{BinaryQuant, Similarity}
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val reps = 64
    val corpus = "/tmp/graft_pq_scale" // shared with pqProbe/int8Probe
    val idx = s"$corpus/bq_idx"
    ensureScaleEmbeddings(spark, corpus, reps)
    val n = Tables.embeddings(spark, corpus).count()
    val tBuild = probeTime(s"bq words build ($n vectors)") {
      BinaryQuant.bqWriteIndex(spark, corpus, idx)
    }
    val rawMb = dirBytes(s"$corpus/embeddings.parquet") / 1e6
    val wordsMb = dirBytes(s"$idx/words") / 1e6
    val int8Path = new java.io.File(s"$corpus/int8_idx/codes")
    val int8Note = if (int8Path.exists())
      f", int8 codes ${dirBytes(int8Path.getPath) / 1e6}%.1f MB" else ""
    println(f"footprint: raw store $rawMb%.1f MB$int8Note, bq words " +
      f"$wordsMb%.1f MB (${rawMb / wordsMb}%.1fx smaller than raw)")
    val queries = Tables.embeddings(spark, corpus)
      .filter(col("vec_id") < 5)
    val refine = 288 * reps // replica-tie adjustment (scaladoc above)
    def brute(): Long =
      Similarity.bruteForceTopKAgg(spark, corpus).count()
    def served(): Long =
      BinaryQuant.bqTopKFromIndex(spark, idx, queries,
        Tables.embeddings(spark, corpus), refine = refine).count()
    served() // warm
    val tBrute = (1 to 3).map(_ =>
      probeTime("brute-force 5 queries over the raw store")(brute())).min
    val tServe = (1 to 3).map(_ =>
      probeTime("bq Hamming shortlist + exact re-rank, 5 queries")(
        served())).min
    val bruteRows = Similarity.bruteForceTopKAgg(spark, corpus)
      .collect().map(_.toString).sorted.toSeq
    val servedRows = BinaryQuant.bqTopKFromIndex(spark, idx, queries,
      Tables.embeddings(spark, corpus), refine = refine)
      .collect().map(_.toString).sorted.toSeq
    val exact = bruteRows == servedRows
    println(f"bq-probe summary: build $tBuild%.1f s, raw-brute " +
      f"$tBrute%.2f s vs bq-served $tServe%.2f s (min-of-3, " +
      f"$n vectors, refine $refine, served ranking " +
      f"${if (exact) "IDENTICAL to" else "DIVERGES from"} " +
      "the exact brute force)")
    spark.stop()
  }

  /** BM25 scale probe: documents replicated 32× on disk (160k docs),
    * inverted index built once, then inline-vs-served query timing and
    * the pruned-read evidence — the bytes under the query terms'
    * postings partitions vs the whole postings table (what the
    * PartitionFilters actually save at this corpus size).
    */
  /** `runMain graft.ScaleProbe erasure`: the GDPR-delete cost model on
    * the BM25 tier at 32× documents (160 k docs). Measures the four
    * lifecycle phases — (1) the delete REQUEST (tokenize the erased
    * docs + one tombstone write: must scale with the request, never
    * the index), (2) the tombstoned serve (anti-join + query-term df
    * recount — the price paid until compaction), (3) compaction (the
    * corpus-sized rewrite, admin cadence), (4) the compacted serve
    * (back on the stored-stats plan) — and asserts answer-equality
    * against an inline recompute over the survivor corpus at every
    * stage, so the timing rows can't drift from correctness.
    */
  private def erasureProbe(): Unit = {
    import graft.operators.Search
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val reps = 32
    val corpus = "/tmp/graft_erasure_scale"
    val idx = s"$corpus/bm25_idx"
    if (!new java.io.File(s"$corpus/documents.parquet").exists())
      Tables.documents(spark, "/root/testdata/sf0.1")
        .withColumn("__rep", explode(lit((0 until reps).toArray)))
        .select((col("doc_id") * reps + col("__rep")).as("doc_id"),
          col("text"), col("lang"), col("source"), col("n_chars"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$corpus/documents.parquet")
    val docs = Tables.documents(spark, corpus)
    val n = docs.count()
    val doomed = docs.filter(col("doc_id") % 64 === 7)
    val nDel = doomed.count()
    val tBuild = probeTime(s"bm25 index build ($n docs)") {
      Search.buildIndex(spark, corpus, idx)
    }
    // the survivors-only truth every stage must serve
    val survivors = s"$corpus/survivors"
    if (!new java.io.File(s"$survivors/documents.parquet").exists())
      docs.filter(col("doc_id") % 64 =!= 7)
        .write.mode("overwrite").parquet(s"$survivors/documents.parquet")
    val want = Search.bm25(spark, survivors).collect()
      .map(_.toString).sorted.toSeq
    def served() = Search.bm25FromIndex(spark, idx).collect()
      .map(_.toString).sorted.toSeq
    val tDelete = probeTime(
      s"delete request ($nDel of $n docs -> tombstone batch)") {
      Search.deleteDocs(spark, idx, doomed, batchId = 1L)
    }
    served() // warm
    val tTomb = (1 to 3).map(_ =>
      probeTime("tombstoned serve (anti-join + df recount)") {
        assert(served() == want, "tombstoned serve != survivors truth")
      }).min
    val tCompact = probeTime("compactDeletes (corpus-sized rewrite)") {
      Search.compactDeletes(spark, idx)
    }
    val tCompacted = (1 to 3).map(_ =>
      probeTime("compacted serve (stored-stats plan)") {
        assert(served() == want, "compacted serve != survivors truth")
      }).min
    println(f"erasure-probe summary ($n docs, $nDel erased): build " +
      f"$tBuild%.1f s, delete $tDelete%.2f s, tombstoned serve " +
      f"$tTomb%.2f s, compact $tCompact%.1f s, compacted serve " +
      f"$tCompacted%.2f s (serves min-of-3, answers asserted against " +
      "the survivors-only inline recompute)")
    spark.stop()
  }

  /** `runMain graft.ScaleProbe modelerase`: the GDPR-delete cost model
    * for the DERIVED/MODEL indexes at 32× documents (160 k docs,
    * ~2,500 erased) — the r17 counterpart of the BM25 `erasure` probe.
    * Two statistics classes:
    *  - the perplexity LM's bigram counts are ADDITIVE — the delete
    *    request records the erased docs' counts, serves subtract them
    *    exactly, compaction folds by subtraction (never re-reads the
    *    corpus);
    *  - the novelty index's first-seen MIN is NOT subtractable — the
    *    request and serves stay request/probe-scaled (surviving minima
    *    stand; erased-vouched grams re-derive from the probe), but
    *    compaction must pay one survivor-corpus re-shingle pass
    *    restricted to the affected grams: the honest price of erasing
    *    a min statistic, scheduled like an IVF refit and still cheaper
    *    than the full retrain it replaces.
    * Answers asserted against survivors-only inline recomputes at
    * every stage.
    */
  private def modelEraseProbe(): Unit = {
    import graft.operators.{Dedup, Perplexity}
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val reps = 32
    val corpus = "/tmp/graft_erasure_scale" // shared with erasureProbe
    if (!new java.io.File(s"$corpus/documents.parquet").exists())
      Tables.documents(spark, "/root/testdata/sf0.1")
        .withColumn("__rep", explode(lit((0 until reps).toArray)))
        .select((col("doc_id") * reps + col("__rep")).as("doc_id"),
          col("text"), col("lang"), col("source"), col("n_chars"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$corpus/documents.parquet")
    val docs = Tables.documents(spark, corpus)
    val n = docs.count()
    val doomed = docs.filter(col("doc_id") % 64 === 7)
    val nDel = doomed.count()
    val survivors = s"$corpus/survivors"
    if (!new java.io.File(s"$survivors/documents.parquet").exists())
      docs.filter(col("doc_id") % 64 =!= 7)
        .write.mode("overwrite").parquet(s"$survivors/documents.parquet")
    val survDocs = Tables.documents(spark, survivors)
      .select(col("doc_id"), col("text"))

    // ---- novelty first-seen index (min: not subtractable) ----
    val nIdx = s"$corpus/novelty_idx"
    val tNBuild = probeTime(s"novelty first-seen build ($n docs)") {
      Dedup.noveltyWriteIndex(spark, corpus, nIdx)
    }
    val wantNov = Dedup.novelty(spark, survivors).collect()
      .map(_.toString).sorted.toSeq
    val tNDel = probeTime(
      s"novelty delete request ($nDel docs shingled -> tombstone)") {
      Dedup.noveltyDeleteDocs(spark, nIdx, doomed, batchId = 1L)
    }
    def novServe() = Dedup.noveltyFromIndex(spark, nIdx, survDocs)
      .collect().map(_.toString).sorted.toSeq
    novServe() // warm
    val tNTomb = (1 to 2).map(_ =>
      probeTime("novelty tombstoned serve (survivor probe)") {
        assert(novServe() == wantNov,
          "novelty tombstoned serve != survivors truth")
      }).min
    val tNCompact = probeTime(
      "compactNoveltyDeletes (affected-gram survivor re-shingle)") {
      Dedup.compactNoveltyDeletes(spark, nIdx, survDocs)
    }
    val tNAfter = probeTime("novelty compacted serve") {
      assert(novServe() == wantNov,
        "novelty compacted serve != survivors truth")
    }
    println(f"novelty-erase summary ($n docs, $nDel erased): build " +
      f"$tNBuild%.1f s, delete $tNDel%.2f s, tombstoned serve " +
      f"$tNTomb%.1f s, compact $tNCompact%.1f s (vs $tNBuild%.1f s " +
      f"retrain), compacted serve $tNAfter%.1f s")

    // ---- perplexity LM (counts: additive subtraction) ----
    val pplDir = s"$corpus/ppl_model"
    val tPBuild = probeTime(s"LM count train ($n docs, ref = all)") {
      Perplexity.writeModel(spark, corpus, pplDir,
        reference = lit(true))
    }
    val wantPpl = Perplexity.perplexityFilter(spark, survivors,
        reference = lit(true))
      .collect().map(_.toString).sorted.toSeq
    val tPDel = probeTime(
      s"LM delete request ($nDel docs' bigram counts -> tombstone)") {
      Perplexity.deleteDocs(spark, pplDir, doomed, batchId = 1L,
        reference = lit(true))
    }
    def pplServe() = Perplexity.scoreWithModel(spark, corpus, pplDir,
        reference = lit(true),
        docFilter = Some(col("doc_id") % 64 =!= 7))
      .collect().map(_.toString).sorted.toSeq
    pplServe() // warm
    val tPTomb = (1 to 2).map(_ =>
      probeTime("LM tombstoned serve (counts minus tombstones)") {
        assert(pplServe() == wantPpl,
          "LM tombstoned serve != survivors truth")
      }).min
    val tPCompact = probeTime(
      "LM compactDeletes (subtraction fold, corpus never re-read)") {
      Perplexity.compactDeletes(spark, pplDir)
    }
    val tPAfter = probeTime("LM compacted serve") {
      assert(pplServe() == wantPpl,
        "LM compacted serve != survivors truth")
    }
    println(f"lm-erase summary ($n docs, $nDel erased): train " +
      f"$tPBuild%.1f s, delete $tPDel%.2f s, tombstoned serve " +
      f"$tPTomb%.1f s, compact $tPCompact%.1f s (vs $tPBuild%.1f s " +
      f"retrain), compacted serve $tPAfter%.1f s")
    spark.stop()
  }

  private def bm25Probe(): Unit = {
    import graft.operators.Search
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val reps = 32
    val corpus = "/tmp/graft_bm25_scale"
    val idx = s"$corpus/bm25_idx"
    if (!new java.io.File(s"$corpus/documents.parquet").exists())
      Tables.documents(spark, "/root/testdata/sf0.1")
        .withColumn("__rep", explode(lit((0 until reps).toArray)))
        .select((col("doc_id") * reps + col("__rep")).as("doc_id"),
          col("text"), col("lang"), col("source"), col("n_chars"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$corpus/documents.parquet")
    val n = Tables.documents(spark, corpus).count()
    val tBuild = probeTime(s"bm25 index build ($n docs)") {
      Search.buildIndex(spark, corpus, idx)
    }
    val allMb = dirBytes(s"$idx/postings") / 1e6
    val terms = Search.defaultQueries.map(_._2).distinct
    val prunedMb = terms.map(t =>
      dirBytes(s"$idx/postings/term=$t")).sum / 1e6
    println(f"postings: total $allMb%.1f MB, query terms read " +
      f"$prunedMb%.1f MB (${100 * prunedMb / allMb}%.0f%%)")
    Search.bm25FromIndex(spark, idx).count() // warm
    val tInline = (1 to 3).map(_ =>
      probeTime("inline bm25 (recompute everything)")(
        Search.bm25(spark, corpus).count())).min
    val tServed = (1 to 3).map(_ =>
      probeTime("served bm25 (pruned index read)")(
        Search.bm25FromIndex(spark, idx).count())).min
    println(f"bm25-probe summary: build $tBuild%.1f s, inline " +
      f"$tInline%.2f s, served $tServed%.2f s (min-of-3, $n docs)")
    spark.stop()
  }

  /** BM25 append-growth probe: half the corpus indexed at build, the
    * other half arriving as 16 append batches — measures what the
    * accumulated `batch=` dirs cost the serve path and what compaction
    * buys back, against the one-shot build of the same corpus. The
    * spec pins answer-equality; this records the TIME side of the
    * lifecycle claim.
    */
  private def bm25GrowthProbe(): Unit = {
    import graft.operators.{Search, Similarity}
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val oneShot = "/tmp/graft_bm25_growth/full"
    val grown = "/tmp/graft_bm25_growth/grown"
    def rmrf(p: String): Unit = {
      def walk(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(walk)
        f.delete()
      }
      walk(new java.io.File(p))
    }
    rmrf("/tmp/graft_bm25_growth")
    Search.buildIndex(spark, d, oneShot)
    Search.buildIndex(spark, d, grown,
      docFilter = Some(col("doc_id") % 2 === 0))
    val nBatches = 16
    (0 until nBatches).foreach { b =>
      Search.appendBatch(spark, grown,
        graft.Tables.documents(spark, d)
          .filter(col("doc_id") % 2 =!= 0 &&
            col("doc_id") % (2 * nBatches) === 2 * b + 1),
        batchId = b.toLong)
    }
    def serve(dir: String, label: String): Double = {
      Search.bm25FromIndex(spark, dir).count() // warm
      (1 to 3).map(_ =>
        probeTime(label)(Search.bm25FromIndex(spark, dir).count())).min
    }
    val tOne = serve(oneShot, "serve one-shot index")
    val tGrown = serve(grown, s"serve grown index ($nBatches batch dirs)")
    Similarity.compactIvfAppends(spark, grown,
      upToBatch = nBatches - 1L,
      table = "postings_batches", partitionCol = "term")
    val tCompact = serve(grown, "serve grown index (compacted to 1 dir)")
    Search.promoteBatches(spark, grown)
    val tPromoted = serve(grown, "serve promoted index (folded to base)")
    println(f"bm25-growth summary: one-shot $tOne%.2f s, " +
      f"$nBatches-batch grown $tGrown%.2f s, compacted $tCompact%.2f s, " +
      f"promoted $tPromoted%.2f s")
    spark.stop()
  }

  /** Single-file vs 32-file scan-parallelism probe (see class doc).
    * The sf0.1 tables are replicated 8× ON DISK (≈4.8M lineitem rows /
    * 40k documents) so the scan dominates task-setup noise, written in
    * both layouts. A single parquet file is still byte-range-splittable
    * (maxPartitionBytes), so the single-file penalty is bounded — the
    * probe measures how much the multi-file layout actually buys.
    */
  private def shardProbe(): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val reps = 8
    val singleDir = "/tmp/graft_scan_single"
    val shardDir = "/tmp/graft_scan_sharded"
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    Seq("lineitem", "documents").foreach { t =>
      val rep = spark.read.parquet(s"$d/$t.parquet")
        .withColumn("__rep", explode(lit((0 until reps).toArray)))
        .drop("__rep")
      if (!new java.io.File(s"$singleDir/$t.parquet").exists())
        rep.coalesce(1).write.mode("overwrite")
          .parquet(s"$singleDir/$t.parquet")
      if (!new java.io.File(s"$shardDir/$t.parquet").exists())
        rep.repartition(32).write.mode("overwrite")
          .parquet(s"$shardDir/$t.parquet")
    }
    def q1(dir: String) = {
      val li = Tables.lineitem(spark, dir)
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")), r4(avg(col("l_extendedprice"))),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
          count(lit(1)))
    }
    def tok(dir: String) = Tables.documents(spark, dir)
      .select(explode(graft.operators.TextOps.tokens(col("text")))
        .as("token"))
      .groupBy(col("token")).agg(count(lit(1)))
    def scanParts(dir: String): Int =
      Tables.lineitem(spark, dir).rdd.getNumPartitions
    println(s"lineitem scan splits: single=${scanParts(singleDir)} " +
      s"sharded=${scanParts(shardDir)}")
    noop(q1(singleDir).limit(1)) // warm
    def bestOf(name: String, n: Int)(f: => Unit): Double =
      (1 to n).map(_ => probeTime(name)(f)).min
    val q1Single = bestOf(s"q1 ${reps}x single-file", 3)(noop(q1(singleDir)))
    val q1Shard = bestOf(s"q1 ${reps}x 32-file", 3)(noop(q1(shardDir)))
    val tokSingle =
      bestOf(s"tokens ${reps}x single-file", 3)(noop(tok(singleDir)))
    val tokShard =
      bestOf(s"tokens ${reps}x 32-file", 3)(noop(tok(shardDir)))
    println(f"speedup q1: ${q1Single / q1Shard}%.1fx, " +
      f"tokens: ${tokSingle / tokShard}%.1fx")
    spark.stop()
  }

  /** `runMain graft.ScaleProbe shardbench`: the FULL registered query
    * suite timed against the driver's single-file sf0.1 layout AND a
    * same-data 32-file copy (the layout any real deployment has). The
    * per-query single/sharded ratio separates scan-bound queries (big
    * speedup from file parallelism) from shuffle/compute-bound ones
    * (flat) — the honest multi-file baseline the single-file bench
    * understates. Results land in tools/bench_sharded.json for SCALE.md
    * and round-over-round diffs.
    */
  private def shardBench(): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val dst = "/tmp/graft_sf01_sharded"
    // nanos flag before touching events (Tables.events also sets it)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      if (!new java.io.File(s"$dst/$t.parquet").exists())
        spark.read.parquet(s"$src/$t.parquet").repartition(32)
          .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    spark.read.parquet(s"$dst/region.parquet").count() // warm
    // the *_served rows read lake indexes — build them for BOTH
    // layouts outside the timed loops
    SparkEntry.prepare(spark, src)
    SparkEntry.prepare(spark, dst)
    // a query that throws records ok=false, NOT a timing — a
    // time-to-failure must never be mistaken for a valid measurement
    def run(dir: String): Seq[(String, (Double, Boolean))] =
      SparkEntry.queries.toSeq.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, dir).count(); true }
          catch { case scala.util.control.NonFatal(_) => false }
        name -> ((System.nanoTime() - t0) / 1e9, ok)
      }
    val single = run(src).toMap
    val sharded = run(dst).toMap
    def cell(r: (Double, Boolean)): String =
      if (r._2) f"${r._1}%.3f" else "\"error\""
    val rows = single.keys.toSeq.sorted.map { q =>
      s""""$q": {"single": ${cell(single(q))}, "sharded": ${cell(sharded(q))}}"""
    }
    val json = rows.mkString(
      s"""{"sf": "$src", "files": 32, "queries": {\n  """,
      ",\n  ", "\n}}\n")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("tools/bench_sharded.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def total(m: Map[String, (Double, Boolean)]): Double =
      m.values.collect { case (t, true) => t }.sum
    val failed = single.count(!_._2._2) + sharded.count(!_._2._2)
    println(f"single total: ${total(single)}%.1f s, " +
      f"sharded total: ${total(sharded)}%.1f s, $failed failures " +
      "(tools/bench_sharded.json written)")
    spark.stop()
  }
}
