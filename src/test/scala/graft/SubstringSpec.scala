package graft

import graft.operators.Substring

/** Exact-substring dedup on planted spans: exact maximal-span
  * positions/lengths, the two-disjoint-spans case, the sub-threshold
  * miss, and the deterministic hot-gram cap splitting a span.
  */
class SubstringSpec extends SparkSuite {
  import spark.implicits._

  private def plant(rows: Seq[(Long, String)]): String = {
    val dir = tmpDir("substr")
    rows.map { case (id, text) =>
      (id, text, "en", "src0", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  private def toks(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("a planted 10-token span is found once, maximal, at the right " +
      "0-based offsets; a 7-token overlap is below minLen=8") {
    val span = toks("s", 10)
    val short = toks("x", 7)
    val d = plant(Seq(
      // span starts at token 3 in doc 1, token 0 in doc 2
      1L -> (toks("a", 3) + " " + span + " " + toks("b", 4)),
      2L -> (span + " " + toks("c", 6)),
      // docs 3/4 share only 7 tokens — structurally invisible
      3L -> (short + " " + toks("d", 5)),
      4L -> (short + " " + toks("e", 5))))
    val got = Substring.substringDups(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === Seq((1L, 2L, 3L, 0L, 10L)))
  }

  test("a pair sharing two disjoint spans yields two maximal rows") {
    val s1 = toks("p", 8)
    val s2 = toks("q", 9)
    val d = plant(Seq(
      1L -> (s1 + " " + toks("f", 10) + " " + s2),
      2L -> (s2 + " " + toks("g", 10) + " " + s1)))
    val got = Substring.substringDups(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === Set(
      (1L, 2L, 0L, 19L, 8L),   // s1: doc1 pos 0, doc2 pos 9+10
      (1L, 2L, 18L, 0L, 9L)))  // s2: doc1 pos 8+10, doc2 pos 0
  }

  test("the dfCap hot-gram guard drops over-frequent windows " +
      "deterministically, splitting the span around them") {
    // the shared 24-token span's MIDDLE 8-gram (positions 8..15) is
    // planted in four extra docs, pushing that window's corpus
    // frequency over dfCap=5 while the flanks stay rare
    val flank1 = toks("u", 8)
    val hot = toks("h", 8)
    val flank2 = toks("v", 8)
    val full = s"$flank1 $hot $flank2"
    val extras = (10L to 13L).map(i => i -> (hot + " " + toks(s"z$i", 8)))
    val d = plant(Seq(1L -> full, 2L -> full) ++ extras)
    val uncapped = Substring.substringDups(spark, d, dfCap = 64)
      .filter("doc_a = 1 AND doc_b = 2").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(uncapped === Set((0L, 0L, 24L)))
    // cap 5: every 8-gram window touching `hot` in full (starts 1..15)
    // appears only in docs 1/2 (freq 2) EXCEPT the pure-hot window at
    // start 8 (freq 6) — dropping it splits one 24-span into two 15s
    val capped = Substring.substringDups(spark, d, dfCap = 5)
      .filter("doc_a = 1 AND doc_b = 2").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(capped === Set((0L, 0L, 15L), (9L, 9L, 15L)))
  }

  test("incremental spans report only pairs whose larger member is " +
      "in the newest fifth; served-from-index equals inline") {
    val d = "/root/testdata/sf0.001"
    val inline = Substring.incrementalSpans(spark, d)
      .collect().map(_.toSeq).toSeq
    val full = Substring.substringDups(spark, d)
      .collect().map(_.toSeq).toSeq
    import org.apache.spark.sql.functions.{col, expr}
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("text"))
    val split = docs.agg(expr("(max(doc_id) * 4) div 5"))
      .head().getLong(0)
    // inline ≡ the full pair set restricted by the split rule
    assert(inline.sortBy(_.toString) ===
      full.filter(r => r(1).asInstanceOf[Long] >= split)
        .sortBy(_.toString))
    assert(inline.nonEmpty)
    val root = tmpDir("substr_idx")
    Substring.writePositionIndex(spark,
      docs.filter(col("doc_id") < split), root)
    val served = Substring.incrementalSpansFromIndex(spark, root,
      docs.filter(col("doc_id") >= split))
      .collect().map(_.toSeq).toSeq
    assert(served.sortBy(_.toString) === inline.sortBy(_.toString))
  }

  test("index lifecycle: grown (base + append batch) and promoted " +
      "indexes serve exactly the one-shot answer; batch dirs fold away") {
    val d = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions.{col, expr}
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("text"))
    val split = docs.agg(expr("(max(doc_id) * 4) div 5"))
      .head().getLong(0)
    val old = docs.filter(col("doc_id") < split)
    val probe = docs.filter(col("doc_id") >= split)
    val oneShot = tmpDir("substr_one")
    Substring.writePositionIndex(spark, old, oneShot)
    val expected = Substring
      .incrementalSpansFromIndex(spark, oneShot, probe)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(expected.nonEmpty)
    val grown = tmpDir("substr_grown")
    Substring.writePositionIndex(spark,
      old.filter(col("doc_id") % 5 =!= 3), grown)
    Substring.appendPositionsBatch(spark, grown,
      old.filter(col("doc_id") % 5 === 3), batchId = 1L)
    val served = Substring
      .incrementalSpansFromIndex(spark, grown, probe)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(served === expected)
    Substring.promotePositionBatches(spark, grown)
    // idempotent re-run must be a no-op, not a corruption
    Substring.promotePositionBatches(spark, grown)
    assert(!new java.io.File(s"$grown/positions_batches").exists)
    val promoted = Substring
      .incrementalSpansFromIndex(spark, grown, probe)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(promoted === expected)
  }

  test("BPE-symbol windows see verbatim overlap whitespace windows " +
      "structurally miss: a 5-shared-word prefix (26 symbols) is a " +
      "span post-tokenizer, invisible at minLen=8 whitespace tokens") {
    // nMerges = 0 keeps the planted case readable: symbols are then
    // exactly characters with the word-final </w> tag, so the shared
    // 5-word prefix 'alpha bravo charlie delta echo' = 26 symbols
    val d = plant(Seq(
      1L -> "alpha bravo charlie delta echo xray one two",
      2L -> "alpha bravo charlie delta echo yankee three"))
    assert(Substring.substringDups(spark, d).count() === 0L)
    val got = Substring.substringDupsBpe(spark, d, nMerges = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === Seq((1L, 2L, 0L, 0L, 26L)))
    // with merges the span is still found, positions in SYMBOL units
    // of the merged stream (the merge table is corpus-trained, so the
    // span shrinks to however many merged symbols cover the prefix)
    val merged = Substring.substringDupsBpe(spark, d, minLen = 8)
      .filter("doc_a = 1 AND doc_b = 2").collect()
    assert(merged.nonEmpty)
    assert(merged.forall(_.getLong(2) === 0L)) // prefix starts at 0
  }

  test("BPE scrub cuts the larger doc's symbol-span copy and rebuilds " +
      "words from </w> markers; a mid-word cut merges the flanking " +
      "fragments (the honest token-level-cut artifact)") {
    // word-aligned span: the shared 5-word prefix (26 symbols at
    // nMerges = 0) is cut from doc 2 only; reassembly restores the
    // surviving words exactly
    val d = plant(Seq(
      1L -> "alpha bravo charlie delta echo xray one two",
      2L -> "alpha bravo charlie delta echo yankee three"))
    val got = Substring.substringScrubBpe(spark, d, nMerges = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 0L, "alpha bravo charlie delta echo xray one two"),
      (2L, 26L, "yankee three")))
    // mid-word span: 'prealpha'/'nonalpha' share the 'alpha</w>' tail,
    // so the maximal 29-symbol run starts INSIDE the first word and
    // ends inside the last ('end1'/'end2' share 'e n d'); cutting it
    // from doc 2 leaves the fragments n-o-n and '2</w>', which merge
    // to "non2" — exactly what cutting token ids does in practice
    val d2 = plant(Seq(
      1L -> "prealpha bravo charlie delta echo end1",
      2L -> "nonalpha bravo charlie delta echo end2"))
    val got2 = Substring.substringScrubBpe(spark, d2, nMerges = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(got2 === Seq(
      (1L, 0L, "prealpha bravo charlie delta echo end1"),
      (2L, 29L, "non2")))
  }

  test("BPE incremental spans: inline equals the full BPE pair set " +
      "restricted by the split rule; served (batch encoded under the " +
      "frozen tokenizer, re-grammed only itself) equals inline") {
    val d = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions.{col, expr}
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("text"))
    val split = docs.agg(expr("(max(doc_id) * 4) div 5"))
      .head().getLong(0)
    val full = Substring.substringDupsBpe(spark, d, nMerges = 8)
      .collect().map(_.toSeq).toSeq
    val inline = Substring.incrementalBpeSpans(spark, d, nMerges = 8)
      .collect().map(_.toSeq).toSeq
    assert(inline.sortBy(_.toString) ===
      full.filter(r => r(1).asInstanceOf[Long] >= split)
        .sortBy(_.toString))
    assert(inline.nonEmpty)
    val root = tmpDir("substr_bpe_incr_idx")
    Substring.writeBpeIndex(spark, d, root, nMerges = 8,
      buildOnly = Some(col("doc_id") < split))
    val served = Substring.incrementalBpeSpansFromIndex(spark, root,
      docs.filter(col("doc_id") >= split))
      .collect().map(_.toSeq).toSeq
    assert(served.sortBy(_.toString) === inline.sortBy(_.toString))
  }

  test("BPE index lifecycle: frozen-vocab append serves the inline " +
      "dups AND scrub exactly; promote folds the streams batches too") {
    val d = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, d).select("doc_id", "text")
    val dupsInline = Substring.substringDupsBpe(spark, d)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val scrubInline = Substring.substringScrubBpe(spark, d)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(dupsInline.nonEmpty)
    assert(scrubInline.exists(_(1).asInstanceOf[Long] > 0L))
    val idx = tmpDir("substr_bpe_idx")
    Substring.writeBpeIndex(spark, d, idx,
      buildOnly = Some(col("doc_id") % 5 =!= 4))
    Substring.bpeAppendBatch(spark, idx,
      docs.filter(col("doc_id") % 5 === 4), batchId = 1L)
    def dupsServed() = Substring.substringDupsBpeFromIndex(spark, idx)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    def scrubServed() = Substring.substringScrubBpeFromIndex(spark, idx)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(dupsServed() === dupsInline)
    assert(scrubServed() === scrubInline)
    Substring.promotePositionBatches(spark, idx)
    assert(!new java.io.File(s"$idx/positions_batches").exists)
    assert(!new java.io.File(s"$idx/streams_batches").exists)
    assert(dupsServed() === dupsInline)
    assert(scrubServed() === scrubInline)
  }

  test("served scrub from a full-corpus index (base + append batch) " +
      "equals the inline scrub; a torn append heals on re-run") {
    val d = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, d).select("doc_id", "text")
    val inline = Substring.substringScrub(spark, d)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    // the fixture must exercise real cuts, not vacuous equality
    assert(inline.exists(_(1).asInstanceOf[Long] > 0L))
    val idx = tmpDir("substr_scrub_idx")
    def append(): Unit = Substring.appendPositionsBatch(spark, idx,
      docs.filter(col("doc_id") % 5 === 4), batchId = 1L)
    Substring.writePositionIndex(spark,
      docs.filter(col("doc_id") % 5 =!= 4), idx)
    append()
    def serve() = Substring.substringScrubFromIndex(spark, idx, docs)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(serve() === inline)
    // torn write: positions batch missing, freq batch visible — the
    // conservative crash window appendPositionsBatch's rename order
    // leaves. Re-running the same append overwrites both halves.
    val hPath = new org.apache.hadoop.fs.Path(
      s"$idx/positions_batches/batch=1")
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(hPath, true)
    append()
    assert(serve() === inline)
  }

  test("position-index deletes: the served scrub equals the survivors-" +
      "only recompute, a capped gram RE-ENTERS once its copies are " +
      "erased, and compaction folds the tombstones in") {
    import org.apache.spark.sql.functions.col
    val span = toks("s", 9) // 9 tokens -> 2 grams at minLen=8
    val d = plant(Seq(
      1L -> (span + " " + toks("a", 4)),
      2L -> (span + " " + toks("b", 4)),
      3L -> (span + " " + toks("c", 4)), // the copy to erase
      4L -> toks("z", 10)))
    val docs = graft.Tables.documents(spark, d).select("doc_id", "text")
    val idx = tmpDir("substr_del_idx")
    // lifecycle-real: doc 4 arrives as an append batch
    Substring.writePositionIndex(spark,
      docs.filter(col("doc_id") =!= 4), idx)
    Substring.appendPositionsBatch(spark, idx,
      docs.filter(col("doc_id") === 4), batchId = 1L)
    def spans(dfCap: Int) = Substring.substringScrubFromIndex(spark, idx,
      docs.filter(col("doc_id") =!= 3), dfCap = dfCap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // dfCap=2: the span grams occur in 3 docs -> capped, nothing cut
    assert(spans(2).values.forall(_ == 0L))
    // erase doc 3: gram frequency falls to 2 <= cap, the span
    // re-enters the survivors' set and doc 2's copy is cut
    Substring.deletePositions(spark, idx,
      docs.filter(col("doc_id") === 3).select("doc_id"), batchId = 1L)
    val after = spans(2)
    assert(after(1L) === 0L && after(2L) === 9L && after(4L) === 0L)
    // the survivors-only from-scratch reference agrees exactly
    val refDir = plant(Seq(
      1L -> (span + " " + toks("a", 4)),
      2L -> (span + " " + toks("b", 4)),
      4L -> toks("z", 10)))
    val want = Substring.substringScrub(spark, refDir, dfCap = 2)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    def served() = Substring.substringScrubFromIndex(spark, idx,
      docs.filter(col("doc_id") =!= 3), dfCap = 2)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(served() === want)
    // compaction: positions rewritten, freq recounted, tombstones and
    // batch dirs retired; the serve is unchanged and re-runs no-op
    Substring.compactPositionDeletes(spark, idx)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idx/tombstones")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$idx/positions_batches")))
    assert(served() === want)
    Substring.compactPositionDeletes(spark, idx)
    assert(served() === want)
  }

  test("BPE index deletes: tombstoned docs leave positions, counts AND " +
      "streams; the serve equals a survivors-only index under the " +
      "frozen tokenizer, and compaction folds all three tables") {
    val d = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, d).select("doc_id", "text")
    val survivors = docs.filter(col("doc_id") % 7 =!= 6)
    // ground truth: survivors-only index under the SAME tokenizer
    // (writeBpeIndex always trains the vocabulary on the full corpus
    // at d — erasure never retrains the frozen merge table)
    val ref = tmpDir("substr_bpe_del_ref")
    Substring.writeBpeIndex(spark, d, ref, indexDocs = Some(survivors))
    def scrub(dir: String) =
      Substring.substringScrubBpeFromIndex(spark, dir)
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val want = scrub(ref)
    assert(want.nonEmpty)
    // lifecycle-real: 80% base + committed batch + tombstones at once
    val idx = tmpDir("substr_bpe_del")
    Substring.writeBpeIndex(spark, d, idx,
      buildOnly = Some(col("doc_id") % 5 =!= 4))
    Substring.bpeAppendBatch(spark, idx,
      docs.filter(col("doc_id") % 5 === 4), batchId = 1L)
    Substring.deletePositions(spark, idx,
      docs.filter(col("doc_id") % 7 === 6).select("doc_id"),
      batchId = 1L)
    assert(scrub(idx) === want)
    // an erased doc must not resurface as a "clean text" row
    assert(!scrub(idx).exists(_(0).asInstanceOf[Long] % 7 == 6))
    // compaction rewrites positions, freq AND the symbol streams,
    // retires the side dirs, and re-runs as a no-op
    Substring.compactPositionDeletes(spark, idx)
    assert(!new java.io.File(s"$idx/tombstones").exists)
    assert(!new java.io.File(s"$idx/streams_batches").exists)
    assert(scrub(idx) === want)
    Substring.compactPositionDeletes(spark, idx)
    assert(scrub(idx) === want)
    assert(spark.read.parquet(s"$idx/streams").count()
      === survivors.count())
  }

  test("curation report served from the position index equals the " +
      "inline report (the substring component is the only index seam)") {
    val d = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, d).select("doc_id", "text")
    val idx = tmpDir("curation_substr_idx")
    Substring.writePositionIndex(spark,
      docs.filter(col("doc_id") % 5 =!= 4), idx)
    Substring.appendPositionsBatch(spark, idx,
      docs.filter(col("doc_id") % 5 === 4), batchId = 1L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString).toSeq
    val inline = rows(graft.operators.Curation.report(spark, d))
    assert(inline.nonEmpty)
    assert(rows(graft.operators.Curation.reportServed(spark, d, idx))
      === inline)
  }

  test("scrub keeps exactly one copy per duplicate cluster: the " +
      "smallest doc_id's; cut ranges union; untouched docs round-trip") {
    val span = toks("s", 9)
    val other = toks("q", 8)
    val d = plant(Seq(
      // 1/2/3 share `span` (all three pairs exist): only doc 1 keeps it
      1L -> (span + " " + toks("a", 4)),
      2L -> (toks("b", 2) + " " + span),
      3L -> span, // becomes empty after the cut
      // 4/5 share `other`; 5 also shares `span`'s tail? no — distinct
      4L -> (other + " " + toks("c", 4)),
      5L -> (toks("e", 4) + " " + other),
      6L -> toks("f", 12))) // untouched
    val got = Substring.substringScrub(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 0L, span + " " + toks("a", 4)),
      (2L, 9L, toks("b", 2)),
      (3L, 9L, ""),
      (4L, 0L, other + " " + toks("c", 4)),
      (5L, 8L, toks("e", 4)),
      (6L, 0L, toks("f", 12))))
  }
}
