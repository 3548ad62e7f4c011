package graft

import graft.operators.Scrub
import org.apache.spark.sql.functions._

/** Planted-evidence tests for the scrubbing tier: the driver corpus is
  * PII-free word soup (the oracle pins zero false positives there), so
  * detection and redaction are proven on planted fixtures here.
  */
class ScrubSpec extends SparkSuite {

  private def redact(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("text").select(Scrub.redactPii(col("text"))).head.getString(0)
  }

  test("redactPii replaces emails, phones, and IPs with typed tokens") {
    assert(redact("mail bob.smith+x@example.co.uk now") ===
      "mail <EMAIL> now")
    assert(redact("call 555-867-5309 or 555.867.5309") ===
      "call <PHONE> or <PHONE>")
    assert(redact("host 192.168.10.1 down") === "host <IP> down")
    // email (alphabetic TLD) and a neighboring IP redact independently
    assert(redact("a@b.io then 10.0.0.2") === "<EMAIL> then <IP>")
    // an IP-hosted address has no alphabetic TLD -> not an email match,
    // but the address still leaves redacted (its host is an IP)
    assert(redact("a@10.0.0.1 down") === "a@<IP> down")
    // clean text unchanged — the false-positive direction
    assert(redact("the quick brown fox v2.0 at 5pm") ===
      "the quick brown fox v2.0 at 5pm")
  }

  test("piiScan counts planted PII docs per class and source") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scrub").toString
    Seq(
      (0L, "reach me at a@b.io", "en", "web", 18L),
      (1L, "call 555-123-4567 today", "en", "web", 23L),
      (2L, "server 10.1.2.3 rebooted", "en", "wiki", 24L),
      (3L, "nothing sensitive here", "en", "wiki", 22L),
      (4L, "a@b.io or 555-123-4567", "en", "web", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Scrub.piiScan(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got("web") === ((3L, 2L, 2L, 0L, 0L)))  // doc 4 is email+phone
    assert(got("wiki") === ((2L, 0L, 0L, 1L, 1L)))
  }

  test("contamination finds a planted probe-overlapping doc at the " +
    "13-gram default and ignores sub-window overlap") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scrub").toString
    val probe = (1 to 20).map(i => s"w$i").mkString(" ")
    Seq(
      (0L, probe, "en", "web", probe.length.toLong),
      // 13 contiguous probe words inside other text -> contaminated
      (5L, "x y " + (3 to 15).map(i => s"w$i").mkString(" ") + " z",
        "en", "web", 0L),
      // only a 12-word run -> below the window, clean
      (6L, (3 to 14).map(i => s"w$i").mkString(" "), "en", "web", 0L),
      (7L, "completely unrelated text entirely", "en", "wiki", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Scrub.contamination(spark, dir, nProbes = 3, ngramSize = 13)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got === Map(5L -> 1L))
  }

  test("wordNgrams: contiguous, space-joined, empty under n tokens") {
    import spark.implicits._
    val got = Seq("a b c d", "a b").toDF("text")
      .select(Scrub.wordNgrams(col("text"), 3).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) === Seq("a b c", "b c d"))
    assert(got(1) === Seq.empty)
  }

  test("bpeTokens segments like the GPT-2 pre-tokenizer on mixed text") {
    import spark.implicits._
    import graft.operators.TextOps
    val got = Seq("Hello, world's 42 cats!").toDF("text")
      .select(TextOps.bpeTokens(col("text")))
      .head.getSeq[String](0)
    assert(got === Seq("Hello", ",", " world", "'s", " 42", " cats", "!"))
    // budget counts exclude pure-whitespace runs
    val budget = Seq((0L, "a  b", "en", "web", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    budget.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val row = TextOps.tokenBudget(spark, dir).head
    assert(row.getLong(2) === 2L) // ws tokens: a, b
    assert(row.getLong(3) === 2L) // bpe: "a", "b" (the "  " run dropped)
  }

  test("repetitionStats flags a planted repetitive doc and scores " +
      "clean prose near zero") {
    import spark.implicits._
    import graft.operators.TextOps
    // doc 0: pure boilerplate (one bigram repeated); doc 1: all-unique
    // prose; doc 2: single token (no bigrams — must not NPE or flag)
    val docs = Seq(
      (0L, "buy now buy now buy now buy now", "en", "spam", 31L),
      (1L, "the quick brown fox jumps over dogs", "en", "web", 35L),
      (2L, "hi", "en", "web", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("rep")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextOps.repetitionStats(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    // spam: 8 tokens, 2 distinct -> dup_tok 0.75; 7 bigrams, 2
    // distinct -> dup_bigram 5/7 — well over the 0.2 flag threshold
    assert(rows("spam").getLong(4) === 1L)
    assert(rows("spam").getDouble(2) === 0.75)
    assert(rows("spam").getDouble(3) === 0.7143)
    // web: doc 1 all-unique (ratios 0); doc 2 contributes no bigram
    // ratio (null) so the bigram avg reflects doc 1 alone
    assert(rows("web").getLong(4) === 0L)
    assert(rows("web").getDouble(2) === 0.0)
    assert(rows("web").getDouble(3) === 0.0)
  }

  test("seqPackStats window accounting is exact on a hand-packed " +
      "fixture") {
    import spark.implicits._
    import graft.operators.TextOps
    // budget 4: doc ids order the stream; ws = 3,3,2,0 -> cum 3,6,8,8
    // windows of 4 tokens: ceil(8/4)=2; doc 0 fits window 0, doc 1
    // spans tokens 3..5 (straddles 0->1), doc 2 spans 6..7 (window 1),
    // the empty doc must not count as a straddler
    val docs = Seq(
      (0L, "a b c", "en", "s", 5L),
      (1L, "d e f", "en", "s", 5L),
      (2L, "g h", "en", "s", 3L),
      (3L, "", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("pack")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextOps.seqPackStats(spark, dir, budget = 4).head
    assert(r.getLong(1) === 4L) // n_docs
    assert(r.getLong(2) === 8L) // total_tokens
    assert(r.getLong(3) === 2L) // n_windows
    assert(r.getLong(4) === 1L) // only doc 1 straddles
    assert(r.getDouble(5) === 2.0) // docs per window
  }

  test("lengthBuckets padding accounting is exact on a hand-batched " +
      "fixture") {
    import spark.implicits._
    import graft.operators.TextOps
    // width 4, batch 2. token lengths: 1,2,3 -> bucket 1; 5,7 ->
    // bucket 2; 9 -> bucket 3. bucket 1 batches: (1,2) pad (2-1)=1,
    // (3) pad 0 -> 2 batches, pad 1, padded mass 2+2+3=7 -> ratio 1/7;
    // bucket 2: one batch (5,7) pad 2, mass 14 -> 2/14; bucket 3: one
    // full-width doc, pad 0, ratio 0
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(1, 2, 3, 5, 7, 9).zipWithIndex.map { case (n, i) =>
      (i.toLong, words(n), "en", "s", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("lenbuck")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextOps.lengthBuckets(spark, dir, width = 4, batch = 2)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(rows(1) === ((3L, 2L, 1L, 0.1429)))
    assert(rows(2) === ((2L, 1L, 2L, 0.1429)))
    assert(rows(3) === ((1L, 1L, 0L, 0.0)))
  }

  test("curate: every stage bites on a planted corpus — spam dropped, " +
      "dup collapsed, budget cut, windows assigned") {
    import spark.implicits._
    import graft.operators.Curate
    def prose(seed: Int, n: Int = 10): String =
      (1 to n).map(i => s"w${seed}_$i").mkString(" ")
    val docs = Seq(
      (0L, prose(1), "en", "s", 0L),              // kept
      (1L, "buy now buy now buy now buy now", "en", "s", 0L), // spam
      (2L, prose(1), "en", "s", 0L),              // exact dup of 0
      (3L, "too short", "en", "s", 0L),           // under minTokens
      (4L, prose(2), "en", "s", 0L),              // kept
      (5L, prose(3, n = 12), "en", "s", 0L))      // kept
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("curate")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // budget 25: by hash order the first admitted doc's tokens count,
    // then admission stops once prior >= 25; packing budget 16 splits
    // the admitted stream into 2+ windows
    val got = Curate.curate(spark, dir, perSourceBudget = 25,
        packBudget = 16)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val ids = got.map(_._1).toSet
    assert(!ids.contains(1L), "repetitive doc must be dropped")
    assert(!ids.contains(2L), "exact duplicate must collapse to doc 0")
    assert(!ids.contains(3L), "under-min-tokens doc must be dropped")
    assert(ids.subsetOf(Set(0L, 4L, 5L)) && ids.nonEmpty)
    // admission is the tokenMixture rule: docs whose PRIOR admitted
    // token count is under budget, in (hash, id) order
    val hOrder = Seq(0L, 4L, 5L)
      .sortBy(id => (id * 2654435761L % 2147483647L, id))
    val wsOf = Map(0L -> 10L, 4L -> 10L, 5L -> 12L)
    val expected = hOrder.scanLeft(0L)((acc, id) => acc + wsOf(id))
      .zip(hOrder).collect { case (prior, id) if prior < 25 => id }
    assert(ids === expected.toSet)
    // packing: window ids follow the doc_id-ordered running total
    val admitted = got.sortBy(_._1)
    val cums = admitted.scanLeft(0L)((acc, r) => acc + r._2).tail
    admitted.zip(cums).foreach { case ((_, ws, wid), cum) =>
      assert(wid === (cum - ws) / 16)
    }
  }

  test("q_contamination registry form yields rows on the driver corpus") {
    val rows = SparkEntry.queries("q_contamination")(spark, sf("sf0.01"))
      .collect()
    assert(rows.nonEmpty) // 4-gram overlap exists at sf0.01 by measurement
    assert(rows.forall(_.getLong(2) >= 1))
  }

  test("semanticContamination: verbatim leak flags at 1.0, boundary " +
      "cosine flags at tau, far probe stays clean, ties pick min id") {
    import spark.implicits._
    val train = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(1f, 0f, 0f, 0f))) // exact dup of 1 — the tie case
      .toDF("vec_id", "embedding")
    val probes = Seq(
      (100L, Array(1f, 0f, 0f, 0f)),    // verbatim leak
      (101L, Array(0.8f, 0.6f, 0f, 0f)), // cos vs t1 exactly 0.8 = tau
      (102L, Array(0f, 0f, 1f, 0f)))    // orthogonal to everything
      .toDF("eval_id", "q")
    val got = Scrub.semanticContamination(probes, train, tau = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).sortBy(_._1).toSeq
    assert(got === Seq(
      // 1.0 tie between train 1 and 3 — smallest id wins
      (100L, 1L, 1.0, true),
      // >= is inclusive: exactly tau flags
      (101L, 1L, 0.8, true),
      // max cosine 0.0 — tie across all three, min id reported
      (102L, 1L, 0.0, false)))
  }

  test("semanticGate: transpose flags the leaked train doc, passes the " +
      "far doc, and an empty probe set passes everything") {
    import spark.implicits._
    val docs = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0.8f, 0.6f, 0f, 0f)), // cos vs probe exactly 0.8
      (3L, Array(0f, 0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val probes = Seq(Tuple1(Array(1f, 0f, 0f, 0f))).toDF("q")
    val got = Scrub.semanticGate(docs, probes, tau = 0.8)
      .select(col("vec_id"), col("max_eval_sim"), col("semantic_hit"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
      .sortBy(_._1).toSeq
    assert(got === Seq((1L, 1.0, true), (2L, 0.8, true),
      (3L, 0.0, false)))
    // empty probe set: the gate is open — max_eval_sim sentinels at -1
    val empty = probes.filter(lit(false))
    val open = Scrub.semanticGate(docs, empty, tau = 0.8)
      .select(col("vec_id"), col("max_eval_sim"), col("semantic_hit"))
      .collect().map(r => (r.getDouble(1), r.getBoolean(2)))
    assert(open.forall(_ === ((-1.0, false))))
  }

  test("q_semantic_gate registry form: exactly the planted mod-100 " +
      "train vectors flag TRUE on the organic corpus") {
    val rows = SparkEntry.queries("q_semantic_gate")(
        spark, sf("sf0.01")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._1 % 10 != 7)) // train side only
    val hits = rows.filter(_._3).map(_._1).toSet
    assert(hits === rows.map(_._1).filter(_ % 100 == 3).toSet)
    // the planted leaks hit on their own probe at self-cosine 1.0
    assert(rows.filter(_._3).forall(_._2 === 1.0))
  }

  test("q_semantic_decontam registry form: planted mod-100 leaks flag " +
      "at max_sim 1.0, held-out slice present and below threshold") {
    val rows = SparkEntry.queries("q_semantic_decontam")(
        spark, sf("sf0.01")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3)))
    val planted = rows.filter(_._1 >= 1000000L)
    assert(planted.nonEmpty)
    // every planted probe IS a train vector: nearest = itself at 1.0
    planted.foreach { case (evalId, trainId, sim, flag) =>
      assert(trainId === evalId - 1000000L)
      assert(sim === 1.0)
      assert(flag)
    }
    val held = rows.filter(_._1 < 1000000L)
    assert(held.nonEmpty)
    assert(held.forall(r => r._1 % 10 == 7))
    // measured property of the synthetic corpus: no held-out probe has
    // a near-dup in train (max pairwise cosine ≈ 0.5) — the FALSE band
    assert(held.forall(!_._4))
  }
}
