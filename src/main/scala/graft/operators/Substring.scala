package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring (verbatim-span) deduplication — the suffix-array
  * dedup class of Lee et al., "Deduplicating Training Data Makes
  * Language Models Better" (ACL 2022), re-expressed Spark-first. The
  * gram/containment family ([[Dedup.ngramContainmentPairs]]) measures
  * gram-SET overlap; this operator finds the spans themselves: maximal
  * runs of ≥ `minLen` consecutive tokens that two documents share
  * VERBATIM, with their positions — the thing you quote, audit, and
  * cut when scrubbing training data.
  *
  * Construction (no suffix array needed — a distributed equivalent):
  *   1. every token position emits the hash of the `minLen`-token
  *      window starting there (the fixed-width-gram trick: a shared
  *      span of length S ≥ minLen appears as exactly S − minLen + 1
  *      consecutive gram matches);
  *   2. positions sharing a gram hash pair up within the gram's hash
  *      bucket (doc_a < doc_b);
  *   3. per (pair, diagonal = pos_a − pos_b), consecutive matches
  *      collapse to one maximal span by the run-grouping window
  *      (pos_a − row_number), span_len = minLen + run − 1.
  *
  * Scale shape: the match key is an 8-byte gram hash — the pair join
  * shuffles (hash, doc, pos) tuples, never text. Bucket fan-out is
  * bounded by `dfCap`: a gram occurring more than `dfCap` times
  * corpus-wide (boilerplate — exactly what Lee et al. special-case) is
  * dropped BEFORE pairing, so no bucket joins more than dfCap² rows;
  * the cap is deterministic (a pure frequency filter, mirrored verbatim
  * in the DuckDB oracle) and dormant at verify scale (max gram
  * frequency 3 at sf0.01). The doc-sized gram-array frame materializes
  * ONCE before the explode (the r14 NoveltyProbe rule: exploding a
  * computed HOF array re-pays the lambda chain per generator row, 5×),
  * and once more after it, since the pair self-join consumes the
  * exploded positions twice. Collision note: pairing on xxhash64 can in
  * principle alias two distinct grams (p ≈ positions²/2⁶⁴); the oracle
  * pairs on the gram STRING, so the gate itself polices collisions.
  */
object Substring {

  /** Maximal verbatim token spans of length ≥ `minLen` shared across
    * document pairs: (doc_a, doc_b, a_pos, b_pos, span_len), positions
    * 0-based token offsets, one row per maximal span (a pair sharing
    * two disjoint spans yields two rows).
    */
  def substringDups(s: SparkSession, d: String, minLen: Int = 8,
      dfCap: Int = 64): DataFrame = {
    val docs = Tables.parallelized(
      Tables.documents(s, d).select(col("doc_id"), col("text")))
    val toks = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      // sequence(1, size-minLen+1) must not run on short docs (it
      // would descend); dropping them loses nothing — no position
      .filter(size(col("t")) >= minLen)
    // the U+0001 separator joins the window's tokens unambiguously
    // (whitespace-split tokens cannot contain the separator)
    val gramArrs = Dedup.lazyCheckpoint(toks.select(col("doc_id"),
      transform(sequence(lit(1), size(col("t")) - (minLen - 1)),
        i => xxhash64(concat_ws("\u0001", slice(col("t"), i, lit(minLen)))))
        .as("g")))
    val positions = gramArrs
      .select(col("doc_id"), posexplode(col("g")))
      .toDF("doc_id", "pos", "h")
    val freq = positions.groupBy(col("h")).agg(count(lit(1)).as("n"))
    // two consumers below (both sides of the pair self-join): cut the
    // explode+frequency subtree off both
    val kept = Dedup.lazyCheckpoint(
      positions.join(freq.filter(col("n") <= dfCap), Seq("h"))
        .select(col("h"), col("doc_id"), col("pos")))
    val m = kept.as("a").join(kept.as("b"),
        col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.pos").as("pa"), col("b.pos").as("pb"))
    val w = Window.partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("pa"))
    m.withColumn("diag", col("pa") - col("pb"))
      .withColumn("grp", col("pa") - row_number().over(w))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("grp"))
      .agg(min(col("pa")).cast("bigint").as("a_pos"),
        min(col("pb")).cast("bigint").as("b_pos"),
        (lit(minLen) + count(lit(1)) - 1).cast("bigint").as("span_len"))
      .select(col("doc_a"), col("doc_b"), col("a_pos"), col("b_pos"),
        col("span_len"))
  }

  /** The same construction as chained DuckDB CTEs — pairs on the gram
    * STRING (no hash), so the gate also polices hash collisions.
    */
  def oracleSql(minLen: Int = 8, dfCap: Int = 64): String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(string_split(text, ' '), x -> x <> '') AS t
       |  FROM documents),
       |pos AS (
       |  SELECT doc_id, i AS pos,
       |    array_to_string(t[i+1:i+$minLen], chr(1)) AS g
       |  FROM toks,
       |    unnest(range(0, greatest(len(t) - ${minLen - 1}, 0))) AS u(i)),
       |freq AS (SELECT g, count(*) AS n FROM pos GROUP BY g),
       |kept AS (SELECT p.doc_id, p.pos, p.g
       |         FROM pos p JOIN freq USING (g) WHERE freq.n <= $dfCap),
       |m AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    a.pos AS pa, b.pos AS pb
       |  FROM kept a JOIN kept b
       |    ON a.g = b.g AND a.doc_id < b.doc_id),
       |runs AS (
       |  SELECT doc_a, doc_b, pa, pb, pa - pb AS diag,
       |    pa - row_number() OVER (
       |      PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa) AS grp
       |  FROM m)
       |SELECT doc_a, doc_b,
       |  CAST(min(pa) AS BIGINT) AS a_pos,
       |  CAST(min(pb) AS BIGINT) AS b_pos,
       |  CAST($minLen + count(*) - 1 AS BIGINT) AS span_len
       |FROM runs GROUP BY doc_a, doc_b, diag, grp""".stripMargin

  /** The curation half of Lee et al.: CUT the duplicated spans,
    * keeping one occurrence corpus-wide. Every span occurrence in the
    * pair's LARGER doc_id is removed (within a duplicate cluster all
    * pairs exist, so only the smallest doc's copy survives —
    * deterministic, order-free); a doc's cut ranges union before
    * removal. Output one row per document: (doc_id, n_cut,
    * clean_text), clean_text = surviving tokens joined by single
    * spaces (the canonical whitespace form both engines rebuild
    * identically), '' when everything was cut, the full token join
    * when nothing was.
    *
    * Scale shape: the span frame is pair-bounded (tiny); the cut
    * positions explode to at most the duplicated token mass. The
    * corpus pays one (doc_id, pos, token) explode, one keyed
    * anti-join against the cut set, and one per-doc ordered
    * reassembly (collect_list of a DOCUMENT's tokens — bounded by
    * definition of a document). No all-pairs, no text in join keys.
    */
  def substringScrub(s: SparkSession, d: String, minLen: Int = 8,
      dfCap: Int = 64): DataFrame = {
    val docs = Tables.parallelized(
      Tables.documents(s, d).select(col("doc_id"), col("text")))
    val toksDf = docs.select(col("doc_id"),
      TextOps.tokens(col("text")).as("t"))
    val cuts = substringDups(s, d, minLen, dfCap)
      .select(col("doc_b").as("doc_id"),
        explode(sequence(col("b_pos"),
          col("b_pos") + col("span_len") - 1)).as("pos"))
      .distinct()
    val tp = toksDf.select(col("doc_id"), posexplode(col("t")))
      .toDF("doc_id", "pos", "tok")
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("tok"))
    val kept = tp.join(cuts, Seq("doc_id", "pos"), "left_anti")
    val agg = kept.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_kept"),
      concat_ws(" ",
        transform(array_sort(collect_list(struct(col("pos"),
          col("tok")))), x => x.getField("tok"))).as("clean_text"))
    toksDf
      .select(col("doc_id"), size(col("t")).cast("long").as("n_toks"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("n_toks") - coalesce(col("n_kept"), lit(0L))).as("n_cut"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** [[substringScrub]] recomputed end-to-end in DuckDB — span
    * construction, cut-position union, ordered reassembly.
    */
  def scrubOracleSql(minLen: Int = 8, dfCap: Int = 64): String = {
    val spanCtes = oracleSql(minLen, dfCap)
      .replaceFirst("(?s)\\nSELECT doc_a.*$", "")
    s"""$spanCtes,
       |spans AS (
       |  SELECT doc_b AS doc_id, min(pb) AS b0,
       |    $minLen + count(*) - 1 AS sl
       |  FROM runs GROUP BY doc_a, doc_b, diag, grp),
       |cuts AS (
       |  SELECT DISTINCT doc_id, b0 + u.i AS p
       |  FROM spans, unnest(range(0, sl)) AS u(i)),
       |tp AS (
       |  SELECT doc_id, i AS pos, t[i+1] AS tok
       |  FROM toks, unnest(range(0, len(t))) AS u(i)),
       |keep AS (
       |  SELECT tp.doc_id, tp.pos, tp.tok
       |  FROM tp LEFT JOIN cuts c
       |    ON tp.doc_id = c.doc_id AND tp.pos = c.p
       |  WHERE c.p IS NULL),
       |agg AS (
       |  SELECT doc_id, count(*) AS n_kept,
       |    string_agg(tok, ' ' ORDER BY pos) AS clean_text
       |  FROM keep GROUP BY doc_id)
       |SELECT toks.doc_id,
       |  CAST(len(t) - coalesce(n_kept, 0) AS BIGINT) AS n_cut,
       |  coalesce(clean_text, '') AS clean_text
       |FROM toks LEFT JOIN agg ON toks.doc_id = agg.doc_id""".stripMargin
  }
}
