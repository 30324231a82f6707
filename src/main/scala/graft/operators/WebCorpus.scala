package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-hygiene operators for web-scale training-data pipelines, in the
  * CCNet / Gopher tradition: global line-frequency boilerplate removal,
  * within-document repetition metrics, and corpus-wide n-gram statistics.
  *
  * Reference analog: the reference removes cross-record noise with
  * normalization + prefix stripping before matching
  * (`/root/reference/src/event_dedup/preprocessing/prefix_stripper.py:46-86`,
  * `normalizer.py:16-67`) — per-document cleanup driven by corpus-level
  * knowledge (its configured prefix list is hand-curated boilerplate). At
  * web scale the boilerplate list cannot be curated by hand; it is COMPUTED
  * as the set of lines whose document frequency exceeds a threshold, which
  * is exactly what [[removeBoilerplate]] does.
  *
  * Scale posture: everything here is explode → hash-aggregate → hash-join —
  * no driver-side state, no collect. The line-frequency table is keyed by
  * a 64-bit line hash (not the line text) so the shuffle carries 8-byte
  * keys; the frequency join is a plain shuffle join that AQE can convert or
  * skew-split. Reassembly is one `groupBy(doc)` over (pos, line) structs.
  */
object WebCorpus {

  // Unicode-complete blank-line test: Spark's trim strips only ASCII
  // spaces, so a "\t"- or NBSP-only line would otherwise read as content
  private def isBlankLine(line: Column): Column =
    length(graft.functions.TextFunctions.collapseWhitespace(line)) === 0

  /** Exploded (id, pos, line) frame: one row per line per document.
    * Lines are '\n'- or CRLF-separated ("\r?\n" — a CRLF corpus would
    * otherwise leave a trailing '\r' on every line and turn every blank
    * line into a one-char "\r" content line); order is preserved via `pos`.
    */
  def lineFrame(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_ref"), posexplode(split(col(textCol), "\r?\n")))
      .toDF("doc_ref", "pos", "line")

  /** Document frequency per distinct line: how many distinct documents
    * contain the line. Joinable by the 64-bit `line_hash` so downstream
    * shuffles never carry the line text twice.
    *
    * Collision posture: at 10^12 distinct lines, 64-bit birthday collisions
    * (~3% of keys) would CONFLATE unrelated lines — inflating doc_freq and
    * over-removing. Acceptable for boilerplate stats (an inflated count only
    * errs toward removing a near-boilerplate line); for exact semantics at
    * that scale widen the key to a 128-bit hash (two xxhash64 seeds or
    * sha2/16B), which only changes the key expression here and below.
    */
  def lineDocFrequency(lines: DataFrame): DataFrame =
    lines.groupBy(xxhash64(col("line")).as("line_hash"))
      .agg(countDistinct(col("doc_ref")).as("doc_freq"))

  /** CCNet-style boilerplate removal: drop every line that appears in at
    * least `minDocs` distinct documents (cookie banners, nav bars, footers),
    * reassemble the survivors in original order. Returns one row per input
    * document: (idCol, clean_text, n_kept_lines); documents whose every
    * line was boilerplate come back with clean_text = "" and
    * n_kept_lines = 0 (they stay visible so a quality gate downstream can
    * drop them deliberately, never silently).
    */
  def removeBoilerplate(docs: DataFrame, idCol: String, textCol: String, minDocs: Long): DataFrame = {
    val lines = lineFrame(docs, idCol, textCol)
    val freq = lineDocFrequency(lines)
    val kept = lines
      .withColumn("line_hash", xxhash64(col("line")))
      .join(freq, "line_hash")
      // blank/whitespace-only lines are STRUCTURE (paragraph breaks), not
      // boilerplate — the empty line trivially appears in ≥ minDocs docs in
      // any real corpus, and filtering it would collapse every paragraph
      .where(col("doc_freq") < minDocs || isBlankLine(col("line")))
    val reassembled = kept
      .groupBy(col("doc_ref"))
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line")), "\n").as("clean_text"),
        // blank structural lines survive the filter above but must NOT
        // count as kept content: a doc whose every CONTENT line was
        // boilerplate must still report n_kept_lines = 0 so the downstream
        // quality gate can drop the empty husk (its clean_text is then
        // whitespace-only)
        count(when(!isBlankLine(col("line")), 1)).as("n_kept_lines"))
    val ids = docs.select(col(idCol).as("id_base"))
    // null-safe join: a null-id document must reunite with its own lines
    // instead of silently losing its whole text to the coalesce("") below.
    // (Null ids group TOGETHER — ids should be unique and non-null by
    // contract; this only keeps the degenerate input visible, not correct.)
    ids.join(reassembled, ids("id_base") <=> reassembled("doc_ref"), "left")
      .select(col("id_base").as(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept_lines"), lit(0L)).as("n_kept_lines"))
  }

  /** Whitespace tokens; blank OR NULL text → empty array (not [""]/null).
    * Empty tokens from boundary whitespace are filtered AFTER the split
    * (trim is space-only, so "a b\n" would otherwise yield a phantom ""
    * token — the Decontamination.ngramHashes fix, applied here), and the
    * class is Unicode-complete so NBSP-separated words split.
    */
  private def toks(text: Column): Column =
    graft.functions.TextFunctions.whitespaceTokens(text)

  /** Adjacent token bigrams as "a b" strings (empty for < 2 tokens). */
  def bigrams(text: Column): Column = ngrams(text, 2)

  /** Adjacent token n-grams as space-joined strings. */
  def ngrams(text: Column, n: Int): Column = {
    require(n >= 1, s"ngrams needs n >= 1, got $n")
    val t = toks(text)
    val m = size(t) - (n - 1)
    val shifted = (0 until n).map(i => slice(t, lit(i + 1), greatest(m, lit(0))))
    shifted.reduce((acc, next) => zip_with(acc, next, (a, b) => concat(a, lit(" "), b)))
  }

  /** Gopher-style within-document repetition metrics:
    * `dup_token_ratio` = fraction of tokens that are repeats of an earlier
    * token (1 - distinct/total); `top_bigram_frac` = share of the most
    * frequent bigram among all bigram occurrences. High values flag
    * machine-generated / keyword-stuffed pages that near-dup sketches
    * cannot catch (they are unique documents, just degenerate ones).
    *
    * Distributed shape: the per-doc bigram mode goes through
    * explode → two hash aggregations keyed by doc id (map-side partials
    * apply) rather than any per-row quadratic array scan.
    */
  def repetitionMetrics(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = toks(col(textCol))
    // Per-row, ZERO-shuffle form (guide §2.4 — remove shuffles outright).
    // Both metrics are functions of ONE document, so the former
    // explode → groupBy(doc, gram) → groupBy(doc) → join-back plan (two
    // aggregation Exchanges plus a join, shuffling every bigram occurrence
    // of the corpus) computed a per-row quantity the slow way. The per-doc
    // bigram mode is the longest run in the SORTED bigram array:
    // max_n = max run length, tot = size(bigrams). Equivalence with the
    // old aggregation plan: grouping counts per distinct gram == run
    // lengths after sorting; max over them is the same number; a doc with
    // no bigrams had no rows in the aggregation (→ null → coalesce 0.0),
    // here size == 0 guards the same 0.0. At corpus scale this turns the
    // operator into a pure map over the scan — nothing crosses the network.
    // blank/null-text docs stay VISIBLE with zero metrics (same posture as
    // removeBoilerplate): a downstream gate drops them deliberately, never
    // silently.
    val bg = bigrams(col(textCol))
    val sorted = array_sort(bg)
    val runState = aggregate(
      sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (st, x) => {
        val run = when(x === st.getField("prev"), st.getField("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(st.getField("best"), run).as("best"))
      })
    val maxRun = runState.getField("best")
    docs.select(col(idCol),
      round(when(size(t) === 0, 0.0)
        .otherwise(lit(1.0) - size(array_distinct(t)).cast("double") / size(t)), 6)
        .as("dup_token_ratio"),
      round(when(size(bg) === 0, 0.0)
        .otherwise(maxRun.cast("double") / size(bg)), 6).as("top_bigram_frac"))
  }

  /** Corpus-wide most frequent token n-grams — contamination/boilerplate
    * analysis (which phrases dominate the crawl). Total-ordered
    * (count desc, gram asc) so top-k is deterministic; at cluster scale the
    * aggregation is map-side-combined and only k rows reach the driver.
    */
  def topNgrams(docs: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    docs.select(explode(ngrams(col(textCol), n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram"))
      .limit(k)
}
