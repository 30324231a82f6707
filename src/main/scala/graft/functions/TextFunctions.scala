package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text normalization / extraction as pure Catalyst `Column` pipelines.
  *
  * Re-expresses the reference's row-at-a-time normalizer
  * (`/root/reference/src/event_dedup/preprocessing/normalizer.py:16-67`,
  * `prefix_stripper.py:46-109`, `synonyms.py:48-67`) as declarative column
  * chains so the whole extraction stage stays inside whole-stage codegen and
  * Catalyst can prune/push as usual. Determinism is the contract: the same
  * input byte sequence always produces the same output bytes
  * (BASELINE.json input_hint: byte-identical extracted text per url).
  */
object TextFunctions {
  import NfcNormalize.nfc

  /** Whitespace class matching Python's `\s` on `str` (used by
    * `re.sub(r"\s+", " ", ...)` at normalizer.py:57): ASCII whitespace,
    * the C1/ISO separators 0x1c-0x1f and 0x85, plus Unicode space
    * separators. Java's bare `\s` is ASCII-only, hence the explicit class.
    */
  val WhitespaceClass: String =
    "[\\s\\u001c-\\u001f\\u0085\\u00a0\\u1680\\u2000-\\u200a\\u2028\\u2029\\u202f\\u205f\\u3000]"

  /** Punctuation stripped by the reference (normalizer.py:63) — note hyphen
    * is deliberately NOT in the set (German compound words).
    */
  val PunctClass: String = "[\"'!?,.:;()\\[\\]{}]"

  /** German umlaut/eszett digraph expansion (normalizer.py:45-53).
    * Applied after lowercasing + NFC, so only composed lowercase forms can
    * remain; the uppercase replacements mirror the reference's edge-case
    * handling for characters that didn't lowercase.
    */
  def expandUmlauts(c: Column): Column = {
    val pairs = Seq(
      "ä" -> "ae", "ö" -> "oe", "ü" -> "ue", "ß" -> "ss",
      "Ä" -> "ae", "Ö" -> "oe", "Ü" -> "ue"
    )
    pairs.foldLeft(c) { case (col, (from, to)) => replace(col, lit(from), lit(to)) }
  }

  /** Collapse runs of whitespace to single spaces and trim (normalizer.py:57).
    * Fused single byte-walk ([[CollapseWs]]); the regex chain stays as
    * [[collapseWhitespaceDeclarative]], the semantic spec side of the
    * differential test.
    */
  def collapseWhitespace(c: Column): Column = toCol(CollapseWs(toExpr(c)))

  /** Built-ins-only reference chain for [[collapseWhitespace]] — also what
    * [[normalizeTextDeclarative]] uses, so the normalize differential test
    * keeps an implementation-independent spec side.
    */
  def collapseWhitespaceDeclarative(c: Column): Column =
    trim(regexp_replace(c, WhitespaceClass + "+", " "))

  /** Unicode-whitespace tokens with empty tokens filtered; null/blank text
    * → empty array. The ONE tokenizer shared by token counting, n-gram
    * hygiene and decontamination — Spark's `trim` strips only ASCII spaces
    * and `split` keeps boundary empty tokens, so per-operator copies of
    * this expression kept re-growing the phantom-empty-token bug.
    */
  def whitespaceTokens(c: Column): Column = toCol(WsTokens(toExpr(c)))

  /** Built-ins-only reference chain for [[whitespaceTokens]] (one
    * java.util.regex pass per evaluation — and consumers that read the
    * token array several times, like the n-gram slices, re-evaluated it up
    * to 4× per row; the fused walk is the hot-path form).
    */
  def whitespaceTokensDeclarative(c: Column): Column =
    filter(split(coalesce(c, lit("")), WhitespaceClass + "+"), t => length(t) > 0)

  /** Longest-first literal synonym substitution (synonyms.py:48-67).
    * The map is ordered longest-key-first at load (synonyms.py:45);
    * we sort here so callers can pass any Map.
    */
  def applySynonyms(c: Column, synonyms: Map[String, String]): Column =
    synonyms.toSeq.sortBy { case (k, _) => (-k.length, k) }.foldLeft(c) {
      case (col, (variant, canonical)) => replace(col, lit(variant), lit(canonical))
    }

  /** Full `normalize_text` pipeline (normalizer.py:16-67):
    * lowercase → NFC → umlaut expansion → whitespace collapse → synonyms →
    * punctuation strip (keep hyphen) → trim.
    *
    * Implemented by the fused [[NormalizeTextExpr]] (one walk instead of
    * ~12 string passes — this is the hot per-row stage); the equivalent
    * declarative chain is kept as [[normalizeTextDeclarative]] and the two
    * are differential-tested on the generated corpus.
    */
  def normalizeText(c: Column, synonyms: Map[String, String] = Map.empty): Column = {
    val ordered = synonyms.toSeq.sortBy { case (k, _) => (-k.length, k) }
    toCol(NormalizeTextExpr(toExpr(c), ordered))
  }

  /** Reference-shaped declarative chain (built-ins only) — the semantic
    * specification for [[normalizeText]].
    */
  def normalizeTextDeclarative(c: Column, synonyms: Map[String, String] = Map.empty): Column = {
    val lowered = lower(c)
    val nfcd = nfc(lowered)
    val umlauted = expandUmlauts(nfcd)
    val ws = collapseWhitespaceDeclarative(umlauted)
    val syn = applySynonyms(ws, synonyms)
    val noPunct = regexp_replace(syn, PunctClass, "")
    // empty/NULL input → empty string (normalizer.py:35-36)
    coalesce(trim(noPunct), lit(""))
  }

  /** Strip the FIRST matching configured prefix, case-insensitively, using
    * the reference's separator variants (prefix_stripper.py:43-86).
    * Non-recursive: a single anchored alternation preserves first-match-wins
    * because Java regex alternation is ordered and we order prefixes exactly
    * as the reference iterates them (dash prefixes, then colon prefixes,
    * then generic prefixes).
    */
  def stripPrefixes(
      c: Column,
      dashPrefixes: Seq[String] = Nil,
      colonPrefixes: Seq[String] = Nil,
      genericPrefixes: Seq[String] = Nil
  ): Column = {
    val dashSeps = Seq(" - ", " -- ", " – ", " — ")
    val alts: Seq[String] =
      dashPrefixes.flatMap(p => dashSeps.map(s => java.util.regex.Pattern.quote(p + s))) ++
        colonPrefixes.map(p => java.util.regex.Pattern.quote(p + ": ")) ++
        genericPrefixes.flatMap(p => dashSeps.map(s => java.util.regex.Pattern.quote(p + s)))
    if (alts.isEmpty) c
    // (?u): Python's re.IGNORECASE folds Unicode — without UNICODE_CASE,
    // Java folds ASCII only and "MÜNCHEN - x" would keep a prefix the
    // reference strips (prefix_stripper.py is case-insensitive on str)
    else trim(regexp_replace(c, "(?ius)^(?:" + alts.mkString("|") + ")", ""))
  }

  /** `normalize_title` = strip prefixes on the ORIGINAL title, then
    * normalize (prefix_stripper.py:89-109).
    */
  def normalizeTitle(
      c: Column,
      dashPrefixes: Seq[String] = Nil,
      colonPrefixes: Seq[String] = Nil,
      genericPrefixes: Seq[String] = Nil,
      synonyms: Map[String, String] = Map.empty
  ): Column =
    normalizeText(stripPrefixes(c, dashPrefixes, colonPrefixes, genericPrefixes), synonyms)

  // -------------------------------------------------------------------------
  // Webtext extraction (ours — SURVEY.md §2.2 P9). The pages generator wraps
  // body text in a fixed deterministic template (FIXTURES.md §1); extraction
  // recovers the body from the html bytes, unescapes the three entities the
  // generator escapes, and normalizes. Deterministic, pure Column chain.
  // -------------------------------------------------------------------------

  /** html BINARY → body text: decode UTF-8, take <article>…</article>,
    * strip any residual tags, unescape entities. Fused single-walk
    * implementation ([[HtmlArticleText]]); declarative spec kept below for
    * the differential test.
    */
  def htmlToText(htmlBin: Column): Column = toCol(HtmlArticleText(toExpr(htmlBin)))

  /** Built-ins-only reference chain for [[htmlToText]]. */
  def htmlToTextDeclarative(htmlBin: Column): Column = {
    val s = htmlBin.cast("string")
    val body = regexp_extract(s, "(?s)<article>(.*)</article>", 1)
    val untagged = regexp_replace(body, "<[^>]*>", " ")
    val unescaped =
      replace(replace(replace(untagged, lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
        lit("&amp;"), lit("&"))
    unescaped
  }

  /** The extraction invariant column: byte-identical per url across runs. */
  def extractText(htmlBin: Column, synonyms: Map[String, String] = Map.empty): Column =
    normalizeText(htmlToText(htmlBin), synonyms)
}
