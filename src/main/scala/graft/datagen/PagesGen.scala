package graft.datagen

import org.apache.spark.sql.{Dataset, SparkSession}

/** One synthetic Common-Crawl-style web page (BASELINE.json input_hint schema). */
final case class Page(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)

/** A ground-truth labeled pair (FIXTURES.md §2; reference analog
  * `/root/reference/src/event_dedup/models/ground_truth.py` with
  * label ∈ {same, different} and canonical ordering url_a < url_b;
  * we add label `overlap` for the long-exact-overlap tier).
  */
final case class TruthPair(url_a: String, url_b: String, label: String)

/** Deterministic synthetic `pages` corpus with planted duplicate structure
  * (FIXTURES.md §1). Every row is a pure function of (seed, id) — independent
  * of partitioning and parallelism — so local[8] and local[32] see identical
  * bytes, and re-runs are reproducible (determinism policy, SURVEY.md §7.5).
  *
  * Layout: ids are grouped in blocks of 5; `groupId % 10` selects the block
  * type:
  *   0-5 → five independent singletons
  *   6,7 → near-duplicate cluster of size 2+groupId%3 (cosmetic noise the
  *          normalizer must erase + ≤2 token-level edits), rest singletons
  *   8   → exact-duplicate pair (identical text, distinct urls), rest singletons
  *   9   → long-exact-overlap pair (shared ≥256-char substring, otherwise
  *          different) + a hard-negative pair (same host, similar length,
  *          different content), plus one singleton
  */
object PagesGen {

  val GroupSize = 5

  // -------------------------------------------------------------------
  // Deterministic vocabulary: syllable combinations, umlauts included so
  // the umlaut/NFC mutation paths are exercised.
  // -------------------------------------------------------------------
  private val syl1 = Array("ber", "schwa", "mün", "frei", "kirch", "wald", "stein", "bach",
    "grün", "schön", "hof", "berg", "feld", "dorf", "burg", "tal", "markt", "lich", "fürst", "neu")
  private val syl2 = Array("inger", "heim", "hausen", "weiler", "brunn", "au", "eck", "ried",
    "wang", "stetten", "felden", "zell", "kofen", "statt", "büren", "ingen", "berg", "see", "moos", "gau")
  private val syl3 = Array("fest", "tag", "abend", "markt", "lauf", "zug", "spiel", "probe",
    "messe", "woche")

  val vocab: Array[String] = {
    val v = for (a <- syl1; b <- syl2) yield a + b
    val w = for (a <- syl1; c <- syl3) yield a + c
    v ++ w // 20*20 + 20*10 = 600 words
  }

  private val langs = Array("de", "de", "de", "en", "en", "fr") // weighted
  private val tlds = Array("de", "com", "org", "net")

  private def rng(seed: Long, a: Long, b: Long = 0L): java.util.SplittableRandom =
    new java.util.SplittableRandom(seed * 1000003L + a * 7919L + b * 104729L)

  /** Zipf-skewed host id: a few hot hosts carry a large share of pages,
    * exercising the skew/salting path (FIXTURES.md §1).
    */
  def hostOf(seed: Long, id: Long): String = {
    val r = rng(seed, id, 1)
    val u = r.nextDouble()
    val nHosts = 50
    val h = math.min(nHosts - 1, (math.pow(u, 3.0) * nHosts).toInt)
    s"host$h.example.${tlds(h % tlds.length)}"
  }

  def urlOf(seed: Long, id: Long): String = {
    val groupId = id / GroupSize
    val slot = id % GroupSize
    // hard-negative pair (type 9, slots 2,3) shares a host: same-domain,
    // similar-length, different-content (same-venue-different-event analog,
    // reference `.planning/PROJECT.md:76`)
    val hostId = if (groupId % 10 == 9 && slot == 3) id - 1 else id
    s"https://${hostOf(seed, hostId)}/page/$id"
  }

  /** Word draws for one text body. `stream` keys the rng's b-channel —
    * each textOf branch gets its OWN stream rather than an id offset into
    * a shared one: id-offset keyspaces (`id + 1000000` on the groupId
    * stream) collide once ids/groupIds reach the offset, silently planting
    * word-identical prefixes between unrelated pages at multi-million-row
    * scale — real ≥256-char overlaps the truth table knows nothing about,
    * which would score as spurious false positives. Distinct b values
    * cannot collide for ANY (a, a') pair: a·7919 + b·104729 = a'·7919 +
    * b'·104729 requires (b−b')·104729 ≡ 0 (mod 7919), and 104729 is
    * coprime to 7919 while |b−b'| < 7919.
    */
  private def baseWords(seed: Long, key: Long, stream: Long, nMin: Int, nMax: Int): Array[String] = {
    val r = rng(seed, key, stream)
    val n = nMin + r.nextInt(nMax - nMin + 1)
    Array.fill(n)(vocab(r.nextInt(vocab.length)))
  }

  /** Cosmetic noise the extraction stage must erase: whitespace runs,
    * punctuation, case flips, umlaut composed/decomposed/digraph variants.
    * Token-level edits (swap / delete) are capped at 2 so pairwise shingle
    * Jaccard of two variants stays above the verify threshold (0.8 at n=3,
    * ≥120 words).
    */
  private def mutate(words: Array[String], r: java.util.SplittableRandom): String = {
    val ws = words.clone()
    // ≤2 token-level edits
    val edits = r.nextInt(3)
    var e = 0
    while (e < edits && ws.length > 4) {
      val i = r.nextInt(ws.length - 1)
      if (r.nextBoolean()) { val t = ws(i); ws(i) = ws(i + 1); ws(i + 1) = t } // swap
      else ws(i) = vocab(r.nextInt(vocab.length)) // replace
      e += 1
    }
    // cosmetic per-token noise
    val sb = new StringBuilder
    var i = 0
    while (i < ws.length) {
      var w = ws(i)
      r.nextInt(8) match {
        case 0 => w = w.toUpperCase
        case 1 => w = w.capitalize
        case 2 => w = w.replace("ü", "ue").replace("ä", "ae").replace("ö", "oe")
        case 3 => w = java.text.Normalizer.normalize(w, java.text.Normalizer.Form.NFD)
        case 4 => w = w + (if (r.nextBoolean()) "," else ".")
        case _ => ()
      }
      sb.append(w)
      if (i < ws.length - 1) sb.append(r.nextInt(6) match {
        case 0 => "  "
        case 1 => " \t"
        case 2 => "\n"
        case _ => " "
      })
      i += 1
    }
    sb.toString
  }

  private def plainJoin(words: Array[String]): String = words.mkString(" ")

  /** Which cluster slot-set does this block type plant? Returns the list of
    * slots forming the planted duplicate cluster (empty = all singletons).
    */
  def dupSlots(groupId: Long): Seq[Int] = (groupId % 10) match {
    case 6 | 7 => 0 until (2 + (groupId % 3).toInt)
    case 8     => Seq(0, 1)
    case _     => Seq.empty
  }

  def textOf(seed: Long, id: Long): String = {
    val groupId = id / GroupSize
    val slot = (id % GroupSize).toInt
    val gtype = (groupId % 10).toInt
    val dups = dupSlots(groupId)

    if (dups.contains(slot)) {
      val base = baseWords(seed, groupId, 2, 120, 220)
      if (gtype == 8) plainJoin(base) // exact duplicates: identical text
      else if (slot == 0) plainJoin(base)
      else mutate(base, rng(seed, id, 3))
    } else if (gtype == 9 && (slot == 0 || slot == 1)) {
      // long-exact-overlap pair: shared ≥256-char run, distinct remainder
      val shared = baseWords(seed, groupId, 2, 60, 80) // ~60-80 words ≈ 500+ chars
      val own = baseWords(seed, id, 12, 100, 160)
      val (head, tail) = own.splitAt(own.length / 2)
      plainJoin(head ++ shared ++ tail)
    } else if (gtype == 9 && (slot == 2 || slot == 3)) {
      // hard negative: same length band, same host (url handled separately)
      plainJoin(baseWords(seed, id, 13, 140, 160))
    } else {
      plainJoin(baseWords(seed, id, 14, 80, 250))
    }
  }

  private def escapeHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Deterministic html wrapper: boilerplate nav/footer around the body —
    * the extraction stage must recover exactly `text` from these bytes.
    */
  def htmlOf(url: String, text: String, lang: String): Array[Byte] = {
    val title = text.split("\\s+", 6).take(5).mkString(" ")
    val page =
      s"""<html lang="$lang"><head><title>${escapeHtml(title)}</title></head>
         |<body><nav><a href="/">Home</a> | <a href="/impressum">Impressum</a> | <a href="/kontakt">Kontakt</a></nav>
         |<article>${escapeHtml(text)}</article>
         |<footer>© example.org — <a href="$url">permalink</a></footer></body></html>""".stripMargin
    page.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  def pageOf(seed: Long, id: Long): Page = {
    val url = urlOf(seed, id)
    val text = textOf(seed, id)
    val groupId = id / GroupSize
    val lang = langs(rng(seed, groupId, 4).nextInt(langs.length))
    val ts = new java.sql.Timestamp(1735689600000L + id * 1000L) // 2025-01-01 + id sec
    Page(url, ts, htmlOf(url, text, lang), text, lang)
  }

  def pages(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[Page] = {
    import spark.implicits._
    spark.range(n).map { id => PagesGen.pageOf(seed, id) }
  }

  /** Ground-truth pairs implied by the planted layout. `same` pairs drive the
    * recall ≥0.99 gate; `overlap` pairs validate the substring tier;
    * `different` pairs are the hard negatives.
    */
  def truthPairs(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[TruthPair] = {
    import spark.implicits._
    val numGroups = (n + GroupSize - 1) / GroupSize
    spark.range(numGroups).flatMap { groupId =>
      val base = groupId * GroupSize
      val gtype = (groupId % 10).toInt
      val dups = PagesGen.dupSlots(groupId).map(s => base + s).filter(_ < n)
      val dupPairs = for {
        i <- dups.indices; j <- (i + 1) until dups.length
      } yield {
        val (a, b) = (PagesGen.urlOf(seed, dups(i)), PagesGen.urlOf(seed, dups(j)))
        if (a < b) TruthPair(a, b, "same") else TruthPair(b, a, "same")
      }
      // each planted pair gates on ITS OWN members' existence: a corpus cut
      // mid-group (base+1 < n ≤ base+3) still plants the overlap pages, so
      // omitting their truth pair would count a correct detection as a
      // false positive
      val extra = if (gtype == 9) {
        val o =
          if (base + 1 < n) Seq {
            val (a, b) = (PagesGen.urlOf(seed, base), PagesGen.urlOf(seed, base + 1))
            if (a < b) TruthPair(a, b, "overlap") else TruthPair(b, a, "overlap")
          } else Seq.empty
        val h =
          if (base + 3 < n) Seq {
            val (a, b) = (PagesGen.urlOf(seed, base + 2), PagesGen.urlOf(seed, base + 3))
            if (a < b) TruthPair(a, b, "different") else TruthPair(b, a, "different")
          } else Seq.empty
        o ++ h
      } else Seq.empty
      dupPairs ++ extra
    }
  }
}
