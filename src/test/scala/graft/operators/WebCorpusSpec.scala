package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WebCorpusSpec extends SparkSpec {
  import spark.implicits._

  test("removeBoilerplate drops high-DF lines, keeps order, keeps empty docs visible") {
    // 4 docs; "BANNER" in all 4 (df=4 ≥ 3 → dropped); "rare" in 2 (kept);
    // doc 4 is banner-only → comes back empty, not missing.
    val docs = Seq(
      (1L, "BANNER\nalpha one\nrare"),
      (2L, "BANNER\nbeta two\nrare"),
      (3L, "gamma three\nBANNER"),
      (4L, "BANNER")
    ).toDF("doc_id", "text")
    val got = WebCorpus.removeBoilerplate(docs, "doc_id", "text", minDocs = 3L)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "alpha one\nrare", 2L),
      (2L, "beta two\nrare", 2L),
      (3L, "gamma three", 1L),
      (4L, "", 0L)))
  }

  test("removeBoilerplate: blank lines are structure, never boilerplate") {
    // the empty line appears in every doc (df = 3 >= minDocs) but must
    // survive — dropping it would collapse all paragraph breaks corpus-wide
    val docs = Seq(
      (1L, "BANNER\npara one\n\npara two"),
      (2L, "BANNER\nother\n\nmore"),
      (3L, "BANNER\nthird\n\ntail")
    ).toDF("doc_id", "text")
    val got = WebCorpus.removeBoilerplate(docs, "doc_id", "text", minDocs = 3L)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    // the blank line survives IN clean_text but does not count as kept
    // CONTENT (n_kept_lines = 2, not 3 — see the empty-husk gate test)
    assert(got.head == ((1L, "para one\n\npara two", 2L)))
  }

  test("removeBoilerplate: kept blank lines never count toward n_kept_lines") {
    // doc 1's every CONTENT line is boilerplate; the blank line between
    // them survives (structure) but the doc must still report
    // n_kept_lines = 0 so a downstream `n_kept_lines > 0` quality gate
    // drops the empty husk instead of passing it into the corpus
    val docs = Seq(
      (1L, "BANNER\n\nFOOTER"),
      (2L, "BANNER\ncontent two\nFOOTER"),
      (3L, "BANNER\ncontent three\nFOOTER")
    ).toDF("doc_id", "text")
    val got = WebCorpus.removeBoilerplate(docs, "doc_id", "text", minDocs = 3L)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(got(0) == ((1L, "", 0L)), s"empty husk leaked: ${got(0)}")
    assert(got(1) == ((2L, "content two", 1L)))
  }

  test("lineDocFrequency counts distinct docs, not occurrences") {
    val docs = Seq((1L, "x\nx\ny"), (2L, "x")).toDF("doc_id", "text")
    val freq = WebCorpus.lineDocFrequency(WebCorpus.lineFrame(docs, "doc_id", "text"))
      .join(Seq("x", "y").toDF("line").select(col("line"), xxhash64(col("line")).as("line_hash")), "line_hash")
      .select("line", "doc_freq").as[(String, Long)].collect().toMap
    assert(freq == Map("x" -> 2L, "y" -> 1L)) // doc 1's double "x" counts once
  }

  test("ngrams produces adjacent space-joined grams; short/blank → empty") {
    val got = Seq("a b c d", "a b", "a", "", "  ")
      .toDF("t").select(WebCorpus.ngrams($"t", 3)).as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("a b c", "b c d"), Seq(), Seq(), Seq(), Seq()))
  }

  test("repetitionMetrics: distinct text → 0 dup ratio; degenerate text → high") {
    val docs = Seq(
      (1L, "one two three four five"),
      (2L, "spam spam spam spam spam spam"),
      (3L, "solo")
    ).toDF("doc_id", "text")
    val m = WebCorpus.repetitionMetrics(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Double, Double)].collect().toSeq
    assert(m(0) == ((1L, 0.0, 0.25)))     // 5 distinct toks; 4 unique bigrams → top = 1/4
    assert(m(1)._2 > 0.8 && m(1)._3 == 1.0) // all-same tokens: one bigram dominates
    assert(m(2) == ((3L, 0.0, 0.0)))      // single token → no bigrams → 0
  }

  test("repetitionMetrics keeps blank/null-text docs visible with zero metrics") {
    // same posture as removeBoilerplate: the empty husk must stay in the
    // frame so a downstream quality gate drops it DELIBERATELY — a dropped
    // row would pass unseen through a gate that inner-joins these metrics
    val docs = Seq(
      (1L, "alpha beta alpha beta"),
      (2L, ""),
      (3L, "   "),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val m = WebCorpus.repetitionMetrics(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Double, Double)].collect().toSeq
    assert(m.map(_._1) == Seq(1L, 2L, 3L, 4L), s"blank/null docs vanished: $m")
    assert(m(1) == ((2L, 0.0, 0.0)) && m(2) == ((3L, 0.0, 0.0)) &&
      m(3) == ((4L, 0.0, 0.0)), s"blank/null docs must report zero metrics: $m")
  }

  test("removeBoilerplate: a null-id doc keeps its text (null-safe reassembly join)") {
    // three NON-null docs carry BANNER past minDocs (countDistinct skips
    // null doc_refs, so the null doc can't contribute to doc frequency)
    val docs = Seq(
      (Option(1L), "BANNER\nkeep me"),
      (Option(2L), "BANNER\nother text"),
      (Option(3L), "BANNER\nthird text"),
      (Option.empty[Long], "BANNER\nnull id text")
    ).toDF("doc_id", "text")
    val got = WebCorpus.removeBoilerplate(docs, "doc_id", "text", minDocs = 3L)
      .as[(Option[Long], String, Long)].collect().toSeq
    val nullRow = got.find(_._1.isEmpty).get
    assert(nullRow._2 == "null id text" && nullRow._3 == 1L,
      s"null-id doc lost its text: $got")
  }

  test("ngrams rejects n < 1 with a clear argument error") {
    val e = intercept[IllegalArgumentException] {
      WebCorpus.ngrams(lit("a b c"), 0)
    }
    assert(e.getMessage.contains("n >= 1"), e.getMessage)
  }

  test("topNgrams is total-ordered and respects k") {
    val docs = Seq("a b c", "a b c", "a b d", "z z z").toDF("text")
    val got = WebCorpus.topNgrams(docs, "text", n = 2, k = 3)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a b", 3L), ("b c", 2L), ("z z", 2L))) // tie at n=2 broken by gram asc
  }
}
