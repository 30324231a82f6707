package graft

import org.apache.spark.sql.functions._

/** Physical-plan audits: the plans we ship are the plans we mean
  * (SURVEY.md §4 — filters reach the scan, small sides broadcast, column
  * pruning holds, codegen spans cover the per-row stages).
  */
class PlanAuditSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("q03: date-range predicates are pushed to the parquet scan") {
    val p = planOf("q03_date_range_agg")
    assert(p.contains("PushedFilters"), p.take(500))
    assert(p.contains("IsNotNull(o_orderdate)") || p.contains("GreaterThanOrEqual(o_orderdate"),
      "expected o_orderdate pushdown:\n" + p.take(2000))
  }

  test("q01: column pruning — scan reads only the projected columns") {
    val p = planOf("q01_search_ilike")
    // documents has (doc_id, text, lang, source, n_chars); n_chars must NOT be read
    assert(p.contains("ReadSchema"))
    assert(!p.contains("n_chars"), "scan should prune n_chars:\n" + p.take(2000))
  }

  test("q02: IN-style OR filter is pushed down") {
    val p = planOf("q02_multi_or_filter")
    assert(p.contains("PushedFilters") &&
      (p.contains("Or(EqualTo(o_orderpriority") || p.contains("In(o_orderpriority")),
      p.take(2000))
  }

  test("q11: threshold sweep broadcasts the literal threshold table") {
    val p = planOf("q11_threshold_sweep")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("hot-key pruning uses a broadcast join, not a shuffle") {
    val cfg = graft.config.GraftConfig.default
    val sigs = graft.operators.MinHashLsh.signatures(
      Seq((1L, "a b c d e f g h")).toDF("url", "extracted_text"), cfg)
    val cands = graft.operators.MinHashLsh.fusedCandidates(sigs, cfg)
    val p = cands.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("extraction + signature stage stays inside whole-stage codegen") {
    val pages = graft.datagen.PagesGen.pages(spark, 10L).toDF()
    val cfg = graft.config.GraftConfig.default
    val ext = new graft.pipeline.DedupPipeline(spark, cfg).extracted(pages)
    val p = ext.queryExecution.executedPlan.toString
    // "*(n)" marks a whole-stage-codegen span; the fused extraction
    // expressions must sit inside one, not fall back to interpreted eval
    val projLine = p.linesIterator.find(_.contains("normalize_text")).getOrElse("")
    assert(projLine.contains("*("), "extraction Project not codegen'd:\n" + p.take(2000))
  }

  test("signature stage evaluates the fused sketch exactly once per row") {
    val pages = graft.datagen.PagesGen.pages(spark, 10L).toDF()
    val cfg = graft.config.GraftConfig.default
    val p = new graft.pipeline.DedupPipeline(spark, cfg)
    val plan = p.signatures(p.extracted(pages)).queryExecution.executedPlan.toString
    // inline(array(doc_signature(...))) must survive as ONE Generate; four
    // GetStructField projections would re-run the sketch 4x per row
    val hits = "doc_signature".r.findAllIn(plan).size
    assert(hits == 1, s"expected one doc_signature in the plan, got $hits:\n" + plan.take(2000))
  }

  test("q05: offset/limit does not global-sort-materialize the full table") {
    val p = planOf("q05_sort_paginate")
    assert(p.contains("TakeOrderedAndProject") || p.contains("GlobalLimit"), p.take(2000))
  }

  test("decontamination joins the benchmark gram table via broadcast") {
    val docs = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val grams = graft.operators.Decontamination.benchmarkGrams(docs, "text", n = 3)
    val p = graft.operators.Decontamination
      .report(docs, "doc_id", "text", grams, n = 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("bloom membership probe is a scan-local filter, not a join") {
    // spark.range (not a local Seq): ConvertToLocalRelation would fold a
    // LocalRelation filter at plan time and leave nothing to audit
    val corpus = spark.range(50)
      .select($"id".as("doc_id"), concat(lit("doc "), $"id").as("text"))
    val bloom = graft.operators.BloomDedup.buildBloom(corpus, xxhash64($"text"))
    val probed = corpus.where(
      graft.operators.BloomDedup.mightContain(bloom, xxhash64($"text")))
    val p = probed.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), p.take(2000))
    assert(!p.contains("Join"), "bloom probe must not plan a join:\n" + p.take(2000))
  }
}
