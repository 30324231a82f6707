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
    // the RANGE bounds themselves must reach the scan — IsNotNull alone
    // (which Spark pushes for any referenced column) would mask losing the
    // actual date-range pushdown
    assert(p.contains("GreaterThanOrEqual(o_orderdate") ||
      p.contains("GreaterThan(o_orderdate"),
      "expected the o_orderdate range bound pushed down:\n" + p.take(2000))
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

  test("hot-key pruning uses a broadcast anti-join, not a shuffle") {
    // the bucket must actually be HOT or fusedCandidates elides the whole
    // pruning subplan (hotArr empty) and the audit is vacuous — 40
    // identical docs over maxBucketSize=10 forces it in
    val cfg0 = graft.config.GraftConfig.default
    val cfg = cfg0.copy(lsh = cfg0.lsh.copy(maxBucketSize = 10))
    val docs = spark.range(40L)
      .selectExpr("id AS url", "'a b c d e f g h i j' AS extracted_text")
    val sigs = graft.operators.MinHashLsh.signatures(docs, cfg)
    val cands = graft.operators.MinHashLsh.fusedCandidates(sigs, cfg)
    val p = cands.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      "hot-key pruning must plan a broadcast LeftAnti join:\n" + p.take(3000))
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
    // must be the top-k operator — a full Sort + GlobalLimit is exactly the
    // regression this audit exists to catch, so GlobalLimit must not count
    assert(p.contains("TakeOrderedAndProject"),
      "expected TakeOrderedAndProject (top-k), not a global sort:\n" + p.take(2000))
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
