package graft.pipeline

import graft.{RunDedup, SparkSpec}
import graft.datagen.PagesGen
import java.nio.file.Files

/** The spark-submit entrypoint (`graft.RunDedup`) end-to-end: arg parsing,
  * a full run writing canonicals + metrics, and checkpointed re-run reuse
  * (second invocation reads stages back instead of recomputing — the
  * north_rule's resumability, exercised through the production main).
  */
class RunDedupSpec extends SparkSpec {

  test("parse: required args enforced, flags recognized") {
    val a = RunDedup.parse(Array(
      "--input", "/in", "--output", "/out", "--checkpoint", "/ck",
      "--stages-out", "--metrics", "/m.json"))
    assert(a.input == "/in" && a.output == "/out")
    assert(a.checkpoint.contains("/ck") && a.stagesOut && a.metrics.contains("/m.json"))
    intercept[IllegalArgumentException](RunDedup.parse(Array("--output", "/out")))
    intercept[IllegalArgumentException](RunDedup.parse(Array("--input", "/in", "--bogus")))
  }

  test("run: pages parquet in, canonicals + stage tables + metrics out, resumable") {
    val dir = Files.createTempDirectory("graft_run_dedup").toString
    val in = s"$dir/pages"; val out = s"$dir/canonicals"; val ck = s"$dir/ckpt"
    PagesGen.pages(spark, 400L).toDF.write.parquet(in)

    val args = RunDedup.parse(Array(
      "--input", in, "--output", out, "--checkpoint", ck, "--stages-out"))
    val stats = RunDedup.run(spark, args)

    val canon = spark.read.parquet(out)
    assert(canon.count() > 0 && canon.count() == stats("canonical_rows"))
    assert(canon.columns.contains("canonical_url"))
    // side tables for downstream consumers
    assert(spark.read.parquet(s"${out}_decisions").count() >= 0)
    val labels = spark.read.parquet(s"${out}_labels")
    assert(labels.count() == 400L) // full vertex universe, singletons kept
    // lineage-derived stage row counts surfaced in the summary
    assert(stats.keys.exists(_.startsWith("rows_")))
    assert(stats("rows_labels") == 400L)

    // Re-run with the same config hash: every stage must be read back from
    // the checkpoint, not recomputed — meta sidecars' wall_ms are untouched.
    val metaBefore = new java.io.File(ck).listFiles()
      .filter(_.getName.endsWith("__meta.json")).map(f => f.getName -> f.lastModified).toMap
    assert(metaBefore.nonEmpty)
    val stats2 = RunDedup.run(spark, args)
    val metaAfter = new java.io.File(ck).listFiles()
      .filter(_.getName.endsWith("__meta.json")).map(f => f.getName -> f.lastModified).toMap
    assert(metaAfter == metaBefore, "checkpointed stages were recomputed on re-run")
    assert(stats2("canonical_rows") == stats("canonical_rows"))

    // CHANGED input under the SAME checkpoint dir must re-run, not silently
    // replay the previous batch (checkpoint key = config hash + input
    // fingerprint): a recurring job reusing one --checkpoint dir is the
    // normal deployment shape.
    PagesGen.pages(spark, 150L).toDF.write.mode("overwrite").parquet(in)
    val stats3 = RunDedup.run(spark, args)
    assert(stats3("rows_labels") == 150L,
      s"stale checkpoint replayed: ${stats3.filter(_._1.startsWith("rows_"))}")
    assert(spark.read.parquet(s"${out}_labels").count() == 150L)
    // and the rows_* summary must not mix in the 400-page batch's lineage
    assert(stats3("rows_extracted") == 150L)
  }
}
