package graft.streaming

import graft.SparkSpec
import graft.datagen.PagesGen
import org.apache.spark.sql.functions._
import java.nio.file.Files

class PagesStreamSpec extends SparkSpec {
  import spark.implicits._

  test("S13: file-source stream signs new pages incrementally and resumes") {
    val base = Files.createTempDirectory("graft-stream").toString
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    new java.io.File(in).mkdirs()

    // batch 1: first 100 pages
    PagesGen.pages(spark, 100L).toDF().write.mode("append").parquet(in)
    val q1 = PagesStream.signatureStream(spark, in, out, ckpt)
    q1.awaitTermination()
    val n1 = spark.read.parquet(out).count()
    assert(n1 == 100)

    // batch 2: 50 more pages arrive → only the new files are processed
    spark.range(100L, 150L).map(id => PagesGen.pageOf(42L, id)).toDF()
      .write.mode("append").parquet(in)
    val q2 = PagesStream.signatureStream(spark, in, out, ckpt)
    q2.awaitTermination()
    val after = spark.read.parquet(out)
    assert(after.count() >= 150)
    // signatures present and valid
    assert(after.where($"minhash".isNotNull).count() >= 140)
    assert(after.columns.contains("batch_id"))
  }

  test("streaming exact-dedup emits first page per fingerprint (≡ batch distinct)") {
    val base = Files.createTempDirectory("graft-dedup-stream").toString
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    new java.io.File(in).mkdirs()

    val pages = PagesGen.pages(spark, 200L).toDF()
    pages.write.mode("append").parquet(in)
    PagesStream.dedupStream(spark, in, out, ckpt, watermarkDelay = "1 hour")
      .awaitTermination()

    val got = spark.read.parquet(out)
    // batch oracle: distinct content fingerprints over the same pages
    val expected = pages
      .select(graft.operators.TextAnalysis.fingerprint64(
        graft.functions.TextFunctions.extractText($"html")).as("fp"))
      .distinct().count()
    assert(got.count() == expected, s"stream=${got.count()} batch=$expected")
    assert(got.count() < 200, "planted exact dups must collapse")
    assert(got.select("fp").distinct().count() == got.count())

    // resume: a second batch of NEW pages only adds new fingerprints
    spark.range(200L, 260L).map(id => PagesGen.pageOf(42L, id)).toDF()
      .write.mode("append").parquet(in)
    PagesStream.dedupStream(spark, in, out, ckpt, watermarkDelay = "1 hour")
      .awaitTermination()
    val after = spark.read.parquet(out)
    assert(after.count() > got.count() && after.count() <= got.count() + 60)
  }
}
