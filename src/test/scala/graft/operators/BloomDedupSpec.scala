package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = (0 until 500).map(i => (i.toLong, s"corpus document number $i body"))
    .toDF("doc_id", "text")

  // batch: 100 docs already in the corpus (different ids), 100 genuinely new
  private val batch = (
    (1000 until 1100).map(i => (i.toLong, s"corpus document number ${i - 1000} body")) ++
    (1100 until 1200).map(i => (i.toLong, s"brand new batch document $i payload"))
  ).toDF("doc_id", "text")

  private def exactNew: Set[Long] = {
    val seen = corpus.select($"text").distinct()
    batch.join(seen, Seq("text"), "left_anti").select("doc_id").as[Long].collect().toSet
  }

  test("newDocs equals the exact anti-join") {
    val got = BloomDedup.newDocs(batch, corpus, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(got == exactNew)
    assert(got == (1100L until 1200L).toSet)
  }

  test("exact even at absurd false-positive rates (every row a bloom suspect)") {
    val got = BloomDedup.newDocs(batch, corpus, "text", fpp = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(got == exactNew)
  }

  test("mightContain has no false negatives over the corpus") {
    val fp = xxhash64($"text")
    val bloom = BloomDedup.buildBloom(corpus, fp)
    val misses = corpus.where(!BloomDedup.mightContain(bloom, fp)).count()
    assert(misses == 0)
  }

  test("empty corpus: everything is new (bloom of nothing rejects all)") {
    val got = BloomDedup.newDocs(batch, corpus.where(lit(false)), "text")
      .select("doc_id").as[Long].collect().toSet
    assert(got == batch.select("doc_id").as[Long].collect().toSet)
  }
}
