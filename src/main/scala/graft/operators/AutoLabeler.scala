package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.FuzzKernels

/** Ground-truth generation: candidate pairs + the reference's conservative
  * auto-labeling cascade (SURVEY.md §2.9 Q18; reference
  * `/root/reference/src/event_dedup/ground_truth/auto_labeler.py:83-182` and
  * `ground_truth/candidate_generator.py:36-127`).
  *
  * Rules (ordered, intentionally stricter than the matcher):
  *   same/high:    title_sim ≥ 0.90 ∧ same_city
  *   same/medium:  title_sim ≥ 0.70 ∧ same_city ∧ desc_sim ≥ 0.80
  *   diff/high:    title_sim < 0.40
  *   diff/high:    different_city ∧ title_sim < 0.70
  *   else          skip (ambiguous)
  * where same_city / different_city require BOTH cities non-empty
  * (auto_labeler.py:68-80), title/desc sims are rapidfuzz token_sort_ratio
  * over normalized fields ([[FuzzKernels]] is the exact-parity kernel), and
  * desc_sim is 0.0 when either side is missing (auto_labeler.py:50-57).
  */
object AutoLabeler {

  /** Cross-source candidate pairs from a blocking-key frame with seeded
    * hard-negative sampling (candidate_generator.py:36-127): explode keys →
    * self-join (canonical order, cross-source only, deduped) → title sim →
    * keep pairs ≥ minTitleSim plus a seeded `hardNegativeRatio` sample of
    * the below-threshold pairs (rand(seed) — the distributed re-expression
    * of `random.Random(seed).sample`, same ratio, deterministic per seed).
    *
    * Input needs (id, source, title_norm, city_norm, blocking_keys).
    */
  def candidates(events: DataFrame, minTitleSim: Double = 0.30,
      hardNegativeRatio: Double = 0.20, seed: Long = 42L): DataFrame = {
    val keyed = events.select(col("id"), col("source"), col("title_norm"),
      col("city_norm"), explode(col("blocking_keys")).as("key"))
    val a = keyed.toDF("id_a", "source_a", "title_a", "city_a", "key")
    val b = keyed.toDF("id_b", "source_b", "title_b", "city_b", "key")
    val pairs = a.join(b, Seq("key"))
      .where(col("id_a") < col("id_b") && col("source_a") =!= col("source_b"))
      .drop("key")
      .dropDuplicates("id_a", "id_b")
      .withColumn("title_sim",
        FuzzKernels.token_sort_ratio(coalesce(col("title_a"), lit("")),
          coalesce(col("title_b"), lit(""))))
    // ONE pass: the union-of-two-filters form evaluated the blocking-key
    // self-join and the O(len²) fuzzy kernel twice over the same uncached
    // frame. rand is drawn before the predicate so the hard-negative
    // sample stays seeded-deterministic for a given frame.
    pairs.withColumn("__r", rand(seed))
      .where(col("title_sim") >= minTitleSim || col("__r") < hardNegativeRatio)
      .drop("__r")
  }

  private def nonEmpty(c: Column): Column = c.isNotNull && length(c) > 0

  /** The labeling cascade over a pair frame carrying
    * (title_sim, desc_a, desc_b, city_a, city_b). Appends
    * (desc_sim, label, confidence, reason).
    */
  def label(pairs: DataFrame): DataFrame = {
    val descSim = when(!nonEmpty(col("desc_a")) || !nonEmpty(col("desc_b")), 0.0)
      .otherwise(FuzzKernels.token_sort_ratio(col("desc_a"), col("desc_b")))
    val sameCity = nonEmpty(col("city_a")) && nonEmpty(col("city_b")) &&
      col("city_a") === col("city_b")
    val diffCity = nonEmpty(col("city_a")) && nonEmpty(col("city_b")) &&
      col("city_a") =!= col("city_b")
    // ONE when-cascade producing struct(label, confidence, reason): the
    // rule and its confidence/reason must come from the same branch — three
    // parallel cascades would let a threshold tweak in one silently
    // desynchronize the other two
    def verdict(l: String, c: String, r: String) =
      struct(lit(l).as("label"),
        (if (c == null) lit(null).cast("string") else lit(c)).as("confidence"),
        (if (r == null) lit(null).cast("string") else lit(r)).as("reason"))
    pairs
      .withColumn("desc_sim", descSim)
      .withColumn("__v",
        when(col("title_sim") >= 0.90 && sameCity,
          verdict("same", "high", "title_sim>=0.90 + same_city"))
          .when(col("title_sim") >= 0.70 && sameCity && col("desc_sim") >= 0.80,
            verdict("same", "medium", "title_sim>=0.70 + same_city + desc_sim>=0.80"))
          .when(col("title_sim") < 0.40,
            verdict("different", "high", "title_sim<0.40"))
          .when(diffCity && col("title_sim") < 0.70,
            verdict("different", "high", "different_city + title_sim<0.70"))
          .otherwise(verdict("skip", null, null)))
      .withColumn("label", col("__v.label"))
      .withColumn("confidence", col("__v.confidence"))
      .withColumn("reason", col("__v.reason"))
      .drop("__v")
  }
}
