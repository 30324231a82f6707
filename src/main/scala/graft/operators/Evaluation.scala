package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Evaluation harness (SURVEY.md §2.9 Q15-Q17; reference
  * `/root/reference/src/event_dedup/evaluation/metrics.py:35-83` and
  * `evaluation/harness.py:192-230`).
  *
  * Pair sets are DataFrames with canonical ordering (url_a < url_b / id_a <
  * id_b); confusion counts come from set-op joins (TP = inner, FP/FN = anti)
  * — the distributed form of the reference's Python set algebra.
  */
object Evaluation {

  /** Precision/recall/F1 of predicted pairs vs labeled truth pairs.
    * `truth` carries label ∈ {same, different}; unlabeled predicted pairs
    * are ignored (reference semantics: metrics only over labeled pairs).
    */
  def pairMetrics(predicted: DataFrame, truth: DataFrame,
      keys: Seq[String] = Seq("url_a", "url_b")): DataFrame = {
    val pred = predicted.select(keys.map(col): _*)
    val same = truth.where(col("label") === "same").select(keys.map(col): _*)
    val diff = truth.where(col("label") === "different").select(keys.map(col): _*)
    val spark = predicted.sparkSession
    import spark.implicits._
    val tp = pred.join(same, keys, "left_semi").count()
    val fp = pred.join(diff, keys, "left_semi").count()
    val fn = same.join(pred, keys, "left_anti").count()
    val tn = diff.join(pred, keys, "left_anti").count()
    val precision = if (tp + fp == 0) 0.0 else tp.toDouble / (tp + fp)
    val recall = if (tp + fn == 0) 0.0 else tp.toDouble / (tp + fn)
    val f1 = if (precision + recall == 0) 0.0 else 2 * precision * recall / (precision + recall)
    Seq((tp, fp, fn, tn, precision, recall, f1))
      .toDF("tp", "fp", "fn", "tn", "precision", "recall", "f1")
  }

  /** Q15 threshold sweep over a CACHED scored-pair DataFrame: re-decide at
    * each threshold without re-scoring (harness.py:192-230 caches exactly
    * this way). `scored` needs (url_a, url_b, score).
    */
  def thresholdSweep(scored: DataFrame, truth: DataFrame,
      thresholds: Seq[Double] = Seq(0.5, 0.6, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95)): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val cached = scored.cache()
    val rows = thresholds.map { t =>
      val pred = cached.where(col("score") >= t)
      val m = pairMetrics(pred, truth).collect()(0)
      (t, m.getAs[Long]("tp"), m.getAs[Long]("fp"), m.getAs[Long]("fn"),
        m.getAs[Double]("precision"), m.getAs[Double]("recall"), m.getAs[Double]("f1"))
    }
    cached.unpersist()
    rows.toDF("threshold", "tp", "fp", "fn", "precision", "recall", "f1")
  }
}
