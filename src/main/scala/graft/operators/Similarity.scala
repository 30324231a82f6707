package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import graft.functions.{toCol, toExpr}

/** Approximate-nearest-neighbor / embedding-similarity operators over an
  * `Array[Float]` embedding column.
  *
  * Baseline: brute-force cosine top-k (exact; O(Q·N) — the small-Q or
  * small-N path). Scale path: random-hyperplane LSH bucketing — candidates
  * share a bucket key, exact cosine re-ranks within buckets; recall tunable
  * via number of hash tables. Embedding-cosine near-dup pairs reuse the
  * bucket join (same skew posture as the MinHash band join).
  */
object Similarity {

  /** Dot product of two float-array columns (sequential fold — deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    when(normA === 0.0 || normB === 0.0, 0.0).otherwise(dot(a, b) / (normA * normB))

  /** Exact brute-force cosine top-k: for each row of `queries`, the k nearest
    * rows of `corpus` (excluding self by id). Deterministic tie-break on
    * neighbor id. Broadcast the query side — Q is small by contract.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"
  ): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vec_c"))
      .withColumn("norm_c", l2Norm(col("vec_c")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("vec_q"))
      .withColumn("norm_q", l2Norm(col("vec_q")))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("vec_q"), col("vec_c"), col("norm_q"), col("norm_c")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Random-hyperplane LSH bucket keys: `tables` independent 16-bit sketches.
    * Two vectors with cosine θ collide in one table with prob (1-θ/π)^16.
    */
  def lshBuckets(vec: Column, tables: Int = 8, bitsPerTable: Int = 16, seed: Long = 42L): Column =
    toCol(CosineLshKeys(toExpr(vec), tables, bitsPerTable, seed))

  /** ANN via LSH buckets: candidates = bucket collisions in any table, exact
    * cosine re-rank, top-k per query. The scale path — no cross join.
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      tables: Int = 8, bitsPerTable: Int = 16, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"
  ): DataFrame = {
    val cb = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vec_c"),
        explode(lshBuckets(col(vecCol), tables, bitsPerTable, seed)).as("bucket"))
    val qb = queries.select(col(idCol).as("query_id"), col(vecCol).as("vec_q"),
        explode(lshBuckets(col(vecCol), tables, bitsPerTable, seed)).as("bucket"))
    val cands = cb.join(qb, "bucket")
      .where(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", cosine(col("vec_q"), col("vec_c"), l2Norm(col("vec_q")), l2Norm(col("vec_c"))))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    cands.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Embedding-cosine near-duplicate pairs: bucket join + exact cosine ≥
    * threshold, canonical pair order.
    */
  def nearDupPairs(
      corpus: DataFrame, threshold: Double,
      tables: Int = 8, bitsPerTable: Int = 16, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"
  ): DataFrame = {
    val b = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"),
      explode(lshBuckets(col(vecCol), tables, bitsPerTable, seed)).as("bucket"))
    val a = b.toDF("id_a", "vec_a", "bucket")
    val c = b.toDF("id_b", "vec_b", "bucket")
    a.join(c, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine", cosine(col("vec_a"), col("vec_b"), l2Norm(col("vec_a")), l2Norm(col("vec_b"))))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}

/** Random-hyperplane sketch keys for cosine LSH. Hyperplane components are
  * deterministic pseudo-Gaussians from (seed, table, bit, dim index). Output:
  * one 64-bit key per table (table index tagged into the key).
  */
case class CosineLshKeys(child: Expression, tables: Int, bitsPerTable: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(tables >= 1 && bitsPerTable >= 1 && bitsPerTable <= 32)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) { v(i) = arr.getFloat(i).toDouble; i += 1 }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = 0L
      var b = 0
      while (b < bitsPerTable) {
        val rnd = new java.util.SplittableRandom(seed ^ (t.toLong << 32) ^ b.toLong)
        var s = 0.0
        i = 0
        while (i < dim) {
          // sum of two uniforms - 1 ≈ cheap symmetric weight; direction-valid for LSH
          s += (rnd.nextDouble() + rnd.nextDouble() - 1.0) * v(i)
          i += 1
        }
        if (s > 0) key |= (1L << b)
        b += 1
      }
      out(t) = (t.toLong << 40) ^ key
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CosineLshKeys =
    copy(child = newChild)
  override def prettyName: String = "cosine_lsh_keys"
}
