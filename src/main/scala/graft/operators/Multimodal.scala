package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The decode kernels themselves are STUBBED (no image/audio libraries in
  * this container — see the builder contract): `fakeDecode` is a
  * clearly-marked deterministic stand-in keyed on the content hash, so the
  * Spark-side plumbing — schema, batch iteration shape, partitioning, output
  * contract — is real and tested, and a real decoder drops into
  * [[MediaFeatures.decodeStub]] without touching the plan.
  */
object Multimodal {

  /** Typed media row: opaque payload + structured metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("mime", StringType, nullable = true)
    )), nullable = true)
  ))

  final case class MediaFeature(media_id: Long, kind: String, n_bytes: Int, feature: Array[Float])

  /** === STUB === deterministic fake decoder: derives a fixed-length feature
    * vector from the payload bytes' hash. A real implementation would decode
    * the image/audio and run feature extraction here; everything around it
    * (batching, schema, partition shape) is production-real.
    */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val h = java.util.Arrays.hashCode(payload)
    val rnd = new java.util.SplittableRandom(h.toLong)
    Array.fill(dim)(rnd.nextDouble().toFloat)
  }

  /** Feature extraction over media batches: `mapPartitions` on a typed
    * Dataset — one decoder init per partition (the expensive part for real
    * decoders), rows streamed through it. Mirrors the `mapInPandas` batch
    * shape from the Python world in idiomatic Scala Spark.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder init would go here (real decoder handle)
        rows.map { case (id, kind, payload) =>
          val bytes = if (payload == null) Array.empty[Byte] else payload
          MediaFeature(id, kind, bytes.length, decodeStub(bytes, dim))
        }
      }
  }

  /** Deterministic synthetic media table for tests/benchmarks: payload bytes
    * derived from the id, metadata consistent with `kind`.
    */
  def syntheticMedia(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val rows = spark.range(n).map { id =>
      val rnd = new java.util.SplittableRandom(seed ^ id)
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val payload = new Array[Byte](64 + rnd.nextInt(192))
      rnd.nextBytes(payload)
      (id, kind, payload,
        if (kind == "image") (Some(640), Some(480), None: Option[Long], Some("image/png"))
        else (None: Option[Int], None: Option[Int], Some(rnd.nextLong(1000, 600000)), Some("media/bin")))
    }.toDF("media_id", "kind", "payload", "m")
    rows.select(col("media_id"), col("kind"), col("payload"),
      struct(col("m._1").as("width"), col("m._2").as("height"),
        col("m._3").as("duration_ms"), col("m._4").as("mime")).as("meta"))
  }
}
