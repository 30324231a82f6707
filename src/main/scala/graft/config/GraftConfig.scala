package graft.config

/** Configuration tree for the dedup engine.
  *
  * Mirrors the reference's pydantic config tree
  * (`/root/reference/src/event_dedup/matching/config.py:16-146` and
  * `config/matching.yaml:1-96`) as immutable case classes. Values are the
  * reference defaults; everything is a plain value so the whole tree is
  * serializable and can be broadcast to executors.
  */
final case class ScoringWeights(
    date: Double = 0.30,
    geo: Double = 0.25,
    title: Double = 0.30,
    description: Double = 0.15
)

final case class ThresholdConfig(
    high: Double = 0.75,
    low: Double = 0.35,
    titleVeto: Double = 0.45
)

final case class GeoConfig(
    maxDistanceKm: Double = 10.0,
    minConfidence: Double = 0.85,
    neutralScore: Double = 0.5,
    venueMatchDistanceKm: Double = 1.0,
    venueMismatchFactor: Double = 0.5
)

final case class DateConfig(
    timeToleranceMinutes: Int = 30,
    timeCloseMinutes: Int = 90,
    closeFactor: Double = 0.1,
    farFactor: Double = 0.0,
    timeGapPenaltyHours: Double = 2.0,
    timeGapPenaltyFactor: Double = 0.0
)

final case class TitleConfig(
    primaryWeight: Double = 0.7,
    secondaryWeight: Double = 0.3,
    blendLower: Double = 0.40,
    blendUpper: Double = 0.80
)

final case class ClusterConfig(
    maxClusterSize: Int = 15,
    minInternalSimilarity: Double = 0.40
)

/** MinHash / LSH parameters (ours; reference analog is the blocking-key
  * mechanism `preprocessing/blocking.py:69-121`). numHashes = bands * rowsPerBand.
  */
final case class LshConfig(
    shingleSize: Int = 3, // word n-gram width
    numHashes: Int = 128,
    bands: Int = 16,
    rowsPerBand: Int = 8,
    seed: Long = 42L,
    /** exact-Jaccard verification threshold for a "match" edge */
    jaccardThreshold: Double = 0.8,
    /** candidate band buckets larger than this are salted/capped; tracked in metrics */
    maxBucketSize: Int = 2000
)

/** SimHash tier parameters. */
final case class SimHashConfig(
    maxHammingDistance: Int = 3,
    seed: Long = 42L
)

/** Long-exact-overlap (suffix/substring) tier parameters. */
final case class OverlapConfig(
    minOverlapChars: Int = 256,
    /** content-defined sampling modulus: expected grams kept = len/samplingMod */
    samplingMod: Int = 16,
    seed: Long = 42L
)

final case class GraftConfig(
    scoring: ScoringWeights = ScoringWeights(),
    thresholds: ThresholdConfig = ThresholdConfig(),
    geo: GeoConfig = GeoConfig(),
    date: DateConfig = DateConfig(),
    title: TitleConfig = TitleConfig(),
    crossSourceTitle: TitleConfig =
      TitleConfig(primaryWeight = 0.4, secondaryWeight = 0.6, blendLower = 0.25, blendUpper = 0.95),
    cluster: ClusterConfig = ClusterConfig(),
    lsh: LshConfig = LshConfig(),
    simhash: SimHashConfig = SimHashConfig(),
    overlap: OverlapConfig = OverlapConfig()
) {

  /** Stable hash of the config, used to key stage checkpoints (reference
    * analog: content-hash cache keys, `ai_matching/cache.py:21-57`).
    */
  def configHash: String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(this.toString.getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString.take(16)
  }
}

object GraftConfig {
  val default: GraftConfig = GraftConfig()
}
