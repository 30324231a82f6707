package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Blocking-key parity with `/root/reference/tests/test_blocking.py`. */
class BlockingSpec extends SparkSpec {
  import spark.implicits._

  private def keys(dates: Seq[String], city: Option[String],
      lat: Option[Double], lon: Option[Double], conf: Option[Double]): Seq[String] = {
    val df = Seq((dates.map(d => (d, Option.empty[String])), city, lat, lon, conf))
      .toDF("raw_dates", "city", "lat", "lon", "conf")
      .withColumn("dates", transform(col("raw_dates"), d =>
        struct(d.getField("_1").as("date"), d.getField("_2").as("start_time"))))
    df.select(Blocking.blockingKeys(col("dates"), col("city"), col("lat"), col("lon"), col("conf")))
      .as[Seq[String]].collect()(0)
  }

  test("date+city key (test_date_city_blocking_key)") {
    assert(keys(Seq("2026-02-12"), Some("kenzingen"), None, None, None)
      == Seq("dc|2026-02-12|kenzingen"))
  }

  test("date+geo key (test_date_geo_blocking_key)") {
    val k = keys(Seq("2026-02-12"), None, Some(48.19), Some(7.81), Some(0.95))
    assert(k.length == 1 && k.head.startsWith("dg|2026-02-12|"))
  }

  test("both keys (test_both_blocking_keys)") {
    val k = keys(Seq("2026-02-12"), Some("kenzingen"), Some(48.19), Some(7.81), Some(0.95))
    assert(k.count(_.startsWith("dc|")) == 1 && k.count(_.startsWith("dg|")) == 1)
  }

  test("low confidence suppresses geo key (test_low_confidence_no_geo_key)") {
    val k = keys(Seq("2026-02-12"), Some("kenzingen"), Some(48.19), Some(7.81), Some(0.5))
    assert(k.count(_.startsWith("dg|")) == 0 && k.length == 1)
  }

  test("outlier coordinates filtered by bounding box (test_outlier_coordinates_filtered)") {
    val k = keys(Seq("2026-02-12"), Some("kenzingen"), Some(49.87), Some(8.65), Some(0.95))
    assert(k.count(_.startsWith("dg|")) == 0 && k.count(_.startsWith("dc|")) == 1)
  }

  test("multiple dates produce keys per date (test_multi_date_multiple_keys)") {
    val k = keys(Seq("2026-02-12", "2026-02-13"), Some("kenzingen"), Some(48.19), Some(7.81), Some(0.95))
    assert(k.length == 4)
    assert(k.contains("dc|2026-02-12|kenzingen") && k.contains("dc|2026-02-13|kenzingen"))
  }

  test("no city, no geo → empty (test_no_city_no_geo / empty string)") {
    assert(keys(Seq("2026-02-12"), None, None, None, None).isEmpty)
    assert(keys(Seq("2026-02-12"), Some(""), None, None, None).isEmpty)
  }

  test("geo grid key snapping consistency (test_geo_grid_key_consistency)") {
    val got = Seq((48.19, 7.81), (48.19, 7.82), (48.0, 7.8))
      .toDF("lat", "lon")
      .select(Blocking.geoGridKey(col("lat"), col("lon"))).as[String].collect()
    assert(got(0) == got(1)) // same cell (0.13° lon cells)
    // reference formula: round(48.19/0.09)*0.09 = 48.15; round(7.81/0.13)*0.13 = 7.80
    assert(got(0) == "48.15|7.80")
  }

  test("candidate pairs: within-block pairs, canonical order, cross-block dedup") {
    val events = Seq(
      ("a", Seq("k1", "k2")),
      ("b", Seq("k1")),
      ("c", Seq("k2", "k3")),
      ("d", Seq("k4"))
    ).toDF("id", "blocking_keys")
    val pairs = Blocking.candidatePairs(events).as[(String, String)].collect().toSet
    assert(pairs == Set(("a", "b"), ("a", "c")))
    val stats = Blocking.blockingStats(events, Blocking.candidatePairs(events))
      .as[(Long, Long, Long, Double)].collect()(0)
    assert(stats._1 == 4 && stats._2 == 6 && stats._3 == 2)
    assert(math.abs(stats._4 - 100.0 * (1 - 2.0 / 6.0)) < 1e-9)
  }
}
