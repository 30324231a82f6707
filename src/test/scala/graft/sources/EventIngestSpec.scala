package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class EventIngestSpec extends SparkSpec {
  import spark.implicits._

  private def writeFile(dir: String, name: String, content: String): Unit =
    Files.write(Paths.get(dir, name), content.getBytes("UTF-8"))

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-ingest").toString
    writeFile(d, "srcA_2026.json",
      """{"events": [
        |  {"id": "e1", "title": "Narrenumzug", "source_type": "terminliste",
        |   "event_dates": [{"date": "2026-02-12", "start_time": "14:00"}],
        |   "location": {"city": "Altdorf", "_sanitizeResult": {"city": "Kenzingen"},
        |     "geo": {"latitude": 48.19, "longitude": 7.81, "confidence": 0.95}},
        |   "categories": ["fasnacht"], "is_family_event": true},
        |  {"id": "e2", "title": "Konzert", "source_type": "artikel",
        |   "event_dates": [{"date": "2026-03-01"}],
        |   "location": {"city": "Freiburg"}}
        |], "metadata": {"sourceKey": "srcA"}}""".stripMargin)
    writeFile(d, "srcB_2026.json",
      """{"events": [
        |  {"id": "e3", "title": "Theater", "source_type": "artikel",
        |   "event_dates": [{"date": "2026-04-01"}]}
        |]}""".stripMargin)
    writeFile(d, "srcC_bad.json", """{"events": [{"id": }""") // malformed
    d
  }

  test("S1/S2: declared-schema read; malformed files → dead letters, not failures") {
    val files = EventIngest.readEventFiles(spark, dir)
    assert(files.count() == 3)
    val dead = EventIngest.deadLetters(files).collect()
    assert(dead.length == 1 && dead(0).getAs[String]("file_name").contains("srcC_bad"))
  }

  test("S4/S5/S6: flatten with sanitize-override city and source code") {
    val events = EventIngest.flattenEvents(EventIngest.readEventFiles(spark, dir))
    assert(events.count() == 3)
    val e1 = events.where($"id" === "e1").collect()(0)
    assert(e1.getAs[String]("location_city") == "Kenzingen") // _sanitizeResult override
    assert(e1.getAs[String]("source_code") == "srcA")
    assert(e1.getAs[Double]("geo_latitude") == 48.19)
    assert(e1.getAs[Boolean]("is_family_event"))
    val e2 = events.where($"id" === "e2").collect()(0)
    assert(e2.getAs[String]("location_city") == "Freiburg") // no override
    assert(!e2.getAs[Boolean]("is_family_event")) // null → false
  }

  test("S3: file-hash idempotency anti-join skips already-ingested") {
    val files = Seq(("f1", "contentA"), ("f2", "contentB"), ("f3", "contentA"))
      .toDF("file_name", "content")
      .withColumn("file_hash", EventIngest.fileHash($"content"))
    val ledger = Seq(("contentA")).toDF("c")
      .select(EventIngest.fileHash($"c").as("file_hash"))
    val fresh = EventIngest.skipIngested(files, ledger)
      .select("file_name").as[String].collect().toSet
    assert(fresh == Set("f2")) // f1 and f3 share the ingested hash
  }

  test("ingest-time normalization + city alias resolution (P3)") {
    val events = EventIngest.flattenEvents(EventIngest.readEventFiles(spark, dir))
    val norm = EventIngest.withNormalized(events,
      synonyms = Map("fasnet" -> "fasnacht"),
      dashPrefixes = Seq("Events"),
      cityAliases = Map("altdorf" -> "ettenheim", "kenzingen" -> "kenzingen"))
    val e1 = norm.where($"id" === "e1").collect()(0)
    assert(e1.getAs[String]("title_normalized") == "narrenumzug")
    assert(e1.getAs[String]("city_normalized") == "kenzingen")
    val e2 = norm.where($"id" === "e2").collect()(0)
    assert(e2.getAs[String]("city_normalized") == "freiburg") // not aliased
  }

  test("S10: export projection emits nested input-format JSON") {
    val canonical = Seq(("c1", "Umzug", null: String, "lange Beschreibung",
      Seq("h1"), Seq(("2026-02-12", "14:00")), "Halle", "Kenzingen", "Oberdorf", "Hauptstr", "79341",
      48.19, 7.81, 0.95, "terminliste", Seq("fasnacht"), true, false, false))
      .toDF("id", "title", "short_description", "description", "highlights", "raw_dates",
        "location_name", "location_city", "location_district", "location_street", "location_zipcode",
        "geo_latitude", "geo_longitude", "geo_confidence", "source_type", "categories",
        "is_family_event", "is_child_focused", "admission_free")
      .withColumn("dates", transform(col("raw_dates"), d =>
        struct(d.getField("_1").as("date"), d.getField("_2").as("start_time"))))
    val out = EventIngest.toInputFormat(canonical).as[(String, String)].collect()(0)
    assert(out._1 == "c1")
    assert(out._2.contains(""""event_dates":[{"date":"2026-02-12""""))
    assert(out._2.contains(""""district":"Oberdorf""""))
    assert(out._2.contains(""""geo":{"latitude":48.19"""))
  }

  test("S11/S12: chunked export writes <=200-row json files, filtered and ordered") {
    val outDir = Files.createTempDirectory("graft-export").toString + "/out"
    val canonical = spark.range(450)
      .select($"id", lit("t").as("title"),
        (lit("2026-01-01").cast("timestamp") + make_interval(lit(0), lit(0), lit(0), lit(0), lit(0), lit(0), $"id")).as("created_at"))
    EventIngest.export(canonical, outDir, chunkSize = 200)
    val written = spark.read.json(outDir)
    assert(written.count() == 450)
    val parts = new java.io.File(outDir).listFiles().count(_.getName.endsWith(".json"))
    assert(parts >= 3) // ceil(450/200) chunks at minimum
  }
}
