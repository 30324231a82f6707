package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Full-parity chunked export with metadata block + part naming
  * (`export/service.py:77-133`).
  */
class ExportSpec extends SparkSpec {
  import spark.implicits._

  test("chunked export: part naming, metadata block, id order across parts") {
    val dir = Files.createTempDirectory("graft_export").toString
    val events = (1 to 5).map(i => (f"e$i%02d", s"""{"id":"e$i"}"""))
      .toDF("id", "event_json")
    val written = EventIngest.exportWithMetadata(events, dir,
      stamp = "2026-08-17T00-00", exportedAt = "2026-08-17T00:00:00+00:00",
      chunkSize = 2, filtersJson = """{"city":"freiburg"}""")
      .as[(String, Long, Long)].collect().sortBy(_._2)

    assert(written.map(_._1).toSeq == Seq(
      "export_2026-08-17T00-00_part_1.json",
      "export_2026-08-17T00-00_part_2.json",
      "export_2026-08-17T00-00_part_3.json"))
    assert(written.map(_._3).toSeq == Seq(2L, 2L, 1L))

    val p1 = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/export_2026-08-17T00-00_part_1.json")), "UTF-8")
    // first part carries the two lowest ids, metadata block complete
    assert(p1.contains(""""id":"e1"""") && p1.contains(""""id":"e2""""))
    assert(p1.contains(""""eventCount":2""") && p1.contains(""""part":1"""))
    assert(p1.contains(""""totalParts":3"""))
    assert(p1.contains(""""filters":{"city":"freiburg"}"""))
    assert(p1.contains(""""exportedAt":"2026-08-17T00:00:00+00:00""""))
  }

  test("empty input still writes part 1 with an empty events array (service.py:93-108)") {
    val dir = Files.createTempDirectory("graft_export_empty").toString
    val empty = Seq.empty[(String, String)].toDF("id", "event_json")
    val written = EventIngest.exportWithMetadata(empty, dir,
      stamp = "s", exportedAt = "t").as[(String, Long, Long)].collect()
    assert(written.toSeq == Seq(("export_s_part_1.json", 1L, 0L)))
    val p = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/export_s_part_1.json")), "UTF-8")
    assert(p.contains(""""events":[]""") && p.contains(""""totalParts":1"""))
  }
}
