package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class PaginatedSourceEdgeSpec extends SparkSpec {

  test("empty pages directory yields an empty DataFrame, not an error") {
    val d = Files.createTempDirectory("pages_empty")
    val df = HubEtl.targetEvents(spark, d.toString)
    assert(df.count() === 0)
    assert(df.schema === PaginatedJsonSource.schema)
  }

  test("page with empty data array contributes zero rows") {
    val d = Files.createTempDirectory("pages_nodata")
    Files.writeString(d.resolve("page_1.json"),
      """{"data": [], "pagination": {"total": 0, "page": 1, "page_size": 100}}""")
    assert(HubEtl.targetEvents(spark, d.toString).count() === 0)
  }

  test("malformed page fails the task with a parse error (strict, like the reference)") {
    val d = Files.createTempDirectory("pages_bad")
    Files.writeString(d.resolve("page_1.json"), """{"data": [{"id": "ok"}]}""")
    Files.writeString(d.resolve("page_2.json"), """not json at all {{{""")
    val e = intercept[Exception] {
      HubEtl.targetEvents(spark, d.toString).count()
    }
    // the failure names the parse problem rather than silently dropping rows
    assert(e.getMessage != null)
  }

  test("rows with missing fields read as nulls") {
    val d = Files.createTempDirectory("pages_sparse")
    Files.writeString(d.resolve("page_1.json"),
      """{"data": [{"id": "e1"}, {"name": "only-name", "tags": null}]}""")
    val rows = HubEtl.targetEvents(spark, d.toString).collect()
    assert(rows.length === 2)
    val e1 = rows.find(r => r.getAs[String]("id") == "e1").get
    assert(e1.isNullAt(1) && e1.isNullAt(2))
  }
}
