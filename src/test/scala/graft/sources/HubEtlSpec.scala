package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Golden end-to-end test of the reference pipeline (SURVEY.md §5.4) on the
  * FIXTURES.md A1/A2 shapes, including every listed edge case: null
  * title/abstract, 1-vs-3 speakers, case-differing keys, unknown room,
  * duplicate target tags, empty target tags. */
class HubEtlSpec extends SparkSpec {

  private def write(dir: Path, name: String, body: String): Unit =
    Files.writeString(dir.resolve(name), body)

  private lazy val fixtureDir: Path = {
    val d = Files.createTempDirectory("hub_etl_fixture")
    write(d, "schedule.json",
      """{
        |  "talks": [
        |    {"code": "TALK-A", "title": "Alpha Talk", "room": 1, "abstract": "About A",
        |     "speakers": ["s1"], "start": "2026-08-01T10:00:00+02:00", "duration": "30"},
        |    {"code": "talk-b", "title": null, "room": 2, "abstract": null,
        |     "speakers": ["s1", "s2", "s3"], "start": "2026-08-01T11:00:00+02:00", "duration": "45"},
        |    {"code": "TALK-C", "title": "Gamma", "room": 99, "abstract": "About C",
        |     "speakers": [], "start": "2026-08-01T12:00:00+02:00", "duration": "60"}
        |  ],
        |  "speakers": [
        |    {"code": "s1", "name": "Ada"},
        |    {"code": "s2", "name": "Grace"},
        |    {"code": "s3", "name": "Edsger"}
        |  ]
        |}""".stripMargin)
    val pages = d.resolve("pages")
    Files.createDirectory(pages)
    write(pages, "page_1.json",
      """{"data": [
        |  {"id": "e1", "name": "Alpha Talk (old)", "tags": ["talk-a"]},
        |  {"id": "e2", "name": "Stale Event", "tags": ["GONE-1"]}
        |], "pagination": {"total": 4, "page": 1, "page_size": 2}}""".stripMargin)
    write(pages, "page_2.json",
      """{"data": [
        |  {"id": "e3", "name": "Dup Tag", "tags": ["talk-a"]},
        |  {"id": "e4", "name": "No Tags", "tags": []}
        |], "pagination": {"total": 4, "page": 2, "page_size": 2}}""".stripMargin)
    d
  }

  test("paginated DSv2 source reads all pages, one partition per page") {
    val df = HubEtl.targetEvents(spark, fixtureDir.resolve("pages").toString)
    assert(df.count() === 4)
    assert(df.rdd.getNumPartitions === 2)
    val e1 = df.filter(col("id") === "e1").select("name", "tags").head()
    assert(e1.getString(0) === "Alpha Talk (old)")
    assert(e1.getSeq[String](1) === Seq("talk-a"))
  }

  test("DSv2 source prunes columns: a name-only projection reads a 1-column schema") {
    val df = HubEtl.targetEvents(spark, fixtureDir.resolve("pages").toString)
      .select("name")
    val plan = df.queryExecution.executedPlan.toString
    // DSv2 BatchScan prints its pruned output attrs in brackets
    assert(plan.matches("(?s).*BatchScan paginated_json[^\\[]*\\[name#\\d+\\].*"), plan)
    assert(!plan.contains("tags#"), plan)
    assert(df.count() === 4)
  }

  test("DSv2 source pushes id/name equality filters into the page reader") {
    val df = HubEtl.targetEvents(spark, fixtureDir.resolve("pages").toString)
      .filter(col("id") === "e3")
    val plan = df.queryExecution.executedPlan.toString
    // the EqualTo is consumed by the source: only isnotnull survives post-scan
    assert(plan.contains("pushedFilters=[EqualTo(id,e3)]"), plan)
    assert(!plan.contains("= e3)"), s"filter not consumed by the scan: $plan")
    val rows = df.collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[String]("name") === "Dup Tag")
    // non-pushable predicate still works (post-scan filter)
    val nf = HubEtl.targetEvents(spark, fixtureDir.resolve("pages").toString)
      .filter(size(col("tags")) === 0)
    assert(nf.count() === 1)
  }

  test("talksToEvents: projection, constants, coalesce, speaker mapping, ts parse") {
    val schedule = Pretalx.readSchedule(spark, fixtureDir.resolve("schedule.json").toString)
    val events = Pretalx.talksToEvents(
      Pretalx.talks(schedule), Pretalx.speakerMapOf(schedule))
    val rows = events.orderBy("code").collect()

    val a = rows.find(_.getAs[String]("code") == "TALK-A").get
    assert(a.getAs[String]("name") === "Alpha Talk")
    assert(a.getAs[String]("room_name") === "CDC Triangle")
    assert(a.getAs[String]("description_de") === "")            // constant (main.py:124)
    assert(a.getAs[String]("description_en") === "Speaker: Ada")  // singular
    assert(a.getAs[java.sql.Timestamp]("schedule_start").toInstant.toString
      === "2026-08-01T08:00:00Z")  // +02:00 offset honored

    val b = rows.find(_.getAs[String]("code") == "talk-b").get
    assert(b.getAs[String]("name") === "")                      // null title coalesced
    assert(b.getAs[String]("abstract") === "")
    assert(b.getAs[Seq[String]]("speakers") === Seq("Ada", "Grace", "Edsger")) // order kept
    assert(b.getAs[String]("description_en") === "Speakers: Ada, Grace, Edsger") // plural

    val c = rows.find(_.getAs[String]("code") == "TALK-C").get
    assert(c.getAs[String]("room_name") === "")                 // unknown room → "" not error
  }

  test("end-to-end merge plan: update on case-insensitive match, create, delete") {
    val plan = HubEtl.run(spark,
      fixtureDir.resolve("schedule.json").toString,
      fixtureDir.resolve("pages").toString)
    val flags = plan.select("code", "op_flag", "hub_id").collect()
      .map(r => (r.getAs[String]("code"), r.getAs[String]("op_flag"), r.getAs[String]("hub_id")))

    // TALK-A matches tags[0]="talk-a" case-insensitively; duplicate target
    // tag (e1, e3) resolves deterministically to the smaller id e1
    assert(flags.contains(("TALK-A", "update", "e1")))
    assert(flags.contains(("talk-b", "create", null)))
    assert(flags.contains(("TALK-C", "create", null)))
    // GONE-1 has no source match → delete; empty-tags e4 → delete (null key)
    val deletes = flags.filter(_._2 == "delete").map(_._3).toSet
    assert(deletes === Set("e2", "e4"))
  }

  test("resolveAssemblyId: hit returns id, miss fails like the reference") {
    import spark.implicits._
    val assemblies = Seq(("a-1", "cdc"), ("a-2", "other")).toDF("id", "slug")
    assert(HubEtl.resolveAssemblyId(assemblies, "cdc") === "a-1")
    val e = intercept[IllegalArgumentException] {
      HubEtl.resolveAssemblyId(assemblies, "missing")
    }
    assert(e.getMessage.contains("missing"))
  }

  test("validate flags rows whose sink message contains 'invalid' (incl. index 0)") {
    import spark.implicits._
    val plan = Seq(
      ("r1", "all good"),
      ("r2", "invalid form field"),   // match at index 0 — reference bug misses this
      ("r3", "form was Invalid")).toDF("k", "sink_message")
    val out = HubEtl.validate(plan).select("k", "valid").as[(String, Boolean)].collect().toMap
    assert(out === Map("r1" -> true, "r2" -> false, "r3" -> false))
  }

  test("write sink partitions by op_flag and re-running overwrites idempotently") {
    val plan = HubEtl.run(spark,
      fixtureDir.resolve("schedule.json").toString,
      fixtureDir.resolve("pages").toString)
    val out = Files.createTempDirectory("hub_etl_sink").toString
    HubEtl.writePlan(plan, out)
    HubEtl.writePlan(plan, out)
    val back = spark.read.parquet(out)
    assert(back.count() === plan.count())
    assert(back.columns.contains("valid"))
  }

  test("fetchToSpool resolves a URL into the spool dir the scans read (Trace 1)") {
    // the "edge" is a file: URL here (no egress in this container); the
    // spooled file feeds the exact same S1 scan as a directly-given path
    val spool = Files.createTempDirectory("hub_etl_spool")
    val spooled = HubEtl.fetchToSpool(
      fixtureDir.resolve("schedule.json").toUri.toString, spool, "schedule.json")
    assert(spooled.getParent === spool)
    val plan = HubEtl.run(spark, spooled.toString, fixtureDir.resolve("pages").toString)
    assert(plan.filter(col("op_flag") === "update").count() === 1)
  }

  test("fetchToSpool over live HTTP: loopback fixture server feeds the same S1 scan") {
    // the reference fetches its schedule over HTTP (requests.get,
    // main.py:33,96); this exercises the exact http:// code path against a
    // loopback server serving the fixture — no egress involved
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    try {
      val body = Files.readAllBytes(fixtureDir.resolve("schedule.json"))
      server.createContext("/api/schedule.json",
        (x: com.sun.net.httpserver.HttpExchange) => {
          x.sendResponseHeaders(200, body.length.toLong)
          try x.getResponseBody.write(body) finally x.close()
        })
      server.start()
      val port = server.getAddress.getPort
      val spool = Files.createTempDirectory("hub_etl_http_spool")
      val spooled = HubEtl.fetchToSpool(
        s"http://127.0.0.1:$port/api/schedule.json", spool, "schedule.json")
      val plan = HubEtl.run(spark, spooled.toString,
        fixtureDir.resolve("pages").toString)
      // same fixture → same merge plan as the file: variant above
      // (2 deletes: the stale GONE-1 event and the duplicate-tag loser)
      assert(plan.filter(col("op_flag") === "update").count() === 1)
      assert(plan.filter(col("op_flag") === "delete").count() === 2)
    } finally server.stop(0)
  }

  test("loadRows captures per-row sink status: clean, invalid (incl. index 0), error") {
    import spark.implicits._
    val plan = Seq(
      ("r1", "create"), ("r2", "create"), ("r3", "update"), ("r4", "update"))
      .toDF("k", "op_flag")
    val sink = new HubEtl.RowSink {
      def submit(op: String, row: org.apache.spark.sql.Row): String =
        row.getString(0) match {
          case "r1" => ""                        // clean
          case "r2" => "invalid form field"      // match at index 0
          case "r3" => "form was Invalid"
          case _ => throw new RuntimeException("connection reset")
        }
    }
    val out = HubEtl.loadRows(plan, sink)
      .select("k", "valid", "load_status").collect()
      .map(r => r.getString(0) -> (r.getAs[Boolean]("valid"), r.getString(2))).toMap
    assert(out("r1") === ((true, "submitted")))
    assert(out("r2") === ((false, "invalid")))
    assert(out("r3") === ((false, "invalid")))
    assert(out("r4") === ((false, "error")))     // caught per row, not a job failure
  }

  test("loadRows K6: maxRowsPerSecond paces submits; results identical to unpaced") {
    import spark.implicits._
    val plan = (1 to 20).map(i => (s"r$i", "create")).toDF("k", "op_flag").coalesce(1)
    val sink = new HubEtl.RowSink {
      def submit(op: String, row: org.apache.spark.sql.Row): String = ""
    }
    val unpaced = HubEtl.loadRows(plan, sink)
      .select("k", "load_status").as[(String, String)].collect().toSet
    val t0 = System.nanoTime()
    val paced = HubEtl.loadRows(plan, sink, maxRowsPerSecond = 40.0)
      .select("k", "load_status").as[(String, String)].collect().toSet
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(paced === unpaced)                    // pacing never changes results
    // 20 ops at 40/s: op k waits until k/40 -> >= 19/40 = 0.475 s minimum
    assert(elapsed >= 0.45, s"paced run finished in $elapsed s — not rate-limited")
  }

  test("loadRows: unknown op_flag aborts the remaining rows of its partition") {
    import spark.implicits._
    val plan = Seq(("r1", "create"), ("r2", "upsert"), ("r3", "update"))
      .toDF("k", "op_flag").coalesce(1) // one partition = the reference's single loop
    val sink = new HubEtl.RowSink {
      def submit(op: String, row: org.apache.spark.sql.Row): String = ""
    }
    val out = HubEtl.loadRows(plan, sink)
      .select("k", "load_status").as[(String, String)].collect().toMap
    assert(out === Map(
      "r1" -> "submitted",
      "r2" -> "unknown_op",                  // main.py:201-204 `case _: break`
      "r3" -> "skipped_after_unknown_op"))   // rows after the break never submit
  }

  test("loadRows: delete is a first-class op — submitted, never published, gated by autoDelete") {
    import spark.implicits._
    val plan = Seq(("r1", "delete"), ("r2", "create"), ("r3", "delete"))
      .toDF("k", "op_flag").coalesce(1)
    HubEtlSpec.published.clear()
    HubEtlSpec.submitted.clear()
    val sink = new HubEtl.RowSink {
      def submit(op: String, row: org.apache.spark.sql.Row): String = {
        HubEtlSpec.submitted.add(op -> row.getString(0)); ""
      }
      override def publish(row: org.apache.spark.sql.Row): Unit =
        HubEtlSpec.published.add(row.getString(0))
    }
    // gate on (AUTO_DELETE_EVENTS, main.py:182): deletes submit through the
    // same session as create/update and do NOT abort the partition...
    val on = HubEtl.loadRows(plan, sink)
      .select("k", "load_status", "published").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
    assert(on === Map(
      "r1" -> (("submitted", false)),   // ...and are never published (main.py:251-256)
      "r2" -> (("submitted", true)),
      "r3" -> (("submitted", false))))
    assert(HubEtlSpec.submitted.toArray.toSet === Set("delete" -> "r1", "create" -> "r2", "delete" -> "r3"))
    assert(HubEtlSpec.published.toArray.toSet === Set("r2"))

    // gate off: delete rows pass through untouched — skipped, not unknown
    HubEtlSpec.submitted.clear()
    val off = HubEtl.loadRows(plan, sink, autoDelete = false)
      .select("k", "load_status").as[(String, String)].collect().toMap
    assert(off === Map(
      "r1" -> "delete_skipped", "r2" -> "submitted", "r3" -> "delete_skipped"))
    assert(HubEtlSpec.submitted.toArray.toSet === Set("create" -> "r2"))
  }

  test("loadRows publish gate: only valid rows publish, and only when autoPublish") {
    import spark.implicits._
    val plan = Seq(("ok", "create"), ("bad", "create")).toDF("k", "op_flag")
    HubEtlSpec.published.clear()
    val sink = new HubEtl.RowSink {
      def submit(op: String, row: org.apache.spark.sql.Row): String =
        if (row.getString(0) == "bad") "invalid" else ""
      override def publish(row: org.apache.spark.sql.Row): Unit =
        HubEtlSpec.published.add(row.getString(0))
    }
    val on = HubEtl.loadRows(plan, sink, autoPublish = true)
      .select("k", "published").as[(String, Boolean)].collect().toMap
    assert(on === Map("ok" -> true, "bad" -> false))
    assert(HubEtlSpec.published.toArray.toSet === Set("ok"))

    HubEtlSpec.published.clear()
    val off = HubEtl.loadRows(plan, sink, autoPublish = false)
      .select("k", "published").as[(String, Boolean)].collect().toMap
    assert(off === Map("ok" -> false, "bad" -> false))
    assert(HubEtlSpec.published.isEmpty)
  }
}

object HubEtlSpec {
  // local-mode test hooks: executors share the JVM, so static queues can
  // observe sink calls from tasks (a local val would be serialized into the
  // task closure and the tasks would mutate a copy)
  val published = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  val submitted = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
}
