package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin picks the latest right row at or before each left ts, per key") {
    val left = Seq((1L, "u", 100L), (2L, "u", 205L), (3L, "v", 50L)).toDF("id", "k", "t")
    val right = Seq(("u", 90L, "a"), ("u", 100L, "b"), ("u", 200L, "c"), ("v", 60L, "d"))
      .toDF("k", "t", "tag")
    val out = Relational.asofJoin(left, right, "k", "t", "t", Seq("tag"))
      .select("id", "tag").as[(Long, Option[String])].collect().toMap
    assert(out(1L) === Some("b"))  // equality included, latest wins
    assert(out(2L) === Some("c"))
    assert(out(3L) === None)       // right row is after left ts
  }

  test("asofJoinDirectional: backward/forward/nearest with tolerance") {
    def ts(s: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s))
    val left = Seq((1L, "u", ts(100)), (2L, "u", ts(205)),
      (3L, "u", ts(1000)), (4L, "v", ts(50))).toDF("id", "k", "t")
    val right = Seq(("u", ts(90), 9.0), ("u", ts(210), 21.0),
      ("v", ts(45), 4.5)).toDF("k", "t", "v")
    def run(dir: String, tol: Option[Long]) =
      Relational.asofJoinDirectional(left, right, "k", "t", "t", Seq("v"), dir, tol)
        .select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(run("backward", None) === Map(1L -> Some(9.0), 2L -> Some(9.0),
      3L -> Some(21.0), 4L -> Some(4.5)))
    assert(run("forward", None) === Map(1L -> Some(21.0), 2L -> Some(21.0),
      3L -> None, 4L -> None))
    // id1: Δb=10 < Δf=110; id2: Δb=115 > Δf=5; id3: backward only
    assert(run("nearest", None) === Map(1L -> Some(9.0), 2L -> Some(21.0),
      3L -> Some(21.0), 4L -> Some(4.5)))
    // tolerance 100 s nulls id3's 790 s-away backward match, keeps the row
    assert(run("nearest", Some(100L)) === Map(1L -> Some(9.0),
      2L -> Some(21.0), 3L -> None, 4L -> Some(4.5)))
  }

  test("asofJoinDirectional: equidistant nearest ties to backward") {
    def ts(s: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s))
    val left = Seq((1L, "u", ts(150))).toDF("id", "k", "t")
    val right = Seq(("u", ts(100), 1.0), ("u", ts(200), 2.0)).toDF("k", "t", "v")
    val out = Relational.asofJoinDirectional(left, right, "k", "t", "t",
        Seq("v"), "nearest", None)
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(out === Map(1L -> Some(1.0)))
  }

  test("operators tolerate empty inputs") {
    val empty = Seq.empty[(String, Int)].toDF("name", "v")
    val emptyTgt = Seq.empty[(Long, String)].toDF("id", "tag")
    val src = Seq(("a", 1)).toDF("name", "v")

    // merge plan with empty target: all creates; with empty source: all deletes
    val allCreate = Relational.mergePlan(src, emptyTgt, "name", "tag", "id")
    assert(allCreate.select("op_flag").as[String].collect().toSeq === Seq("create"))
    val allDelete = Relational.mergePlan(empty, Seq((1L, "x")).toDF("id", "tag"),
      "name", "tag", "id")
    assert(allDelete.select("op_flag").as[String].collect().toSeq === Seq("delete"))
    // both empty: empty plan
    assert(Relational.mergePlan(empty, emptyTgt, "name", "tag", "id").count() === 0)

    // dedup / topK on empty
    assert(Relational.dedupKeepFirst(empty, Seq("name"), Seq(col("v"))).count() === 0)
    assert(Relational.topK(empty, 5, col("v").desc).count() === 0)

    // asof with empty right: left preserved, carry null
    val l = Seq((1L, "u", 10L)).toDF("id", "k", "t")
    val r = Seq.empty[(String, Long, String)].toDF("k", "t", "tag")
    val out = Relational.asofJoin(l, r, "k", "t", "t", Seq("tag"))
    assert(out.count() === 1)
    assert(out.select("tag").head().isNullAt(0))
  }

  test("null join keys match NOTHING (SQL comparison semantics; r11 fuzz-caught)") {
    // the union+window compose would otherwise group null-key rows of both
    // sides in one window partition and carry values between them —
    // divergent from a native ASOF JOIN's ON l.k = r.k (caught by the
    // cross-engine fuzz lane vs DuckDB, seeds 3003/3050)
    val left = Seq((1L, Option("u"), 100L), (2L, None: Option[String], 100L))
      .toDF("id", "k", "t")
    val right = Seq((Option("u"), 90L, "a"), (None: Option[String], 50L, "nk"))
      .toDF("k", "t", "tag")
    val out = Relational.asofJoin(left, right, "k", "t", "t", Seq("tag"))
      .select("id", "tag").as[(Long, Option[String])].collect().toMap
    assert(out === Map(1L -> Some("a"), 2L -> None))
    def ts(s: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s))
    val lts = Seq((1L, Option("u"), ts(100)), (2L, None: Option[String], ts(100)))
      .toDF("id", "k", "t")
    val rts = Seq((Option("u"), ts(90), 9.0), (None: Option[String], ts(50), 5.0))
      .toDF("k", "t", "v")
    Seq("backward", "forward", "nearest").foreach { dir =>
      val d = Relational.asofJoinDirectional(lts, rts, "k", "t", "t",
          Seq("v"), dir, None)
        .select("id", "v").as[(Long, Option[Double])].collect().toMap
      assert(d(2L) === None, s"direction $dir must not match a null key")
    }
  }
}
