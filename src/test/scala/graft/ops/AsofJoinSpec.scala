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
}
