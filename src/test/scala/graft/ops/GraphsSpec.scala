package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: hub outranks leaves, symmetric leaves tie, mass ~ 1") {
    val edges = Seq(("h", "l1"), ("h", "l2"), ("h", "l3")).toDF("src", "dst")
    val p = Graphs.pageRank(edges, iters = 5)
      .select("id", "deg", "p").as[(String, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(p("h")._1 === 3L && p("l1")._1 === 1L)
    assert(p("h")._2 > p("l1")._2)
    assert(p("l1")._2 === p("l2")._2 && p("l2")._2 === p("l3")._2)
    assert(math.abs(p.values.map(_._2).sum - 1.0) < 1e-6)
  }

  test("pageRank: duplicate and reversed input edges do not change ranks") {
    val base = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val noisy = Seq(("a", "b"), ("b", "a"), ("a", "b"), ("c", "b"))
      .toDF("src", "dst")
    val pb = Graphs.pageRank(base).select("id", "p")
      .as[(String, Double)].collect().toMap
    val pn = Graphs.pageRank(noisy).select("id", "p")
      .as[(String, Double)].collect().toMap
    assert(pb === pn)
    assert(pb("b") > pb("a") && pb("a") === pb("c"))
  }

  test("triangleCounts: K4, a pendant, and an open path") {
    // K4 on 1..4 (every vertex in 3 triangles, lcc = 1), pendant 5-1,
    // open path 5-6 (no triangles through 5 or 6)
    val k4 = for { a <- 1 to 4; b <- 1 to 4 if a < b } yield (a.toLong, b.toLong)
    val edges = (k4 ++ Seq((1L, 5L), (5L, 6L))).toDF("src", "dst")
    val r = Graphs.triangleCounts(edges)
      .select("id", "deg", "triangles", "lcc")
      .as[(Long, Long, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(r(2L) === ((3L, 3L, 1.0)) && r(3L) === ((3L, 3L, 1.0)))
    assert(r(1L) === ((4L, 3L, 0.5)))     // deg 4: 3 of C(4,2)=6 wedges closed
    assert(r(5L) === ((2L, 0L, 0.0)))     // open path center
    assert(r(6L) === ((1L, 0L, 0.0)))     // leaf: deg < 2 -> lcc 0
  }

  test("triangleCounts: duplicate/reversed/self-loop edges are normalized") {
    val clean = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val noisy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L),
      (1L, 1L)).toDF("src", "dst")
    val a = Graphs.triangleCounts(clean).orderBy("id").collect().toSeq
    val b = Graphs.triangleCounts(noisy).orderBy("id").collect().toSeq
    assert(a === b)
    assert(a.forall(_.getLong(2) == 1L))
  }
}
