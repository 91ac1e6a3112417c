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
}
