package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Tables
import graft.ops.Relational

class AsofJoinPlanSpec extends SparkSpec {
  import spark.implicits._

  test("native as-of join matches hand semantics on a tiny case") {
    val left = Seq((1L, "u", 100L), (2L, "u", 205L), (3L, "v", 50L), (4L, "w", 10L))
      .toDF("id", "k", "t")
    val right = Seq(("u", 90L, "a"), ("u", 100L, "b"), ("u", 200L, "c"), ("v", 60L, "d"))
      .toDF("k", "t", "tag")
    val out = AsofJoin(left, right, "k", "t", "t")
      .select(col("id"), col("tag"))
      .as[(Long, Option[String])].collect().toMap
    assert(out === Map(
      1L -> Some("b"),  // ts-equality included, latest wins
      2L -> Some("c"),
      3L -> None,       // right row after left ts
      4L -> None))      // key absent on right
  }

  test("native as-of equals the union+window formulation on sf0.001 events") {
    val ev = Tables.events(spark, sfDir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"), col("value").as("purchase_value"))

    val native = AsofJoin(errors, purchases, "user_id", "ts", "pts")
      .select(col("event_id"), col("purchase_value"))
      .as[(Long, Option[Double])].collect().toMap
    val windowed = Relational.asofJoin(
        errors, purchases.withColumnRenamed("pts", "ts"),
        "user_id", "ts", "ts", Seq("purchase_value"))
      .select(col("event_id"), col("purchase_value"))
      .as[(Long, Option[Double])].collect().toMap
    assert(native === windowed)
    assert(native.nonEmpty)
  }

  test("null keys and timestamps never match and never crash the merge") {
    val left = Seq(
      (1L, Some("u"), Some(100L)),
      (2L, None, Some(100L)),       // null key
      (3L, Some("u"), None))        // null ts
      .toDF("id", "k", "t")
    val right = Seq(
      (Some("u"), Some(90L), "a"),
      (None, Some(50L), "x"),       // null key on the right
      (Some("u"), None, "y"))       // null ts on the right
      .toDF("k", "t", "tag")
    val out = AsofJoin(left, right, "k", "t", "t")
      .select(col("id"), col("tag")).as[(Long, Option[String])].collect().toMap
    assert(out === Map(1L -> Some("a"), 2L -> None, 3L -> None))
  }

  test("mismatched pre-partitioned children are re-shuffled, AQE on and off") {
    // children arrive hash-partitioned on the key with DIFFERENT partition
    // counts — a bare ClusteredDistribution would accept both layouts and
    // zipPartitions would throw; requiredNumPartitions forces re-shuffle
    val left = Seq((1L, "u", 100L), (2L, "v", 205L), (3L, "w", 50L))
      .toDF("id", "k", "t").repartition(7, col("k"))
    val right = Seq(("u", 90L, "a"), ("v", 200L, "b"), ("w", 60L, "c"))
      .toDF("k", "t", "tag").repartition(3, col("k"))
    val expect = Map(1L -> Some("a"), 2L -> Some("b"), 3L -> None)
    for (aqe <- Seq("true", "false")) {
      val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      try {
        val out = AsofJoin(left, right, "k", "t", "t")
          .select(col("id"), col("tag"))
          .as[(Long, Option[String])].collect().toMap
        assert(out === expect, s"aqe=$aqe")
      } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    }
  }

  test("right rows tied on (key, ts) resolve deterministically") {
    val left = Seq((1L, "u", 100L)).toDF("id", "k", "t")
    val right = Seq(("u", 100L, "a"), ("u", 100L, "c"), ("u", 100L, "b"))
      .toDF("k", "t", "tag")
    val got = (1 to 5).map { _ =>
      AsofJoin(left, right.repartition(4), "k", "t", "t")
        .select("tag").as[String].head()
    }
    // requiredChildOrdering tiebreaks on the remaining right columns, so
    // "latest wins" is a fixed total order: the greatest tag
    assert(got.toSet === Set("c"))
  }

  test("directional nearest as-of plans ONE exchange for both direction windows") {
    def ts(s: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s))
    val left = Seq((1L, "u", ts(100))).toDF("id", "k", "t")
    val right = Seq(("u", ts(90), 9.0)).toDF("k", "t", "v")
    val plan = graft.ops.Relational.asofJoinDirectional(
        left, right, "k", "t", "t", Seq("v"), "nearest", Some(100L))
      .queryExecution.executedPlan.toString
    // both windows partition on __key: the second must reuse the first's
    // exchange (two Sorts, one hashpartitioning Exchange over the union)
    assert(plan.split("Exchange hashpartitioning").length == 2, plan)
  }

  test("physical plan is the custom exec with one exchange per side") {
    val ev = Tables.events(spark, sfDir)
    val l = ev.filter(col("event_type") === "error").select("event_id", "user_id", "ts")
    val r = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"))
    val plan = AsofJoin(l, r, "user_id", "ts", "pts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin user_id"), plan)  // nodeName strips "Exec"
    assert(plan.split("Exchange hashpartitioning").length == 3, plan)  // exactly one per side
  }
}
