package graft.ops

import graft.SparkSpec

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("nullFraction: truncated fraction, threshold gate, empty-table zero") {
    val d = Seq(Some(1.0), None, Some(3.0)).toDF("v")
    val r = DataQuality.nullFraction("nf", d, "v", 0.5)
      .as[(String, Double, Boolean)].head()
    assert(r === (("nf", 0.333333, true)))
    val tight = DataQuality.nullFraction("nf", d, "v", 0.1)
      .as[(String, Double, Boolean)].head()
    assert(!tight._3)
    val empty = DataQuality.nullFraction("nf", d.filter("v > 99"), "v", 0.0)
      .as[(String, Double, Boolean)].head()
    assert(empty === (("nf", 0.0, true)))
  }

  test("unique: counts excess rows per duplicate key tuple") {
    val d = Seq((1, "a"), (1, "a"), (1, "b"), (2, "a")).toDF("k", "s")
    val one = DataQuality.unique("u1", d, Seq("k"))
      .as[(String, Double, Boolean)].head()
    assert(one === (("u1", 2.0, false)))      // key 1 has 3 rows -> 2 excess
    val two = DataQuality.unique("u2", d, Seq("k", "s"))
      .as[(String, Double, Boolean)].head()
    assert(two === (("u2", 1.0, false)))      // (1,a) twice -> 1 excess
  }

  test("referential: orphans counted, null keys are orphans") {
    val child = Seq(Some(1), Some(2), Some(9), None).toDF("fk")
    val parent = Seq(1, 2, 3).toDF("pk")
    val r = DataQuality.referential("r", child, "fk", parent, "pk")
      .as[(String, Double, Boolean)].head()
    assert(r === (("r", 2.0, false)))         // 9 and NULL
  }

  test("acceptedValues and inRange count violations; suite unions sorted") {
    val d = Seq(("A", 5.0), ("N", 60.0), ("X", 10.0)).toDF("flag", "qty")
    val suite = DataQuality.suite(Seq(
      DataQuality.acceptedValues("b_set", d, "flag", Seq("A", "N")),
      DataQuality.inRange("a_range", d, "qty", 1.0, 50.0)))
      .as[(String, Double, Boolean)].collect().toSeq
    assert(suite === Seq(("a_range", 1.0, false), ("b_set", 1.0, false)))
  }

  test("tableChecks: fused single-pass equals the unioned per-check forms") {
    val d = Seq((Some("A"), 5.0), (Some("N"), 60.0), (Some("X"), 10.0),
      (None: Option[String], 0.5)).toDF("flag", "qty")
    val fused = DataQuality.tableChecks(d, Seq(
      DataQuality.NullFrac("nf:flag", "flag", 0.2),
      DataQuality.Accepted("set:flag", "flag", Seq("A", "N")),
      DataQuality.Range("range:qty", "qty", 1.0, 50.0)))
      .orderBy("check").as[(String, Double, Boolean)].collect().toSeq
    val unioned = DataQuality.suite(Seq(
      DataQuality.nullFraction("nf:flag", d, "flag", 0.2),
      DataQuality.acceptedValues("set:flag", d, "flag", Seq("A", "N")),
      DataQuality.inRange("range:qty", d, "qty", 1.0, 50.0)))
      .as[(String, Double, Boolean)].collect().toSeq
    assert(fused === unioned)
    assert(fused === Seq(("nf:flag", 0.25, false), ("range:qty", 2.0, false),
      ("set:flag", 2.0, false)))
  }

  test("tableChecks: one scan — a single aggregate feeds every check row") {
    val d = Seq(("A", 5.0), ("N", 60.0)).toDF("flag", "qty")
    val plan = DataQuality.tableChecks(d, Seq(
      DataQuality.Accepted("s", "flag", Seq("A")),
      DataQuality.Range("r", "qty", 1.0, 50.0)))
      .queryExecution.executedPlan.toString
    // the fused form has exactly one aggregate pair (partial+final); the
    // unioned form would have one per check
    assert("HashAggregate".r.findAllIn(plan).size <= 2, plan)
  }
}
