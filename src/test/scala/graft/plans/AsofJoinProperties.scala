package graft.plans

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec
import graft.ops.Relational

/** Property tests for the custom as-of exec: on random datasets with few
  * keys, clustered timestamps (forcing duplicates and equal-ts edges), and
  * skewed sizes, the merge exec must agree with the independent
  * union+window formulation row for row. */
class AsofJoinProperties extends SparkSpec {
  import spark.implicits._

  private val rowGen = Gen.listOfN(40, for {
    k <- Gen.choose(0L, 3L)        // few keys → many per-key rows
    t <- Gen.choose(0L, 20L)       // tight ts range → duplicate timestamps
    v <- Gen.choose(0, 999)
  } yield (k, t, v))

  private def cases(n: Int) =
    (0 until n).map(i => rowGen.apply(Gen.Parameters.default, Seed(100 + i.toLong)).get)

  test("native as-of equals the union+window formulation on random data") {
    for ((leftRows, rightRows) <- cases(4).zip(cases(4).reverse)) {
      val left = leftRows.zipWithIndex
        .map { case ((k, t, _), i) => (i.toLong, k, t) }.toDF("lid", "k", "t")
      // dedup right on (k, t): at equal (key, ts) the winning right row is
      // order-dependent in both formulations — dedup makes the oracle exact
      val right = rightRows.map { case (k, t, v) => (k, t, v) }
        .toDF("k", "t", "v")
        .groupBy("k", "t").agg(max("v").as("v"))

      val native = AsofJoin(left, right, "k", "t", "t")
        .select(col("lid"), col("v")).as[(Long, Option[Int])].collect().toMap
      val windowed = Relational.asofJoin(left, right, "k", "t", "t", Seq("v"))
        .select(col("lid"), col("v")).as[(Long, Option[Int])].collect().toMap
      assert(native === windowed)
      assert(native.size === leftRows.size)
    }
  }
}
