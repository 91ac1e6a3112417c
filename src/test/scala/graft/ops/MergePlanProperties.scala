package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property tests (SURVEY.md §5.3): merge-plan invariants hold for arbitrary
  * source/target key sets — create ∪ update covers source, delete = target ∖
  * source, flags are disjoint, and a second run over the "applied" state
  * yields updates only.
  *
  * Uses scalacheck generators with fixed seeds directly (the scalatest
  * bridge artifact isn't in the offline cache); 5 cases per property keeps
  * the Spark-job count reasonable.
  */
class MergePlanProperties extends SparkSpec {
  import spark.implicits._

  private val keyGen = Gen.listOfN(12, Gen.oneOf(
    "alpha", "Beta", "GAMMA", "delta", "Epsilon", "zeta", "Eta", "theta"))

  private def cases(n: Int): Seq[List[String]] =
    (0 until n).map(i => keyGen.apply(Gen.Parameters.default, Seed(i.toLong)).get)

  test("merge-plan invariants hold for arbitrary source/target key multisets") {
    for ((srcKeys, tgtKeys) <- cases(5).zip(cases(5).reverse)) {
      val src = srcKeys.distinct.zipWithIndex.map { case (k, i) => (k, i) }.toDF("name", "v")
      val tgt = tgtKeys.distinct.zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "tag")
      val plan = Relational.mergePlan(src, tgt, "name", "tag", "id")
        .select("name", "op_flag").as[(String, String)].collect()

      val bySrcKey = plan.filter(_._1 != null)
      assert(bySrcKey.length === srcKeys.distinct.length) // source fully covered
      assert(bySrcKey.forall(p => p._2 == "create" || p._2 == "update"))

      val srcLower = srcKeys.map(_.toLowerCase).toSet
      val expectedDeletes = tgtKeys.map(_.toLowerCase).distinct.count(!srcLower.contains(_))
      assert(plan.count(_._2 == "delete") === expectedDeletes)
    }
  }

  test("second run after applying the plan yields updates only") {
    for (srcKeys <- cases(5)) {
      val src = srcKeys.distinct.zipWithIndex.map { case (k, i) => (k, i) }.toDF("name", "v")
      // "apply" the plan: target now mirrors source keys exactly
      val applied = srcKeys.distinct.zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "tag")
      val second = Relational.mergePlan(src, applied, "name", "tag", "id")
        .select("op_flag").as[String].collect()
      assert(second.forall(_ == "update"))
    }
  }
}
