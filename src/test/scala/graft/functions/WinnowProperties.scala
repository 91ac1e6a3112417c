package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.text.TextAnalysis

/** Property tests for the winnowing kernel: on random strings — including
  * whitespace runs, repeats, short/degenerate docs, and non-ASCII — the
  * fused rolling-hash + deque-min kernel must agree with the independent
  * staged-HOF formulation value for value, across several (k, w) shapes. */
class WinnowProperties extends SparkSpec {
  import spark.implicits._

  // word soup over a tiny alphabet: repeats and shared substrings are
  // common (the interesting regime for a fingerprinting kernel), with
  // whitespace runs and the occasional accented word
  private val wordGen = Gen.frequency(
    8 -> Gen.oneOf("alpha", "beta", "gamma", "de1ta", "ab", "x"),
    1 -> Gen.oneOf("héllo", "naïve"),
    1 -> Gen.oneOf("", "  "))
  private val docGen = for {
    n <- Gen.choose(0, 30)
    ws <- Gen.listOfN(n, wordGen)
  } yield ws.mkString(" ")

  private def docs(seed: Long, n: Int): Seq[String] =
    (0 until n).map(i =>
      docGen.apply(Gen.Parameters.default, Seed(seed + i)).get)

  test("kernel equals the staged-HOF reference on random strings, several k/w") {
    val d = docs(7L, 120).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    for ((k, w) <- Seq((8, 4), (3, 2), (5, 1), (4, 9))) {
      val native = d.select(col("id"),
        TextAnalysis.winnowFingerprints(col("text"), k, w).as("fps"))
      val hof = TextAnalysis.winnowFingerprintsHof(d, col("text"), k, w)
        .select(col("id"), col("fps"))
      assert(native.except(hof).isEmpty && hof.except(native).isEmpty,
        s"kernel/HOF divergence at k=$k w=$w")
    }
  }

  test("fingerprint containment: a doc embedded in a larger doc shares its fingerprints") {
    // winnowing's guarantee (the reason it catches contained copies):
    // every >= (w+k-1)-char verbatim run contributes at least one common
    // fingerprint to both docs — check on random fragment/padding splits
    val frags = docs(99L, 30).filter(_.replaceAll("\\s+", " ").trim.length >= 24)
    val rows = frags.zipWithIndex.map { case (f, i) =>
      (i.toLong, f, s"unrelated prefix words $i $f and unrelated suffix $i")
    }.toDF("id", "frag", "whole")
    val shared = rows.select(col("id"),
        size(array_intersect(
          TextAnalysis.winnowFingerprints(col("frag")),
          TextAnalysis.winnowFingerprints(col("whole")))).as("n"))
      .as[(Long, Int)].collect()
    assert(shared.nonEmpty && shared.forall(_._2 >= 1),
      s"containment violated for ids ${shared.filter(_._2 < 1).map(_._1).toSeq}")
  }
}
