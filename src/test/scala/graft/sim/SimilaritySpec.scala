package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float], String)*) =
    rows.toDF("vec_id", "embedding", "label")

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val df = Seq(
      (Seq(1f, 0f), Seq(1f, 0f)),
      (Seq(1f, 0f), Seq(0f, 1f)),
      (Seq(1f, 0f), Seq(-1f, 0f))).toDF("a", "b")
    val out = df.select(round(Similarity.cosine(col("a"), col("b")), 9)).as[Double].collect().toSeq
    assert(out === Seq(1.0, 0.0, -1.0))
  }

  test("bruteForceTopK ranks neighbors by cosine desc, excludes self") {
    val d = vecs(
      (0L, Seq(1f, 0f, 0f), "q"),
      (1L, Seq(0.9f, 0.1f, 0f), "c"),   // closest
      (2L, Seq(0f, 1f, 0f), "c"),       // orthogonal
      (3L, Seq(0.5f, 0.5f, 0f), "c"))   // middle
    val out = Similarity.bruteForceTopK(d.filter(col("vec_id") === 0), d, 3)
      .select("qid", "nid", "rank").as[(Long, Long, Long)].collect()
      .sortBy(_._3).map(_._2).toSeq
    assert(out === Seq(1L, 3L, 2L))
  }

  test("lshBucket: same vector → same bucket; lshTopK finds exact duplicate") {
    val d = vecs(
      (0L, Seq.fill(64)(1f), "a"),
      (1L, Seq.fill(64)(1f), "a"),
      (2L, Seq.tabulate(64)(i => if (i % 2 == 0) 1f else -1f), "b"))
    val buckets = d.select(col("vec_id"),
      Similarity.lshBucket(col("embedding")).as("b")).as[(Long, String)].collect().toMap
    assert(buckets(0L) === buckets(1L))
    val ann = Similarity.lshTopK(d.filter(col("vec_id") === 0), d, 1)
      .select("nid").as[Long].collect().toSeq
    assert(ann === Seq(1L))
  }

  test("centroids computes element-wise mean per label") {
    val d = vecs(
      (0L, Seq(1f, 2f), "x"),
      (1L, Seq(3f, 4f), "x"),
      (2L, Seq(10f, 20f), "y"))
    val c = Similarity.centroids(d, dims = 2)
      .select("label", "centroid").as[(String, Seq[Double])].collect().toMap
    assert(c("x") === Seq(2.0, 3.0))
    assert(c("y") === Seq(10.0, 20.0))
  }

  test("int8 quantization: bounded range, high recon cosine, zero-vector total") {
    val d = vecs(
      (0L, Seq(0.5f, -1.0f, 0.25f, 0.75f), "a"),
      (1L, Seq(0f, 0f, 0f, 0f), "z"))   // zero vector: scale falls back to 1
      .withColumn("__s", Similarity.quantScale(col("embedding")))
      .withColumn("__q", Similarity.quantizeInt8(col("embedding"), col("__s")))
    val rows = d.select(col("vec_id"), col("__q"),
        // ANSI mode: guard the zero-norm vector (cosine undefined there)
        when(col("vec_id") === 0L,
          Similarity.cosine(col("embedding"),
            Similarity.dequantize(col("__q"), col("__s")))).as("rc"))
      .as[(Long, Seq[Int], Option[Double])].collect()
      .map { case (id, q, rc) => id -> (q, rc) }.toMap
    val (q0, rc0) = rows(0L)
    assert(q0.forall(v => v >= -127 && v <= 127))
    assert(q0 === Seq(64, -127, 32, 95)) // x / (1/127), half-up
    assert(rc0.get > 0.9999)             // 4x smaller, sub-1e-4 angle error
    assert(rows(1L)._1 === Seq(0, 0, 0, 0)) // zero vector quantizes to zeros
  }

  test("centroidOutliers: cosine to own-label centroid, zero-norm guarded") {
    val emb = Seq(
      (1L, 0, Seq(1.0f, 0.0f)),   // label 0 centroid = (0.5, 0.5)
      (2L, 0, Seq(0.0f, 1.0f)),
      (3L, 1, Seq(2.0f, 2.0f)),   // own centroid -> sim 1
      (4L, 2, Seq(1.0f, 0.0f)),   // label 2 centroid = (0, 0): degenerate
      (5L, 2, Seq(-1.0f, 0.0f))
    ).toDF("vec_id", "label", "embedding")
    val r = Similarity.centroidOutliers(emb, "vec_id", "label", "embedding", 0.8)
      .select("vec_id", "sim", "is_outlier")
      .as[(Long, Double, Boolean)].collect().map(x => x._1 -> (x._2, x._3)).toMap
    // cos((1,0),(0.5,0.5)) = 0.5/(1 * sqrt(0.5)) = 0.707106...
    assert(math.abs(r(1L)._1 - 0.707106) < 2e-6 && r(1L)._2)
    assert(math.abs(r(2L)._1 - 0.707106) < 2e-6 && r(2L)._2)
    assert(math.abs(r(3L)._1 - 1.0) < 2e-6 && !r(3L)._2)
    assert(r(4L) === ((0.0, true)) && r(5L) === ((0.0, true)))
  }
}
