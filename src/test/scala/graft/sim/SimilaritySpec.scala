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
}
