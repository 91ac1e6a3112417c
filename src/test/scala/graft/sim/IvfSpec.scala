package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Tables

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("ivfAssign puts every vector in exactly one of k cells") {
    val emb = Tables.embeddings(spark, sfDir)
    val cents = Similarity.ivfCentroids(emb, k = 8, iters = 2)
    assert(cents.length === 8)
    val assigned = Similarity.ivfAssign(emb, cents)
    assert(assigned.count() === emb.count())
    val cellIds = assigned.select("cell").distinct().as[Int].collect()
    assert(cellIds.forall(c => c >= 0 && c < 8))
  }

  test("ivfTopK finds an exact duplicate vector (same cell by construction)") {
    val base = Seq.tabulate(64)(i => math.sin(i.toDouble).toFloat)
    val d = (0L until 40L).map { i =>
      val v = if (i == 1L) base
        else Seq.tabulate(64)(j => math.cos(j * (i + 2.0)).toFloat)
      (i, v, (i % 4).toInt)
    }.toDF("vec_id", "embedding", "label")
    val dup = Seq((99L, base, 0)).toDF("vec_id", "embedding", "label")
    val out = Similarity.ivfTopK(dup, d, k = 1, nprobe = 1, cells = 4)
      .select("nid", "sim").as[(Long, Double)].collect()
    assert(out.length === 1)
    assert(out(0)._1 === 1L)
    assert(out(0)._2 === 1.0)
  }

  test("ivf recall vs brute force is high at nprobe=4 of 8 cells") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(queries, emb, 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(queries, emb, 5, nprobe = 4, cells = 8)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low")
  }

  test("nprobe = cells makes IVF EXACTLY brute force (partition identity)") {
    // probing every cell partitions the corpus without dropping anything,
    // so the IVF result must be BIT-IDENTICAL to brute force — including
    // ranks and scores, not just recall. The property that makes nprobe a
    // pure recall/latency dial: correctness loss comes ONLY from probed
    // cells, never from the cell routing itself.
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") % 37 === 0)
    val exact = Similarity.bruteForceTopK(queries, emb, 5)
      .select("qid", "nid", "sim").as[(Long, Long, Double)].collect().toSet
    val ivf = Similarity.ivfTopK(queries, emb, 5, nprobe = 8, cells = 8)
      .select("qid", "nid", "sim").as[(Long, Long, Double)].collect().toSet
    assert(ivf === exact)
  }

  test("PQ codes reconstruct: pqEncode maps each subvector to its nearest codeword") {
    val emb = Tables.embeddings(spark, sfDir)
    val cbs = Similarity.pqTrain(emb, m = 8, ks = 16, iters = 2)
    assert(cbs.length === 8 && cbs.forall(_.length === 16))
    assert(cbs.forall(_.forall(_.length === 8)))
    val codes = emb.select(col("vec_id"), col("embedding"),
        Similarity.pqEncode(col("embedding"), cbs).as("code"))
      .limit(20).collect()
    for (r <- codes) {
      val v = r.getSeq[Float](1)
      val code = r.getSeq[Int](2)
      assert(code.length === 8)
      for (j <- 0 until 8) {
        val sub = v.slice(j * 8, (j + 1) * 8).map(_.toDouble)
        def l2(cw: Seq[Double]) =
          cw.zip(sub).map { case (a, b) => (a - b) * (a - b) }.sum
        val dists = cbs(j).map(l2)
        assert(dists(code(j)) === dists.min,
          s"vec ${r.getLong(0)} sub $j: code ${code(j)} not argmin")
      }
    }
  }

  test("q140 IVF-PQ shortlist re-rank recovers most of the exact in-cell top-5 (recall bar)") {
    // the approximation-quality bar for the PQ path, the q94 discipline:
    // q140 is hash-verified within its pinned fixture, so what the oracle
    // can't express — how close ADC-shortlisting gets to the EXACT re-rank
    // of the whole probed cells — is asserted here as a named test
    val emb = Tables.embeddings(spark, sfDir)
    val cents = Similarity.ivfCentroids(emb, 16)
    val cbs = Similarity.pqTrain(emb, m = 8, ks = 16)
    val assigned = Similarity.ivfAssign(emb, cents)
      .withColumn("code", Similarity.pqEncode(col("embedding"), cbs))
      .transform(graft.util.Cleanup.checkpoint(_))
    val qCells = Similarity.probeCells(emb.filter(col("vec_id") < 50), cents, 4)
      .transform(graft.util.Cleanup.checkpoint(_))
    val exact = Similarity.ivfRank(assigned,
        assigned.select(col("vec_id").as("nid"), col("embedding").as("__ce"),
          col("cell")),
        qCells, 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val pq = Similarity.ivfPqRank(assigned,
        assigned.select(col("vec_id").as("nid"), col("cell"), col("code")),
        qCells,
        assigned.select(col("vec_id").as("nid"), col("embedding").as("__ce")),
        cbs, k = 5, shortlist = 40)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (exact intersect pq).size.toDouble / exact.size
    assert(recall >= 0.7, s"PQ shortlist recall $recall below the q140 bar")
  }

  test("q94 parameters (nprobe=4 of 16 cells) clear the 0.6 mean-recall bar") {
    // the recall property the pre-r5 inline gate enforced: q94 is now
    // hash-verified within its pinned cells, so the APPROXIMATION quality
    // is asserted here instead — a centroid/probe regression fails this
    // named test instead of silently emptying the query result
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 50)
    val exact = Similarity.bruteForceTopK(queries, emb, 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(queries, emb, 5, nprobe = 4, cells = 16)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.6, s"mean recall $recall below the q94 bar")
  }
}
