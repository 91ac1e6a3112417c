package graft.sim

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** File-level contract of incremental IVF maintenance (q151 checks the
  * semantic invariant — maintained layout ≡ from-scratch rebuild — via the
  * DuckDB oracle; THIS spec pins what the oracle cannot see: which
  * directories the upsert physically rewrote). */
class IvfUpsertSpec extends SparkSpec {
  import spark.implicits._

  // 4 axis-aligned centroids; cosine argmax is unambiguous for these rows
  private val cents: Array[Seq[Float]] = Array(
    Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f),
    Seq(0f, 0f, 1f, 0f), Seq(0f, 0f, 0f, 1f))

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("upsert rewrites only touched cells; a moved vector leaves no stale copy; emptied dirs are dropped") {
    val dir = Files.createTempDirectory("ivf_upsert").toString + "/layout"
    // base: id1 is cell0's ONLY member; id2→c1, id3→c2, id4→c3
    Similarity.writeIvfLayout(vecs(
      1L -> Seq(0.9f, 0.1f, 0f, 0f),
      2L -> Seq(0.1f, 0.9f, 0f, 0f),
      3L -> Seq(0f, 0f, 1f, 0.2f),
      4L -> Seq(0f, 0f, 0.1f, 0.9f)), cents, dir)
    val c3Before = Files.list(Paths.get(s"$dir/cell=3")).toArray.toSeq
      .map(_.toString).sorted
    val c3Mtimes = c3Before.map(p => Files.getLastModifiedTime(Paths.get(p)))

    // delta: id1 MOVES c0→c2 (replacement), id5 inserts into c1
    val touched = Similarity.ivfUpsertLayout(spark, dir, cents, vecs(
      1L -> Seq(0f, 0f, 0.95f, 0.1f),
      5L -> Seq(0.2f, 0.8f, 0f, 0f)))

    // touched = old cell of the moved id (0) ∪ new cells (1, 2); NOT 3
    assert(touched === Seq(0, 1, 2))
    // cell0 lost its only row: the directory must be gone, not stale
    assert(!Files.exists(Paths.get(s"$dir/cell=0")))
    // the untouched cell3 directory is bit-for-bit untouched
    val c3After = Files.list(Paths.get(s"$dir/cell=3")).toArray.toSeq
      .map(_.toString).sorted
    assert(c3After === c3Before)
    assert(c3After.map(p => Files.getLastModifiedTime(Paths.get(p))) === c3Mtimes)
    // final content = fresh assignment of the updated corpus, exactly once per id
    val got = spark.read.parquet(dir)
      .select(col("vec_id"), col("cell").cast("int"))
      .as[(Long, Int)].collect().toSeq.sorted
    assert(got === Seq(1L -> 2, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 1))
  }

  test("pure insert into one cell touches exactly that cell") {
    val dir = Files.createTempDirectory("ivf_upsert2").toString + "/layout"
    Similarity.writeIvfLayout(vecs(
      1L -> Seq(0.9f, 0.1f, 0f, 0f),
      2L -> Seq(0f, 0.9f, 0f, 0f)), cents, dir)
    val touched = Similarity.ivfUpsertLayout(spark, dir, cents,
      vecs(9L -> Seq(0.8f, 0.2f, 0f, 0f)))
    assert(touched === Seq(0))
    assert(spark.read.parquet(dir).count() === 3)
  }

  test("recluster below the skew threshold is a NO-OP: no file is touched") {
    val dir = Files.createTempDirectory("ivf_recluster_noop").toString + "/layout"
    // one vector per cell: skew_factor = 1.0, the balanced ideal
    Similarity.writeIvfLayout(vecs(
      1L -> Seq(0.9f, 0.1f, 0f, 0f),
      2L -> Seq(0.1f, 0.9f, 0f, 0f),
      3L -> Seq(0f, 0f, 1f, 0.2f),
      4L -> Seq(0f, 0f, 0.1f, 0.9f)), cents, dir)
    def snapshot() = Files.walk(Paths.get(dir)).toArray.toSeq
      .map(_.toString).sorted
      .map(p => p -> Files.getLastModifiedTime(Paths.get(p)))
    val before = snapshot()
    val out = Similarity.reclusterCells(spark, dir,
      cells = 4, skewThreshold = 2.0, dims = 4)
    assert(out.isEmpty, "balanced layout must not trip the skew gate")
    assert(snapshot() === before, "a no-op recluster must not rewrite 100 TB")
  }

  test("skew-triggered recluster equals a fresh ivfCentroids+writeIvfLayout on the same corpus") {
    import org.scalatest.Assertions.withClue
    val dir = Files.createTempDirectory("ivf_recluster").toString + "/layout"
    // upsert-drift shape: 6 of 8 vectors crowd cell0 → with 3 occupied
    // cells skew_factor = 6·3/8 = 2.25, past the 2.0 gate
    val corpus = vecs(
      1L -> Seq(0.9f, 0.1f, 0f, 0f), 2L -> Seq(0.8f, 0.2f, 0f, 0f),
      3L -> Seq(0.95f, 0.05f, 0f, 0f), 4L -> Seq(0.7f, 0.3f, 0f, 0f),
      5L -> Seq(0.85f, 0.15f, 0f, 0f), 6L -> Seq(0.75f, 0.25f, 0f, 0f),
      7L -> Seq(0f, 0.9f, 0.1f, 0f), 8L -> Seq(0f, 0f, 0.9f, 0.1f))
    Similarity.writeIvfLayout(corpus, cents, dir)
    val got = Similarity.reclusterCells(spark, dir,
      cells = 4, skewThreshold = 2.0, dims = 4)
    assert(got.nonEmpty, "2.25 skew must trip the 2.0 gate")
    // the documented equivalence: recluster-in-place ≡ retraining fresh
    // over the same corpus and writing a brand-new layout
    val freshDir = Files.createTempDirectory("ivf_fresh").toString + "/layout"
    val freshCents = Similarity.ivfCentroids(corpus, k = 4, iters = 3, dims = 4)
    Similarity.writeIvfLayout(corpus, freshCents, freshDir)
    withClue("retrained centroids") { assert(got.get.toSeq === freshCents.toSeq) }
    def cellsOf(d: String) = spark.read.parquet(d)
      .select(col("vec_id"), col("cell").cast("int"))
      .as[(Long, Int)].collect().toSeq.sorted
    assert(cellsOf(dir) === cellsOf(freshDir))
  }
}
