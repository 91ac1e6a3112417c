package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("exact dedup keeps one row per normalized text, smallest id first") {
    val d = docs(
      1L -> "Hello  World",
      2L -> "hello world",   // dup of 1 after normalization
      3L -> "different text")
    val out = Dedup.exact(d, col("text"), Seq(col("doc_id")))
    assert(out.select("doc_id").as[Long].collect().toSet === Set(1L, 3L))
  }

  test("canonicalDedupMap: punctuation/digit variants map to one survivor") {
    val d = docs(
      1L -> "Order #123: hello, world!",
      2L -> "order  #456 hello world",   // same letters-only canonical form
      3L -> "ORDER hello world.",        // and again
      4L -> "different text")
    val out = Dedup.canonicalDedupMap(d, "doc_id", col("text"))
      .select("doc_id", "survivor", "n_copies", "is_survivor")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out.size === 4)                       // one row PER doc (a map)
    assert(out(1L) === ((1L, 1L, 3L, true)))
    assert(out(2L) === ((2L, 1L, 3L, false)))
    assert(out(3L) === ((3L, 1L, 3L, false)))
    assert(out(4L) === ((4L, 4L, 1L, true)))
  }

  test("shingles produces n-k+1 word 3-grams, none for short docs") {
    val d = docs(1L -> "a b c d", 2L -> "x y")
    val sh = Dedup.shingles(d, "doc_id", col("text"))
      .as[(Long, String)].collect().toSet
    assert(sh === Set((1L, "a b c"), (1L, "b c d")))
  }

  test("minhash signatures are equal iff shingle sets are equal (here: dup docs)") {
    val d = docs(
      1L -> "the quick brown fox jumps",
      2L -> "the quick brown fox jumps",
      3L -> "a completely different sentence here")
    val sig = Dedup.minhashSignature(d, "doc_id", col("text")).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(i => r.getString(i)))
      .toMap
    assert(sig(1L) === sig(2L))
    assert(sig(1L) !== sig(3L))
  }

  test("lshCandidates surfaces exact duplicates as a candidate pair") {
    val d = docs(
      1L -> "one two three four five six",
      2L -> "one two three four five six",
      3L -> "seven eight nine ten eleven twelve")
    val sig = Dedup.minhashSignature(d, "doc_id", col("text"))
    val cand = Dedup.lshCandidates(sig, "doc_id", bands = 4, rowsPerBand = 2)
      .as[(Long, Long)].collect().toSet
    assert(cand.contains((1L, 2L)))
    assert(!cand.exists { case (a, b) => a >= b }) // canonical a < b, no self-pairs
  }

  test("fused minAgree prefilter equals standalone minhashPrefilter, subset of raw candidates") {
    val d = graft.model.Tables.documents(spark, sfDir)
    val sig = Dedup.minhashSignature(d, "doc_id", col("text")).localCheckpoint()
    val raw = Dedup.lshCandidates(sig, "doc_id", bands = 4, rowsPerBand = 2)
      .as[(Long, Long)].collect().toSet
    val standalone = Dedup.minhashPrefilter(
        Dedup.lshCandidates(sig, "doc_id", bands = 4, rowsPerBand = 2),
        sig, "doc_id", numHashes = 8, minAgree = 3)
      .as[(Long, Long)].collect().toSet
    val fused = Dedup.lshCandidates(sig, "doc_id", bands = 4, rowsPerBand = 2,
        minAgree = 3).as[(Long, Long)].collect().toSet
    assert(fused === standalone)
    assert(fused.subsetOf(raw))
    // sanity: a full-agreement threshold keeps only signature-identical pairs
    val all8 = Dedup.lshCandidates(sig, "doc_id", bands = 4, rowsPerBand = 2,
        minAgree = 8).as[(Long, Long)].collect().toSet
    assert(all8.subsetOf(fused))
  }

  test("simhashPairs equals the brute-force Hamming ball (banding loses nothing)") {
    val d = graft.model.Tables.documents(spark, sfDir).limit(80).localCheckpoint()
    val banded = Dedup.simhashPairs(d, "doc_id", col("text"), maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    val fp = d.select(col("doc_id"), Dedup.simhash16(col("text")).as("sh"))
    val l = fp.select(col("doc_id").as("a"), col("sh").as("__sa"))
    val r = fp.select(col("doc_id").as("b"), col("sh").as("__sb"))
    val dist = (1 to 16).map(i =>
        when(substring(col("__sa"), i, 1) =!= substring(col("__sb"), i, 1), 1)
          .otherwise(0)).reduce(_ + _)
    val brute = l.crossJoin(r).filter(col("a") < col("b"))
      .select(col("a"), col("b"), dist.cast("long").as("dist"))
      .filter(col("dist") <= 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(banded === brute)
  }

  test("charGramJaccard: exact 3-gram set jaccard on a known case") {
    val docs = Seq((1L, "abcd"), (2L, "bcde"), (3L, "  ABCD "), (4L, "zz"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val j = Dedup.charGramJaccard(pairs, docs, "doc_id", col("text"), n = 3)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // {abc,bcd} vs {bcd,cde}: 1/3; normalization maps "  ABCD " -> "abcd": 1.0;
    // "zz" is shorter than n: empty gram set, jaccard 0
    assert(j((1L, 2L)) === 0.333333)
    assert(j((1L, 3L)) === 1.0)
    assert(j((1L, 4L)) === 0.0)
  }

  test("charGramJaccard kernel is value-identical to the staged-HOF twin on real docs") {
    val docs = graft.model.Tables.documents(spark, sfDir).localCheckpoint()
    val pairs = docs.select(col("doc_id").as("a"), (col("doc_id") + 1).as("b"))
      .join(docs.select(col("doc_id").as("b")), Seq("b"), "left_semi")
    val kernel = Dedup.charGramJaccard(pairs, docs, "doc_id", col("text"), n = 3)
    val hof = Dedup.charGramJaccardHof(pairs, docs, "doc_id", col("text"), n = 3)
    assert(kernel.exceptAll(hof).isEmpty && hof.exceptAll(kernel).isEmpty)
    assert(kernel.count() === pairs.count())
  }

  test("simhashAdjacency multiplicities account for every simhashPairs doc pair") {
    val d = graft.model.Tables.documents(spark, sfDir).localCheckpoint()
    val pairCount = Dedup.simhashPairs(d, "doc_id", col("text"), maxDist = 2).count()
    val adj = Dedup.simhashAdjacency(d, "doc_id", col("text"), maxDist = 2)
    val total = adj.agg(sum(col("n_pairs"))).head().getLong(0)
    assert(total === pairCount)
    // within-cluster rows are symmetric markers, cross rows strictly ordered
    assert(adj.filter(col("sha") > col("shb")).count() === 0)
    assert(adj.filter(col("sha") === col("shb") && col("dist") =!= 0).count() === 0)
  }

  test("lshCandidates caps over-full buckets to star edges: never n², still connected") {
    // 30 identical docs share every band bucket; with maxBucketSize=10 the
    // 30·29/2=435-pair blow-up degrades to 29 star edges around the min id
    // — connectivity preserved (the mega-group still clusters downstream),
    // quadratic pair generation avoided. A small distinct pair in its own
    // bucket is unaffected by the cap.
    val mega = (1L to 30L).map(i => i -> "same words everywhere all along")
    val pair = Seq(40L -> "rare unique sentence appears twice", 41L -> "rare unique sentence appears twice")
    val sig = Dedup.minhashSignature(docs((mega ++ pair): _*), "doc_id", col("text"))
    val capped = Dedup.lshCandidates(sig, "doc_id", bands = 4, rowsPerBand = 2,
      maxBucketSize = 10).as[(Long, Long)].collect().toSet
    assert(capped === ((2L to 30L).map(i => (1L, i)).toSet + ((40L, 41L))))
    val uncapped = Dedup.lshCandidates(sig, "doc_id", bands = 4, rowsPerBand = 2)
      .as[(Long, Long)].collect().toSet
    assert(uncapped.size === 30 * 29 / 2 + 1)

    // and the end-to-end clusters still merge the capped mega-group into
    // ONE component via the star edges (the first cut dropped the bucket,
    // leaving 30 singletons — exactly the most-duplicated content undeduped)
    val cl = Dedup.nearDupClusters(docs((mega ++ pair): _*), "doc_id", col("text"),
        maxBucketSize = 10)
      .as[(Long, Long)].collect().toMap
    assert((1L to 30L).forall(cl(_) == 1L))
    assert(cl(40L) === 40L && cl(41L) === 40L)
  }

  test("jaccardVerify computes exact word-set jaccard") {
    val d = docs(1L -> "a b c", 2L -> "b c d", 3L -> "x y z")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("a", "b")
    val j = Dedup.jaccardVerify(pairs, d, "doc_id", col("text"))
      .as[(Long, Long, Double)].collect().map { case (a, b, v) => (a, b) -> v }.toMap
    assert(j((1L, 2L)) === 0.5)  // {b,c} / {a,b,c,d}
    assert(j((1L, 3L)) === 0.0)
  }

  test("simhash16 is deterministic and equal for identical texts") {
    val d = docs(1L -> "spark engine test", 2L -> "spark engine test", 3L -> "other words")
    val sh = d.select(col("doc_id"), Dedup.simhash16(col("text")).as("sh"))
      .as[(Long, String)].collect().toMap
    assert(sh(1L) === sh(2L))
    assert(sh(1L).length === 16)
    assert(sh(1L).forall(c => c == '0' || c == '1'))
  }

  test("exact dedup is idempotent and stable across runs") {
    val d = docs((1L to 20L).map(i => i -> s"text number ${i % 7}"): _*)
    val once = Dedup.exact(d, col("text"), Seq(col("doc_id")))
    val twice = Dedup.exact(once.drop("fp"), col("text"), Seq(col("doc_id")))
    assert(once.count() === 7)
    assert(twice.count() === once.count())
    val a = once.select("doc_id").as[Long].collect().toSet
    val b = Dedup.exact(d, col("text"), Seq(col("doc_id")))
      .select("doc_id").as[Long].collect().toSet
    assert(a === b)
  }

  test("connectedComponents: chains collapse to min id, separate components stay apart") {
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    val cc = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents: small-graph union-find path ≡ distributed ladder") {
    // a messy random graph (self-loops, duplicate and reversed edges,
    // multiple chain/star components) through BOTH code paths — the gated
    // local fast path must be bit-identical to the iterative ladder
    val rnd = new scala.util.Random(42)
    val raw = (0 until 400).map { _ =>
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong)
    } ++ Seq((200L, 200L), (300L, 301L), (301L, 300L))
    val edges = raw.toDF("a", "b")
    val local = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    val dist = Dedup.connectedComponents(edges, localEdgeCap = 0)
      .as[(Long, Long)].collect().toMap
    assert(local === dist)
    // and the int-typed id column round-trips through the cast seam
    val intEdges = raw.map { case (a, b) => (a.toInt, b.toInt) }.toDF("a", "b")
    val ccInt = Dedup.connectedComponents(intEdges)
    assert(ccInt.schema("id").dataType ===
      org.apache.spark.sql.types.IntegerType)
    assert(ccInt.as[(Int, Int)].collect().toMap ===
      dist.map { case (k, v) => (k.toInt, v.toInt) })
  }

  test("prefixFilterJaccard: equals brute force (no false negatives), prefix prunes") {
    val d = docs(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta zeta",     // J(1,2) = 4/6 = 0.667
      3L -> "alpha beta gamma delta epsilon",  // J(1,3) = 1.0
      4L -> "omega psi chi",                   // J with others = 0
      5L -> "alpha beta gamma delta epsilon zeta") // J(1,5)=5/6, J(2,5)=5/6, J(3,5)=5/6
    val t = 0.8
    val got = Dedup.prefixFilterJaccard(d, "doc_id", col("text"), t)
      .select("a", "b", "jaccard").as[(Long, Long, Double)].collect().toSet
    // brute force over ALL pairs through the same exact verify
    val all = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val brute = Dedup.jaccardVerify(all.toDF("a", "b"), d, "doc_id", col("text"))
      .filter(col("jaccard") >= t)
      .select("a", "b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(got === brute)
    assert(got.map(p => (p._1, p._2)) === Set((1L, 3L), (1L, 5L), (2L, 5L), (3L, 5L)))
  }

  test("connectedComponents on an empty edge list returns empty, not NPE") {
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Dedup.connectedComponents(edges).count() === 0)
  }

  test("adversarial diameter: 20k-vertex path and ring both collapse to component 0 (pointer-jump converges far under the backstop)") {
    // worst-case topology for min-label propagation: one chain, diameter
    // 20k. Plain propagation would need 20k rounds; the propagate+jump
    // doubling needs ~log2(20k)+2 ≈ 17 — convergence (all labels 0, the
    // loud require in connectedComponents not tripped) IS the proof.
    val n = 20000L
    val path = spark.range(n - 1).select(col("id").as("a"), (col("id") + 1).as("b"))
    val ccP = Dedup.connectedComponents(path, localEdgeCap = 0)
    assert(ccP.count() === n)
    assert(ccP.filter(col("component") =!= 0L).count() === 0L)
    val ring = spark.range(n).select(col("id").as("a"), ((col("id") + 1) % n).as("b"))
    val ccR = Dedup.connectedComponents(ring, localEdgeCap = 0)
    assert(ccR.count() === n)
    assert(ccR.filter(col("component") =!= 0L).count() === 0L)
  }

  test("connectedComponents fails loud when the backstop truly is too small") {
    val path = spark.range(63).select(col("id").as("a"), (col("id") + 1).as("b"))
    val err = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(path, maxIter = 2, localEdgeCap = 0)
    }
    assert(err.getMessage.contains("no fixpoint"))
  }

  test("connectedComponents converges with ids near Long.MaxValue (no sum overflow)") {
    // adversarial ids: any two of these wrap a BIGINT label sum — the
    // convergence probe must use exact (decimal) arithmetic, or a wrapped
    // sum colliding across rounds could stop the loop before the fixpoint
    val m = Long.MaxValue
    val edges = Seq(
      (m - 1L, m - 3L), (m - 3L, m - 5L),      // chain → component m-5
      (m - 2L, m - 4L),                        // pair  → component m-4
      (7L, m - 6L)                             // small-meets-huge → component 7
    ).toDF("a", "b")
    val cc = Dedup.connectedComponents(edges, localEdgeCap = 0)
      .as[(Long, Long)].collect().toMap
    assert(cc === Map(
      (m - 1L) -> (m - 5L), (m - 3L) -> (m - 5L), (m - 5L) -> (m - 5L),
      (m - 2L) -> (m - 4L), (m - 4L) -> (m - 4L),
      7L -> 7L, (m - 6L) -> 7L))
  }

  test("nearDupClusters: zero candidate pairs yields all-singleton components") {
    // every doc unique → LSH produces no pairs → empty edge list downstream
    val d = docs(
      1L -> "first totally distinct sentence one",
      2L -> "second entirely different words here",
      3L -> "third unrelated phrase altogether now")
    val cl = Dedup.nearDupClusters(d, "doc_id", col("text"))
      .as[(Long, Long)].collect().toMap
    assert(cl === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("nearDupClusters: duplicate docs share a component, unique docs are singletons") {
    val d = docs(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta epsilon",   // dup of 1
      5L -> "alpha beta gamma delta epsilon",   // dup of 1
      7L -> "zeta eta theta iota kappa lambda")
    val cl = Dedup.nearDupClusters(d, "doc_id", col("text"))
      .as[(Long, Long)].collect().toMap
    assert(cl(1L) === 1L && cl(2L) === 1L && cl(5L) === 1L)
    assert(cl(7L) === 7L)
  }

  test("near-duplicate texts have small simhash hamming distance vs unrelated") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val near = base.replace("dog", "cat")
    val far  = "completely unrelated words about database engines and columnar storage"
    val d = docs(1L -> base, 2L -> near, 3L -> far)
    val sh = d.select(col("doc_id"), Dedup.simhash16(col("text")).as("sh"))
      .as[(Long, String)].collect().toMap
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(ham(sh(1L), sh(2L)) <= ham(sh(1L), sh(3L)))
  }

  test("incrementalDedup equals the plain anti-join (bloom has no false negatives)") {
    val corpus = docs(
      1L -> "already ingested document one",
      2L -> "already ingested document two",
      3L -> "Already   Ingested Document ONE")   // normalized dup of 1
    val batch = docs(
      10L -> "already ingested document one",    // exact dup -> dropped
      11L -> "ALREADY ingested   document two",  // normalized dup -> dropped
      12L -> "a genuinely new document",
      13L -> "another genuinely new document")
    val got = Dedup.incrementalDedup(batch, corpus, col("text"), col("text"))
      .select("doc_id").as[Long].collect().sorted
    assert(got === Seq(12L, 13L))
    // and the result is exactly what the full anti-join computes
    val expected = batch
      .withColumn("f", graft.text.TextAnalysis.fingerprint(col("text")))
      .join(corpus.select(graft.text.TextAnalysis.fingerprint(col("text")).as("f")),
        Seq("f"), "left_anti")
      .select("doc_id").as[Long].collect().sorted
    assert(got === expected)
  }

  test("editDistancePairs: finds within-block near-names, bounds distance, skips cross-block") {
    import spark.implicits._
    val df = Seq(
      1L -> "alpha widget deluxe",
      2L -> "alpha widgit deluxe",   // 1 substitution from 1
      3L -> "alpha widget deluxe x", // 2 edits from 1 (space + x appended)
      4L -> "alpha completely different phrase here totally", // same block, far
      5L -> "beta widget deluxe"     // near 1 by distance but different block
    ).toDF("id", "name")
    val got = Dedup.editDistancePairs(df, "id", "name", maxDist = 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    // (2,3) is distance 3 -> cut by the threshold; 4 is cut by the length
    // band; 5 shares no block key
    assert(got === Set((1L, 2L, 1L), (1L, 3L, 2L)))
  }

  test("contaminationPairs: distinct shared n-grams, df-cap drops boilerplate grams") {
    import spark.implicits._
    val train = Seq(1L -> "a b c d e", 2L -> "z b c d e",
      3L -> "totally unrelated training text").toDF("doc_id", "text")
    val bench = Seq(100L -> "q b c d e",
      101L -> "a b c d a b c d",          // repeated gram counts once
      102L -> "no overlap here at all").toDF("doc_id", "text")
    def run(maxDf: Long) =
      Dedup.contaminationPairs(train, bench, "doc_id", col("text"), 4, maxDf)
        .select("bench_doc", "train_doc", "n_shared")
        .as[(Long, Long, Long)].collect().toSet
    // "b c d e" is in train docs 1 and 2 (df=2); "a b c d" only in doc 1
    assert(run(2) === Set((100L, 1L, 1L), (100L, 2L, 1L), (101L, 1L, 1L)))
    // df-cap 1 kills the df=2 gram; only the unique "a b c d" overlap stays
    assert(run(1) === Set((101L, 1L, 1L)))
  }
}
