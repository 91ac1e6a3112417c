package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("words drops empty tokens from repeated/trailing spaces") {
    val out = Seq("a  b c ").toDF("t")
      .select(TextAnalysis.words(col("t"))).as[Seq[String]].head()
    assert(out === Seq("a", "b", "c"))
  }

  test("fingerprint is invariant under case and whitespace runs") {
    val df = Seq(("Hello  World", "hello world"), ("a b", "a   B ")).toDF("x", "y")
    val eq = df.select((TextAnalysis.fingerprint(col("x")) ===
      TextAnalysis.fingerprint(col("y"))).as("eq")).as[Boolean].collect()
    assert(eq.forall(identity))
  }

  test("langId picks the language with most marker hits; und when none") {
    val df = Seq(
      "the fast dog and the slow cat",  // en markers
      "gruppe wert zeile",              // de markers
      "qqq www zzz").toDF("t")          // none
    val out = df.select(TextAnalysis.langId(col("t"))).as[String].collect().toSeq
    assert(out === Seq("en", "de", "und"))
  }

  test("qualityFeatures: ratios and composite bounded in [0,1]") {
    val d = Seq((1L, "the quick brown fox of the lazy dog"), (2L, "")).toDF("doc_id", "text")
    val f = TextAnalysis.qualityFeatures(d, col("text"))
      .select("doc_id", "n_words", "stop_ratio", "quality")
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(f(1L)._2 === 8L)
    assert(f(1L)._3 === 0.375) // the, of, the
    assert(f.values.forall(r => r._3 >= 0 && r._3 <= 1 && r._4 >= 0 && r._4 <= 1))
    assert(f(2L)._2 === 0L && f(2L)._3 === 0.0)
  }

  test("bigramLmScore: add-one smoothed corpus LM, hand-checked") {
    // corpus: cb(a,b)=3, cb(b,a)=1; heads cu(a)=3, cu(b)=1; V={a,b,c}=3
    val d = Seq((1L, "a b a b"), (2L, "a b"), (3L, "c")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(d, "doc_id", col("text"))
      .select("doc_id", "n_bigrams", "sum_lp", "avg_lp")
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet === Set(1L, 2L)) // single-word doc has no bigrams
    val lpAB = math.floor(math.log(4.0 / 6.0) * 1e6 + 0.5) / 1e6  // -0.405465
    val lpBA = math.floor(math.log(2.0 / 4.0) * 1e6 + 0.5) / 1e6  // -0.693147
    assert(out(1L)._2 === 3L)
    assert(math.abs(out(1L)._3 - (2 * lpAB + lpBA)) < 1e-9)
    assert(out(2L)._2 === 1L)
    assert(math.abs(out(2L)._3 - lpAB) < 1e-9)
    // avg is the truncated-6 quotient of the decimal-exact sum
    assert(out(1L)._4 === math.floor(out(1L)._3 / 3 * 1e6) / 1e6)
  }

  test("chunkForEmbedding: overlapping windows cover every token; short docs = one chunk") {
    val d = Seq((1L, (1 to 12).map(i => s"w$i").mkString(" ")), (2L, "a b"), (3L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkForEmbedding(d, "doc_id", col("text"), 5, 3)
      .select("doc_id", "chunk_id", "start_tok", "n_tokens", "chunk_text")
      .as[(Long, Long, Long, Long, String)].collect()
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // starts 1,4,7,10 (stride 3 over all 12 tokens); last window runs short
    assert(d1.map(_._3).toSeq === Seq(1L, 4L, 7L, 10L))
    assert(d1.head._5 === "w1 w2 w3 w4 w5")
    assert(d1.last._5 === "w10 w11 w12" && d1.last._4 === 3L)
    // coverage: every token appears in at least one chunk
    val covered = d1.flatMap(c => c._3 until (c._3 + c._4)).toSet
    assert(covered === (1L to 12L).toSet)
    assert(out.filter(_._1 == 2L).toSeq === Seq((2L, 0L, 1L, 2L, "a b")))
    assert(!out.exists(_._1 == 3L)) // empty doc -> no chunks
  }

  test("pruneBoilerplateTokens: drops high-df tokens, keeps order, keeps emptied docs") {
    val d = Seq(
      (1L, "x y x z"),   // x in all docs (df 1.0) -> dropped
      (2L, "x q x"),
      (3L, "x x x")      // everything boilerplate -> empty text survives
    ).toDF("doc_id", "text")
    val out = TextAnalysis.pruneBoilerplateTokens(d, "doc_id", col("text"), 0.6)
      .select("doc_id", "clean_text", "n_kept", "n_dropped")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, "y z", 2L, 2L)))
    assert(out(2L) === ((2L, "q", 1L, 2L)))
    assert(out(3L) === ((3L, "", 0L, 3L)))
  }

  test("tfidfCosinePairs: shared-term pairs only, df-cap prunes") {
    val d = Seq((1L, "x y"), (2L, "x y"), (3L, "z z")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfCosinePairs(d, "doc_id", col("text"), 0.5)
      .select("a", "b", "cos").as[(Long, Long, Double)].collect()
    // docs 1,2 are identical weight vectors -> cos ~ 1; doc 3 shares no term
    assert(out.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    assert(out.head._3 >= 0.999999)
    // df-cap 1 drops x,y (df=2): no doc pair shares a surviving term
    val capped = TextAnalysis.tfidfCosinePairs(d, "doc_id", col("text"), 0.0,
      maxDf = Some(1L))
    assert(capped.count() === 0L)
  }

  test("tokenCounts: bpe-ish estimate >= word count") {
    val d = Seq((1L, "internationalization considerations"), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.tokenCounts(d, col("text"))
      .select("doc_id", "n_tokens_ws", "n_tokens_bpe")
      .as[(Long, Long, Long)].collect()
    out.foreach { case (_, ws, bpe) => assert(bpe >= ws) }
    assert(out.find(_._1 == 1L).get._3 >= 9) // 35 chars / 4 ≈ 9
  }

  test("tokenCounts: GPT-2-style pretokenizer regex count on known cases") {
    val d = Seq(
      (1L, "don't stop"),      // don | 't | _stop -> 3
      (2L, "abc 123, x!"),     // abc | _123 | , | _x | ! -> 5
      (3L, ""),                // no matches -> 0
      (4L, "hello"))           // hello -> 1
      .toDF("doc_id", "text")
    val out = TextAnalysis.tokenCounts(d, col("text"))
      .select("doc_id", "n_tokens_re")
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 3L, 2L -> 5L, 3L -> 0L, 4L -> 1L))
  }

  test("pmiCollocations: exact PMI against the hand-computed formula") {
    // corpus "a b a b a b": bigrams (a,b)×3, (b,a)×2 (Nb=5); unigrams
    // a=3, b=3 (Nu=6). pmi(a,b)=ln(3·36/(5·9))=ln(2.4), pmi(b,a)=ln(1.6)
    val d = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(d, col("text"), 2)
      .select("w1", "w2", "n_pair", "pmi")
      .as[(String, String, Long, Double)].collect().toSet
    def t6(x: Double) = math.floor(x * 1e6) / 1e6
    assert(out === Set(
      ("a", "b", 3L, t6(math.log(2.4))),
      ("b", "a", 2L, t6(math.log(1.6)))))
  }

  test("mixtureWeights: sqrt-temperature rebalancing upsamples the tail source") {
    // src1: 9 tokens, src2: 1 token -> shares .9/.1, weights √.9/√.1
    val d = Seq((1L, "w w w w w w w w w", "s1"), (2L, "w", "s2"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.mixtureWeights(d, "source", col("text"))
      .select("source", "n_docs", "n_tokens", "token_share", "mix_weight")
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    def t6(x: Double) = math.floor(x * 1e6) / 1e6
    val z = math.sqrt(0.9) + math.sqrt(0.1)
    assert(out("s1") === ((1L, 9L, t6(0.9), t6(math.sqrt(0.9) / z))))
    assert(out("s2") === ((1L, 1L, t6(0.1), t6(math.sqrt(0.1) / z))))
    // tail source holds 10% of tokens but 25% of the mixture
    assert(out("s2")._4 > 0.24 && out("s2")._4 < 0.26)
  }

  test("mixtureWeights: normalizer is partition-order-proof (1 vs 64 partitions)") {
    // many sources with irrational sqrt-shares — a plain double-sum
    // normalizer would be at the mercy of partial-aggregate merge order;
    // the truncated-long sum must make every output digit identical
    // regardless of partitioning
    val rows = (1 to 97).map(i => (i.toLong, Seq.fill(i % 13 + 1)("w").mkString(" "), s"src${i % 17}"))
    val d = rows.toDF("doc_id", "text", "source")
    def run(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.mixtureWeights(df, "source", col("text"))
        .select("source", "n_docs", "n_tokens", "token_share", "mix_weight")
        .as[(String, Long, Long, Double, Double)].collect().sortBy(_._1)
    val one = run(d.repartition(1))
    val many = run(d.repartition(64))
    assert(one.toSeq === many.toSeq) // bit-identical, not approximately equal
  }

  test("packingMap: exact offsets, bin spans, empty docs excluded") {
    val d = Seq((1L, "a b c"), (2L, ""), (3L, "d e f g"), (4L, "h"))
      .toDF("doc_id", "text")
    // ctx=4, stream: doc1 [0,3), doc3 [3,7), doc4 [7,8)
    val out = TextAnalysis.packingMap(d, "doc_id", col("text"), 4)
      .select("doc_id", "n_tokens", "start_off", "first_bin", "last_bin", "n_bins")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(out === Set(
      (1L, 3L, 0L, 0L, 0L, 1L),
      (3L, 4L, 3L, 0L, 1L, 2L),   // straddles the bin-0/bin-1 cut
      (4L, 1L, 7L, 1L, 1L, 1L)))
  }

  test("bpeLearn: argmax merges with deterministic tiebreak, greedy non-overlap") {
    // corpus: "abab" x2, "ab" x1 -> round 1 pairs: (a,b) score 5 [2*2+1],
    // (b,a) score 2 -> merge (a,b) -> "abab" becomes [ab, ab], "ab" [ab]
    // round 2: only (ab, ab) score 2 remains
    val docs = Seq("abab abab ab").toDF("text")
    val m = TextAnalysis.bpeLearn(docs, col("text"), 3)
      .select("step", "a", "b", "merged", "score")
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(m(0) === ((1L, "a", "b", "ab", 5L)))
    assert(m(1) === ((2L, "ab", "ab", "abab", 2L)))
    assert(m.length === 2)   // round 3 has no pairs left -> loop exhausts
  }

  test("canaryScan: occurrence counts, first position, misses dropped") {
    val docs = Seq(
      (1L, "the canary one sits here canary one twice"),
      (2L, "clean document"),
      (3L, "canary two")).toDF("doc_id", "text")
    val r = TextAnalysis.canaryScan(docs, "doc_id", col("text"),
        Seq("canary one", "canary two"))
      .select("doc_id", "canary", "n_hits", "first_pos")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(r === Set(
      (1L, "canary one", 2L, 5L),
      (3L, "canary two", 1L, 1L)))
  }

  test("bpeLearn: greedy left-to-right on odd runs (aaa -> one merge)") {
    // "aaa": pairs (a,a) x2 but greedy merge yields [aa, a] not [aa, aa]
    val docs = Seq("aaa").toDF("text")
    val m = TextAnalysis.bpeLearn(docs, col("text"), 2)
      .select("step", "a", "b", "score")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(m(0) === ((1L, "a", "a", 2L)))     // count before merging
    assert(m(1) === ((2L, "aa", "a", 1L)))    // [aa, a] -> one (aa,a) pair
  }

  test("topGramDominance: top bigram by count, gram-desc tie-break; short docs keep a row") {
    val docs = Seq(
      // "a b" x2, "b a" x2, "a c" x1 -> count tie, gram-desc picks "b a";
      // chars = len("a b a b a c") = 11
      (1L, "a b a b a c"),
      // all three bigrams distinct, tie at 1 -> lexicographically greatest wins
      (2L, "x y z w"),
      (3L, "solo"),                      // < 2 words: no grams
      (4L, "")).toDF("doc_id", "text")   // empty
    val r = TextAnalysis.topGramDominance(docs, "doc_id", col("text"), 2)
      .select("doc_id", "top_gram", "top_cnt", "top_frac", "dup_frac")
      .as[(Long, Option[String], Long, Double, Double)]
      .collect().map(x => x._1 -> x).toMap
    assert(r(1L)._2 === Some("b a") && r(1L)._3 === 2L)
    // 2 occurrences * 3 chars / 11 total chars
    assert(math.abs(r(1L)._4 - 6.0 / 11) < 1e-6)
    assert(math.abs(r(1L)._5 - 0.8) < 1e-9)  // 4 of 5 occurrences repeat
    assert(r(2L)._2 === Some("z w") && r(2L)._3 === 1L && r(2L)._5 === 0.0)
    assert(r(3L)._2 === None && r(3L)._3 === 0L && r(3L)._4 === 0.0)
    assert(r(4L)._2 === None && r(4L)._4 === 0.0 && r(4L)._5 === 0.0)
  }

  test("word_grams kernel == HOF formulation; gram_dominance kernel == aggregation formulation") {
    val docs = Seq(
      (1L, "a b a b a c"), (2L, "x y z w"), (3L, "solo"), (4L, ""),
      (5L, "  pad  pad  x "), (6L, "t t t t t t t t"),
      (7L, "one two three four five six")).toDF("doc_id", "text")
    for (n <- Seq(2, 3, 5)) {
      val kern = docs.select(col("doc_id"),
        graft.functions.GramFunctions.wordGrams(col("text"), n).as("g"))
        .as[(Long, Seq[String])].collect().toMap
      val hof = docs.select(col("doc_id"),
        TextAnalysis.wordGramsHof(col("text"), n).as("g"))
        .as[(Long, Seq[String])].collect().toMap
      assert(kern === hof, s"n=$n")
    }
    val a = TextAnalysis.topGramDominance(docs, "doc_id", col("text"), 2)
      .orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.topGramDominanceAgg(docs, "doc_id", col("text"), 2)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("topGramDominance plans shuffle-free: no Exchange in the physical plan") {
    val docs = Seq((1L, "a b a")).toDF("doc_id", "text")
    val p = TextAnalysis.topGramDominance(docs, "doc_id", col("text"), 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("driftJsd: identical sources diverge 0, disjoint vocabularies ~ln 2") {
    val docs = Seq(
      ("x", "a b"), ("y", "a b"), ("z", "c d")).toDF("source", "text")
    val r = TextAnalysis.driftJsd(docs, "source", col("text"))
      .select("source_a", "source_b", "jsd")
      .as[(String, String, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(r.size === 3)
    assert(r(("x", "y")) === 0.0)
    // ln 2 = 0.6931471…; with per-word 6dp rounding the 4 disjoint words
    // each contribute round(0.25·ln2, 6) = 0.173287 → 0.693148
    assert(r(("x", "z")) === 0.693148)
    assert(r(("y", "z")) === 0.693148)
  }

  test("dupSpanFraction: only spans shared by >=2 distinct docs count") {
    val docs = Seq(
      (1L, "p q r s t u"),      // 5-grams: "p q r s t", "q r s t u"
      (2L, "p q r s t x"),      // shares "p q r s t" with doc 1
      (3L, "m n o"),            // too short: 0 spans
      (4L, "a a a a a a a a")   // self-repeats only -> 1 distinct doc, no dups
    ).toDF("doc_id", "text")
    val r = TextAnalysis.dupSpanFraction(docs, "doc_id", col("text"), 5, 2)
      .select("doc_id", "n_spans", "dup_spans", "dup_span_frac")
      .as[(Long, Long, Long, Double)].collect().map(x => x._1 -> x).toMap
    assert(r(1L) === ((1L, 2L, 1L, 0.5)))
    assert(r(2L) === ((2L, 2L, 1L, 0.5)))
    assert(r(3L) === ((3L, 0L, 0L, 0.0)))
    assert(r(4L) === ((4L, 4L, 0L, 0.0)))
  }

  test("removeDupSpans strips only cross-doc spans and reconstructs in word order") {
    val docs = Seq(
      (1L, "p q r s t u"),      // "p q r s t" shared with doc 2 -> covers pos 0-4
      (2L, "p q r s t x"),      // same shared span -> both copies stripped
      (3L, "m n o"),            // shorter than k: no grams, survives whole
      (4L, "a a a a a a a a")   // self-repeats only: 1 distinct doc, intact
    ).toDF("doc_id", "text")
    val r = TextAnalysis.removeDupSpans(docs, "doc_id", col("text"), 5)
      .select("doc_id", "n_words", "n_kept", "cleaned_text")
      .as[(Long, Long, Long, String)].collect().map(x => x._1 -> x).toMap
    assert(r(1L) === ((1L, 6L, 1L, "u")))
    assert(r(2L) === ((2L, 6L, 1L, "x")))
    assert(r(3L) === ((3L, 3L, 3L, "m n o")))
    assert(r(4L) === ((4L, 8L, 8L, "a a a a a a a a")))
  }

  test("nbQualityScore separates classes by their vocabulary and is partitioning-invariant") {
    val docs = Seq(
      (1L, "good clean prose here", true),
      (2L, "good clean text again", true),
      (3L, "spam junk noise words", false),
      (4L, "junk spam garbage here", false),
      (5L, "good clean prose text", true) // held-in doc, clearly positive vocab
    ).toDF("doc_id", "text", "pos")
    def run(parts: Int) = TextAnalysis.nbQualityScore(
        docs.repartition(parts), "doc_id", col("text"), col("pos"))
      .select("doc_id", "n_terms", "score", "is_quality")
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    val r1 = run(1)
    assert(r1 === run(7)) // exact DECIMAL sums: bit-identical at any parallelism
    val byId = r1.map(x => x._1 -> x).toMap
    assert(byId(5L)._4, s"positive-vocab doc should classify positive: $r1")
    assert(!byId(3L)._4 && !byId(4L)._4, s"spam docs should classify negative: $r1")
    assert(byId.values.forall(_._2 === 4L)) // 4 words each, all in-vocab
  }
}
