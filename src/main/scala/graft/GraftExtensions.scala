package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{BinaryStride, BpeEncode, CanaryHits, CharGramJaccard, CosineSimilarity, CountMinSketch, KmvDistinct, KmvMins, RepetitionRatio, SimHash16, VecDot, WinnowFingerprints}

/** SparkSessionExtensions entry point: enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  * Injects the engine's native functions into every session built from that
  * config (SQL and `call_function` both resolve them). Sessions not built
  * with the config can call the per-package `ensureRegistered` helpers
  * instead — the operators do so themselves, defensively. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def arity(name: String, children: Seq[Expression], n: Int): Unit =
    if (children.size != n)
      throw new IllegalArgumentException(
        s"$name expects $n argument(s) but got ${children.size}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // the custom as-of join strategy (graft.plans) for config-based
    // sessions; imperative sessions get it via AsofJoin.ensureStrategy
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    // upstream Spark 4.1.2 wrong-results codegen guard (BASELINE.md):
    // element_at(array, runtime-null index) returns the LAST element under
    // whole-stage codegen; the rule rewrites the exposed shape to its
    // null-correct form. Injected at RESOLUTION time so the corrected
    // nullability (upstream's ElementAt.nullable ignores the index's —
    // the root of the codegen divergence) is part of the analyzed schema;
    // the optimizer injection is the backstop for plans assembled from
    // fragments the analyzer pass missed, and the no-config imperative
    // door is ElementAtNullIndexGuard.ensureInjected.
    ext.injectResolutionRule(_ => graft.plans.ElementAtNullIndexGuard)
    ext.injectOptimizerRule(_ => graft.plans.ElementAtNullIndexGuard)
    // MERGE INTO / VERSION+TIMESTAMP AS OF / INSERT / DML / reads of
    // MergeTableSql-registered MergeTable names through the SQL front
    // door (⊕K7 via verbatim SQL)
    ext.injectResolutionRule(_ => graft.plans.MergeTableSqlResolution)
    // lifecycle verbs Spark's grammar lacks (OPTIMIZE / VACUUM /
    // DESCRIBE HISTORY) + parse-time CREATE TABLE ... USING graft
    ext.injectParser((_, delegate) => new graft.plans.GraftSqlParser(delegate))
    ext.injectFunction((
      FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "vec_cosine"),
      (children: Seq[Expression]) => {
        arity("vec_cosine(a, b)", children, 2)
        CosineSimilarity(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        arity("vec_dot(a, b)", children, 2)
        VecDot(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("kmv_distinct"),
      new ExpressionInfo(classOf[KmvDistinct].getName, "kmv_distinct"),
      (children: Seq[Expression]) => {
        if (children.isEmpty || children.size > 2)
          throw new IllegalArgumentException(
            s"kmv_distinct(col[, k]) expects 1 or 2 arguments but got ${children.size}")
        val k = if (children.length > 1)
          children(1).eval(null).asInstanceOf[Number].intValue() else 256
        KmvDistinct(children.head, k).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("kmv_mins"),
      new ExpressionInfo(classOf[KmvMins].getName, "kmv_mins"),
      (children: Seq[Expression]) => {
        if (children.isEmpty || children.size > 2)
          throw new IllegalArgumentException(
            s"kmv_mins(col[, k]) expects 1 or 2 arguments but got ${children.size}")
        val k = if (children.length > 1)
          children(1).eval(null).asInstanceOf[Number].intValue() else 256
        KmvMins(children.head, k).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("cms_sketch"),
      new ExpressionInfo(classOf[CountMinSketch].getName, "cms_sketch"),
      (children: Seq[Expression]) => {
        if (children.isEmpty || children.size > 3)
          throw new IllegalArgumentException(
            s"cms_sketch(col[, depth, width]) expects 1-3 arguments but got ${children.size}")
        val d = if (children.length > 1)
          children(1).eval(null).asInstanceOf[Number].intValue() else 4
        val w = if (children.length > 2)
          children(2).eval(null).asInstanceOf[Number].intValue() else 256
        // same guard as CountMinFunctions.ensureRegistered: fail at
        // registration with a clear message, not at execution with a
        // modulo-by-zero
        require(d >= 1 && w >= 1, s"cms_sketch needs depth/width >= 1, got $d/$w")
        CountMinSketch(children.head, d, w).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("binary_stride"),
      new ExpressionInfo(classOf[BinaryStride].getName, "binary_stride"),
      (children: Seq[Expression]) => {
        arity("binary_stride(payload, factor)", children, 2)
        BinaryStride(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("repetition_ratio"),
      new ExpressionInfo(classOf[RepetitionRatio].getName, "repetition_ratio"),
      (children: Seq[Expression]) => {
        arity("repetition_ratio(text, k)", children, 2)
        val k = children(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"repetition_ratio(text, k): k must be an integer literal, got $other")
        }
        RepetitionRatio(children(0), k)
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash16"),
      new ExpressionInfo(classOf[SimHash16].getName, "simhash16"),
      (children: Seq[Expression]) => {
        arity("simhash16(text)", children, 1)
        SimHash16(children(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fps"),
      (children: Seq[Expression]) => {
        arity("winnow_fps(text, k, w)", children, 3)
        val intLit = (arg: String, e: Expression) => e match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"winnow_fps: $arg must be an integer literal, got $other")
        }
        WinnowFingerprints(children(0),
          intLit("k", children(1)), intLit("w", children(2)))
      }))
    // canary_hits and bpe_encode delegate to the companion's shared
    // builder — the same code path ensureRegistered uses, so the two
    // registration doors cannot silently diverge
    ext.injectFunction((
      FunctionIdentifier("canary_hits"),
      new ExpressionInfo(classOf[CanaryHits].getName, "canary_hits"),
      (children: Seq[Expression]) => CanaryHits.build(children)))
    ext.injectFunction((
      FunctionIdentifier("bpe_encode"),
      new ExpressionInfo(classOf[BpeEncode].getName, "bpe_encode"),
      (children: Seq[Expression]) => BpeEncode.build(children)))
    // SQL table-valued functions over registered MergeTables: CDC and
    // commit history as composable relations (the read-side counterparts
    // of the DESCRIBE HISTORY / VERSION AS OF verbs)
    ext.injectTableFunction((
      FunctionIdentifier("graft_changes"),
      new ExpressionInfo(graft.plans.MergeTableSql.getClass.getName,
        "graft_changes"),
      (children: Seq[Expression]) =>
        graft.plans.MergeTableSql.changesPlan(children)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_history"),
      new ExpressionInfo(graft.plans.MergeTableSql.getClass.getName,
        "graft_history"),
      (children: Seq[Expression]) =>
        graft.plans.MergeTableSql.historyPlan(children)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_rows"),
      new ExpressionInfo(graft.plans.MergeTableSql.getClass.getName,
        "graft_rows"),
      (children: Seq[Expression]) =>
        graft.plans.MergeTableSql.rowsPlan(children)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_stats"),
      new ExpressionInfo(graft.plans.MergeTableSql.getClass.getName,
        "graft_stats"),
      (children: Seq[Expression]) =>
        graft.plans.MergeTableSql.statsPlan(children)))
    // r18 retrieval-tier TVFs: the at-rest inverted index searchable from
    // pure SQL — conjunctive term search and BM25 top-k (RetrievalSql)
    ext.injectTableFunction((
      FunctionIdentifier("graft_search"),
      new ExpressionInfo(graft.plans.RetrievalSql.getClass.getName,
        "graft_search"),
      (children: Seq[Expression]) =>
        graft.plans.RetrievalSql.searchPlan(children)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_bm25"),
      new ExpressionInfo(graft.plans.RetrievalSql.getClass.getName,
        "graft_bm25"),
      (children: Seq[Expression]) =>
        graft.plans.RetrievalSql.bm25Plan(children)))
    ext.injectFunction((
      FunctionIdentifier("entropy_profile"),
      new ExpressionInfo(classOf[graft.functions.EntropyProfile].getName,
        "entropy_profile"),
      (children: Seq[Expression]) => graft.functions.EntropyProfile.build(children)))
    ext.injectFunction((
      FunctionIdentifier("word_grams"),
      new ExpressionInfo(classOf[graft.functions.WordGrams].getName, "word_grams"),
      (children: Seq[Expression]) => graft.functions.WordGrams.build(children)))
    ext.injectFunction((
      FunctionIdentifier("gram_dominance"),
      new ExpressionInfo(classOf[graft.functions.GramDominance].getName, "gram_dominance"),
      (children: Seq[Expression]) => graft.functions.GramDominance.build(children)))
    ext.injectFunction((
      FunctionIdentifier("chargram_jaccard"),
      new ExpressionInfo(classOf[CharGramJaccard].getName, "chargram_jaccard"),
      (children: Seq[Expression]) => {
        arity("chargram_jaccard(a, b, n)", children, 3)
        val nLit = children(2) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"chargram_jaccard: n must be an integer literal, got $other")
        }
        CharGramJaccard(children(0), children(1), nLit)
      }))
  }
}
