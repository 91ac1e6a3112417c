package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ElementAt, If, IsNull, KnownNotNull, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.ArrayType

/** Defends the SQL/DataFrame front door against a wrong-results
  * whole-stage-codegen bug in upstream Spark 4.1.2 (found and
  * characterized by this repo's round-11 cross-engine fuzz lane, see
  * BASELINE.md): `element_at(array, idx)` with a RUNTIME-null index
  * returns the array's LAST element under codegen (it behaves exactly
  * like idx = -1), where the interpreted path, the constant-folded path,
  * `try_element_at`, the documentation, and the MAP variant all return
  * NULL.
  *
  * The engine's own 28 `element_at` call sites are audited unexposed
  * (every index a literal, a `sequence()` ordinal, or provably
  * non-null), but a USER authoring queries through the front door has no
  * such audit — an engine that ships a SQL surface should ship the
  * guard, on by default.
  *
  * The rewrite targets exactly the divergent shape — an ARRAY
  * `element_at` whose index is nullable — and restores the documented
  * null-intolerant semantics without touching anything else:
  *
  * {{{ element_at(arr, idx)
  *     ==> if (isnull(idx)) null else element_at(arr, knownnotnull(idx)) }}}
  *
  * - Non-null runtime index: identical behavior, including the ANSI
  *   `failOnError` out-of-bounds error (the inner ElementAt keeps its
  *   original flags; `KnownNotNull` only narrows nullability, which also
  *   makes the rule idempotent — the rewritten node no longer matches).
  * - Null runtime index: NULL, matching every non-codegen path.
  * - Non-nullable or literal index: untouched (no divergence to guard).
  * - MAP `element_at`: untouched (correct under codegen upstream).
  * - Non-deterministic index: skipped — the guard would evaluate the
  *   index twice; upstream's divergence only applies if such an index is
  *   ALSO nullable, a shape no engine call site and no sane query has.
  *
  * ROOT CAUSE note: upstream `ElementAt.nullable` ignores the INDEX's
  * nullability for arrays (under ANSI it assumes a bad index throws — but
  * a NULL index doesn't throw, it returns NULL), so the analyzed schema
  * says non-nullable and whole-stage codegen trusts that and skips null
  * propagation, reading the stale value slot (= the last element's
  * ordinal). That is why this rule is injected at RESOLUTION time by
  * [[graft.GraftExtensions]]: rewriting during analysis makes the
  * corrected (nullable) type part of the analyzed schema, so row
  * encoders, writers, and downstream plans all see the truth.
  *
  * [[ensureInjected]] is the weaker door for sessions built WITHOUT the
  * extension config (there is no public seam to add analyzer rules to a
  * live session): optimizer-time rewriting corrects the VALUES (NULL, not
  * the last element) but cannot retro-correct the analyzed schema's
  * nullability — a result row that is actually null in such a slot then
  * fails LOUDLY at decode (EXPRESSION_DECODING_FAILED) instead of
  * silently carrying the wrong element. Loud beats silent; config-built
  * sessions get the full fix. The engine's own entry points
  * (Verify/Bench/tests) build with the extension.
  */
object ElementAtNullIndexGuard extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ea @ ElementAt(arr, idx, _, _)
          if arr.resolved && idx.resolved &&
            arr.dataType.isInstanceOf[ArrayType] &&
            idx.nullable && idx.deterministic =>
        If(IsNull(idx), Literal.create(null, ea.dataType),
          ea.copy(right = KnownNotNull(idx)))
    }

  /** Idempotently add the guard to a session built without
    * `spark.sql.extensions=graft.GraftExtensions`. */
  def ensureInjected(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
}
