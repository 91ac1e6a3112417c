package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The round-11 fuzz lane's best find, now defended (VERDICT r11 task 1):
  * upstream Spark 4.1.2 returns the array's LAST element for
  * `element_at(array, runtime-null-index)` under whole-stage codegen
  * (behaves like idx = -1) where every other path — interpreted,
  * constant-folded, try_element_at, the map variant — returns NULL.
  * [[ElementAtNullIndexGuard]] rewrites the exposed shape to its
  * null-correct form for every front-door session. */
class ElementAtGuardSpec extends SparkSpec {
  import spark.implicits._

  // The EXACT r11 divergent shape (FuzzDump family 45, seeds 12187/12203):
  // a literal array indexed by `pmod(v, n) + 1` where v is a NULLABLE data
  // column — the null flows through the computed index at runtime.
  // Parquet-backed: a LocalRelation source would be folded whole by
  // ConvertToLocalRelation (interpreted eval — the NON-divergent mode) and
  // the probe would never reach whole-stage codegen.
  private lazy val probeDir: String = {
    val d = java.nio.file.Files.createTempDirectory("elemat_guard").toString
    Seq((1L, Some(1)), (2L, None), (3L, Some(5)))
      .toDF("id", "v").write.mode("overwrite").parquet(d)
    d
  }

  private val marks = Seq("m1", "m2", "m3", "m4", "m5", "m6")

  // v=1 → m2, v=null → NULL per spec (the bug returns LAST = m6), v=5 → m6
  private def probe() = spark.read.parquet(probeDir)
    .select(col("id"),
      element_at(array(marks.map(lit): _*),
        pmod(col("v"), lit(6)) + 1).as("w"))

  private def collectW(): Map[Long, Option[String]] =
    probe().collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap

  test("guarded front door: runtime-null array index returns NULL under codegen") {
    assert(spark.conf.get("spark.sql.codegen.wholeStage") === "true",
      "probe must run under whole-stage codegen — that is the divergent mode")
    assert(collectW() === Map(1L -> Some("m2"), 2L -> None, 3L -> Some("m6")))
  }

  test("the upstream divergence is real on this Spark: the raw expression diverges codegen-vs-interpreted") {
    // control at the EXPRESSION level, below any session rule: the same
    // unguarded ElementAt evaluated through the codegen projection vs
    // interpreted eval. If a future Spark upgrade fixes the bug upstream,
    // the codegen assertion flips to NULL and says the guard is obsolete.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{Add, BoundReference, CreateArray, ElementAt, Literal, Pmod, UnsafeProjection}
    import org.apache.spark.sql.types.IntegerType
    import org.apache.spark.unsafe.types.UTF8String

    val arr = CreateArray(marks.map(Literal(_)))
    val idx = Add(
      Pmod(BoundReference(0, IntegerType, nullable = true), Literal(6)),
      Literal(1))
    val ea = ElementAt(arr, idx)
    assert(!ea.nullable,
      "the ROOT CAUSE: upstream ElementAt.nullable ignores the index's " +
        "nullability for arrays — if this is now true upstream, the guard " +
        "can be retired")
    val nullRow = InternalRow(null)
    // interpreted eval: NULL, per the docs and every other path
    assert(ea.eval(nullRow) === null)
    // codegen (UnsafeProjection.create is the generated path): trusts the
    // wrong nullable=false, skips null propagation, reads the stale value
    // slot — the LAST element
    val proj = UnsafeProjection.create(Seq(ea))
    val out = proj(nullRow)
    assert(!out.isNullAt(0) && out.getUTF8String(0) == UTF8String.fromString("m6"),
      "upstream codegen no longer returns the LAST element for a " +
        "runtime-null index — the upstream bug is fixed; " +
        "ElementAtNullIndexGuard can be retired")
    // non-null sanity on the same projection: both paths agree
    val row1 = InternalRow(1)
    assert(ea.eval(row1) == UTF8String.fromString("m2"))
    assert(proj(row1).getUTF8String(0) == UTF8String.fromString("m2"))
  }

  test("analysis-time injection corrects the analyzed schema's nullability") {
    // the guard runs as a RESOLUTION rule in extension-built sessions, so
    // the analyzed schema reports the truth (the slot CAN be null) and row
    // encoders/writers see it — an optimizer-only rewrite could not do this
    val f = probe().schema("w")
    assert(f.nullable, "guarded element_at slot must be nullable in the " +
      "ANALYZED schema (upstream wrongly claims non-nullable)")
  }

  test("rewrite fires only on nullable-index ARRAY element_at") {
    def optimized(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.optimizedPlan.toString

    // nullable computed index over an array: guarded
    assert(optimized(probe()).contains("knownnotnull"),
      "nullable-index array element_at must be rewritten")

    // every negative shape below stays parquet-backed too, so "no guard in
    // the plan" is a real statement about an executable plan, not about a
    // fully-folded LocalRelation
    val base = spark.read.parquet(probeDir)
    val litArr = array(marks.map(lit): _*)

    // literal index: no runtime-null possible, untouched
    val lit2 = base.select(element_at(litArr, lit(2)).as("w"))
    assert(!optimized(lit2).contains("knownnotnull"))
    assert(lit2.head().getString(0) === "m2")

    // map element_at with a nullable key: upstream-correct, untouched
    val m = base.select(col("id"),
      element_at(
        map_from_arrays(array(lit("a")), array(lit(10))),
        when(col("id") === 2L, lit(null: String)).otherwise(lit("a"))).as("w"))
    assert(!optimized(m).contains("knownnotnull"))
    assert(m.orderBy("id").collect().map(r =>
        if (r.isNullAt(1)) None else Some(r.getInt(1))).toSeq ===
      Seq(Some(10), None, Some(10)))

    // non-nullable computed index (CaseWhen with non-null literal arms):
    // nothing to guard
    val nn = base.select(element_at(litArr,
      when(col("id") > 1L, lit(2)).otherwise(lit(1))).as("w"))
    assert(!optimized(nn).contains("knownnotnull"))
    assert(nn.orderBy("w").head().getString(0) === "m1")
  }
}
