package graft.util

import org.apache.spark.sql.SparkSession

/** Self-measured host load factor shared by Bench and ScaleCheck: best-of-3
  * of a fixed codegen'd 32-thread range-sum (pure compute, no I/O) against
  * a quiet-host reference time pinned for this hardware, clamped to
  * [1.0, 2.0]. A loaded shared host slows every measurement; recording the
  * factor next to each number lets any consumer re-normalize instead of
  * chasing interference ghosts. The reference is pinned for local[32]; at
  * any other CPU count the range-sum measures thread count, not load, so
  * the factor falls back to 1.0. SPARK_GRAFT_HOST_LOAD overrides for
  * controlled experiments (same clamp — no path may exceed the
  * calibration bound, else an inflated factor disables perf guardrails).
  *
  * KNOWN LIMITATION of the ≤2.0 clamp (r16 post-mortem, VERDICT r16 task
  * 5): the clamp is deliberate — an unbounded factor would let a
  * pathological calibration window disable every guardrail — but it means
  * a host loaded PAST 2× (the driver's r16 run calibrated 1.63 at start
  * under co-tenant pressure that later measurements put well above the
  * clamp) under-scales the floors and the 4× ratio bar, so genuine
  * co-tenant inflation surfaces as warnings on unchanged plans. The r17
  * mitigations live in Bench: memoized fixture builds moved to the
  * untimed warmup (cold-start half of the r16 artifact) and an
  * end-of-suite retry of flagged queries with both readings recorded
  * (burst half). Compare artifacts by their recorded host_load brackets;
  * a warning-laden artifact at high load on an unchanged tree is host
  * noise until a quiet re-run confirms it (BENCH_r16: 372.6 s with 11
  * warnings on the driver host; 120.8 s, zero warnings, same tree,
  * quiet). */
object HostLoad {
  val QuietRef = 0.24 // quiet-host best-of-3, this hardware, local[32]

  def measure(spark: SparkSession, cpus: String = "32"): Double =
    sys.env.get("SPARK_GRAFT_HOST_LOAD")
      .map(v => math.min(2.0, math.max(1.0, v.toDouble)))
      .getOrElse {
        if (cpus != "32") 1.0
        else {
          val calMin = (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            spark.range(4000000000L).selectExpr("sum(id)").collect()
            (System.nanoTime() - t0) / 1e9
          }.min
          System.err.println(
            f"[bench] calibration range-sum: $calMin%.3fs (ref $QuietRef%.2fs)")
          math.min(2.0, math.max(1.0, calMin / QuietRef))
        }
      }
}
