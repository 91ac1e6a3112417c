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
  * calibration bound, else an inflated factor disables perf guardrails). */
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
