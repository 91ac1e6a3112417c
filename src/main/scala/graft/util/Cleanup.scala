package graft.util

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.broadcast.Broadcast

/** Deterministic release of per-query resources that outlive a lazy plan:
  * driver-built broadcasts (e.g. the Bloom filter in
  * [[graft.dedup.Dedup.incrementalDedup]]) and scratch directories written
  * by layout/fixture queries.
  *
  * Why a registry and not `bc.destroy()` at the call site: the operators
  * return LAZY DataFrames, so at construction time nothing has executed and
  * destroying the broadcast would break the plan. The harness (Verify,
  * Bench) calls [[drain]] after each query's terminal action, when the
  * resources are provably no longer referenced by a running job.
  *
  * Library users in a long-lived session: call [[drain]] after each
  * query's terminal action — it is idempotent and releases broadcasts,
  * scratch dirs, AND the checkpointed RDD blocks graft's own operators
  * registered (the [[checkpoint]] sites in dedup/graph/IVF operators).
  * drain releases ONLY graft-registered resources: the caller's own
  * `df.cache()`/`persist()`/`localCheckpoint()` survive it untouched.
  * Without drain you fall back to Spark's ContextCleaner
  * (`spark.cleaner.referenceTracking`, on by default): broadcasts and RDD
  * blocks are weak-referenced and freed when the driver GC collects the
  * plan objects — correct, but GC-TIMED. Under memory pressure the
  * storage pool can grow by many queries' blocks before a full GC happens
  * to run (a 124-query loop in one 8 GiB JVM measurably degraded late
  * queries this way); drain makes the release deterministic instead. Do
  * NOT disable referenceTracking: it is the backstop for whatever a
  * caller forgets. */
object Cleanup {
  private val broadcasts = new ConcurrentLinkedQueue[Broadcast[_]]()
  private val tempDirs = new ConcurrentLinkedQueue[Path]()
  private val hooks = new ConcurrentLinkedQueue[() => Unit]()
  private val rddIds =
    new ConcurrentLinkedQueue[(org.apache.spark.SparkContext, Int)]()

  /** Register an arbitrary release action (e.g. DROP TABLE for a
    * catalog-backed query) to run at the next [[drain]]. */
  def registerHook(f: () => Unit): Unit = { hooks.add(f); () }

  /** Register a broadcast to be destroyed at the next [[drain]]. */
  def registerBroadcast[T](bc: Broadcast[T]): Broadcast[T] = {
    broadcasts.add(bc); bc
  }

  /** Register a scratch directory to be recursively deleted at the next
    * [[drain]]. */
  def registerTempDir(p: Path): Path = { tempDirs.add(p); p }

  /** `ds.localCheckpoint()` + registration: every graft operator that
    * truncates lineage checkpoints THROUGH this helper, which records the
    * RDD ids the checkpoint just persisted so [[drain]] can release
    * exactly those blocks — and nothing the caller persisted themselves.
    * (localCheckpoint is eager, so the new ids are visible immediately;
    * the before/after diff attributes them. A concurrent user persist in
    * the same instant could be co-claimed — graft's own call sites are
    * driver-sequential, and the ContextCleaner backstops any miss.) */
  def checkpoint[T](ds: org.apache.spark.sql.Dataset[T]): org.apache.spark.sql.Dataset[T] = {
    val sc = ds.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = ds.localCheckpoint()
    (sc.getPersistentRDDs.keySet -- before).foreach(id => rddIds.add((sc, id)))
    out
  }

  /** Register a scratch directory that must SURVIVE drains (it is shared
    * across queries, e.g. a memoized pre-built table) and be deleted only
    * at JVM exit. */
  def registerExitDir(p: Path): Path = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(p)))
    p
  }

  /** Destroy all registered broadcasts and delete all registered temp dirs.
    * Call only after the actions consuming them have completed. */
  def drain(): Unit = {
    var h = hooks.poll()
    while (h != null) {
      try h() catch { case _: Exception => () }
      h = hooks.poll()
    }
    var bc = broadcasts.poll()
    while (bc != null) {
      try bc.destroy() catch { case _: Exception => () }
      bc = broadcasts.poll()
    }
    var dir = tempDirs.poll()
    while (dir != null) {
      deleteRecursively(dir)
      dir = tempDirs.poll()
    }
    // Release the checkpointed RDD blocks graft's operators registered via
    // [[checkpoint]]. The operators localCheckpoint iterative/multi-
    // consumer intermediates (connected components, PageRank, LSH
    // signatures, IVF probes); those blocks live in the storage pool and
    // ContextCleaner only frees them on GC of the RDD reference, which a
    // long-lived harness loop (124 queries x best-of-2 in one JVM) may
    // never trigger under load. Left in place they accumulate, and
    // unified-memory eviction + GC churn poisons later queries. Scoped to
    // REGISTERED ids only: a caller's own cache()/persist()/
    // localCheckpoint survives drain (releasing a user localCheckpoint
    // would make their DataFrame unrecoverable — lineage is gone).
    var e = rddIds.poll()
    while (e != null) {
      val (sc, id) = e
      if (!sc.isStopped)
        sc.getPersistentRDDs.get(id).foreach { r =>
          try r.unpersist(blocking = false) catch { case _: Exception => () }
        }
      e = rddIds.poll()
    }
  }

  /** Storage-pool footprint (MiB) of all persisted RDD blocks — a harness
    * can log this after [[drain]] to prove the pool stays flat across a
    * many-query run. */
  def storageMb(): Double =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.getRDDStorageInfo.map(_.memSize).sum / (1024.0 * 1024.0))
      .getOrElse(0.0)

  private def deleteRecursively(p: Path): Unit =
    try {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.forEach(deleteRecursively(_)) finally s.close()
      }
      Files.deleteIfExists(p)
    } catch { case _: Exception => () }
}
