package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed graph analytics over plain edge lists — the iterative-join
  * family ([[graft.dedup.Dedup.connectedComponents]] is the other member).
  * Nothing here ever collects the graph: every iteration is a join + agg
  * keyed on vertex id, so a 100 TB edge list partitions like any fact table.
  */
object Graphs {

  /** Fixed-iteration PageRank over an undirected edge list (`src`, `dst`) —
    * the canonical "which node matters" signal; in a dedup pipeline, run it
    * over the near-dup candidate graph to pick each cluster's most-connected
    * document as the canonical representative (a centrality-based
    * alternative to min-id).
    *
    * Each iteration is one join (edges ⋈ current ranks, keyed on the
    * vertex) and one aggregation (contributions summed per destination) —
    * the standard scale shape: O(iters) shuffles on the vertex key, no
    * driver-side state, skew bounded by AQE like any hot-key agg. `iters`
    * is fixed (unrolled lineage, no convergence probe): rank queries want
    * a deterministic cost, and 3-5 iterations separate hubs from leaves
    * long before convergence.
    *
    * Determinism (oracle-hash-proof) AND throughput share one trick (the
    * q101 discipline): per-edge contributions are rounded to 1e12-scaled
    * LONG integers and summed as longs — exact, order-independent, and on
    * the codegen fast path (a DECIMAL(38,12) sum runs on BigDecimal per
    * edge). Overflow-safe by construction: ranks sum to ~1 over the
    * graph, so all contributions sum to ~1e12 « 2^63. Each new rank is
    * one IEEE double expression over the exact integer sum, with an
    * identical counterpart in the oracle SQL; nothing depends on
    * partition order. Damping enters as the literal `1.0 - damping`
    * double (never a pre-simplified constant, so both engines compute the
    * identical bits).
    *
    * Returns (id, deg, p) — rank p sums to ~1 over vertices. */
  def pageRank(edges: DataFrame, damping: Double = 0.85,
               iters: Int = 3): DataFrame = {
    // Every iteration joins the edge table on `src`: partition AND sort it
    // by that key ONCE, persist, and every iteration's sort-merge join
    // reuses the layout — no exchange, no re-sort of the big side, ever
    // (re-shuffling the edges per iteration was 3x the whole algorithm at
    // the 16x scale probe). The rank side is |V| rows — shuffling/
    // broadcasting IT per iteration is the cheap direction. This is the
    // "reuse a partitioning across stages" rule applied to iteration: on a
    // cluster this persist is the in-memory twin of writing the edge list
    // bucketed by src.
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(col("src"))
      .sortWithinPartitions("src")
      .persist()
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
    val n1 = deg.agg(count(lit(1)).cast("double").as("__n"))
    val tele = (lit(1.0) - lit(damping)) / col("__n")
    var p = deg.select(col("src").as("id"), col("deg"))
      .crossJoin(n1)
      .withColumn("p", lit(1.0) / col("__n"))
    for (_ <- 1 to iters) {
      val contrib = und
        .join(p.select(col("id").as("src"),
          round(col("p") / col("deg").cast("double") * lit(1e12), 0)
            .cast("long").as("__c")), Seq("src"))
        .groupBy(col("dst")).agg(sum(col("__c")).as("__s"))
      p = p.join(contrib.select(col("dst").as("id"), col("__s")), Seq("id"), "left")
        .withColumn("p",
          round(tele + lit(damping) *
            (coalesce(col("__s"), lit(0L)).cast("double") / lit(1e12)), 12))
        .drop("__s")
        // p feeds the next iteration TWICE (directly + inside contrib):
        // without truncation each iteration doubles the evaluated subtree
        // (2^iters blowup). One eager checkpoint per iteration of the tiny
        // (|V| rows) rank table — the connectedComponents discipline.
        .localCheckpoint()
    }
    // the final p is checkpointed (no lineage into und): safe to release
    und.unpersist(false)
    p.select(col("id"), col("deg"), col("p"))
  }
}
