package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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
    * Determinism (oracle-hash-proof): per-edge contributions are rounded
    * to 12 decimals and summed as DECIMAL(38,12) — exact and
    * order-independent — then each new rank is one IEEE double expression
    * over that exact sum. Every float op has an identical counterpart in
    * the oracle SQL; nothing depends on partition order. Damping enters as
    * the literal `1.0 - damping` double (never a pre-simplified constant,
    * so both engines compute the identical bits).
    *
    * Returns (id, deg, p) — rank p sums to ~1 over vertices. */
  def pageRank(edges: DataFrame, damping: Double = 0.85,
               iters: Int = 3): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      // every iteration joins this; materialize once instead of re-running
      // the upstream edge derivation per iteration
      .localCheckpoint()
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
    val n1 = deg.agg(count(lit(1)).cast("double").as("__n"))
    val tele = (lit(1.0) - lit(damping)) / col("__n")
    var p = deg.select(col("src").as("id"), col("deg"))
      .crossJoin(n1)
      .withColumn("p", lit(1.0) / col("__n"))
    for (_ <- 1 to iters) {
      val contrib = und
        .join(p.select(col("id").as("src"),
          round(col("p") / col("deg").cast("double"), 12)
            .cast(DecimalType(38, 12)).as("__c")), Seq("src"))
        .groupBy(col("dst")).agg(sum(col("__c")).as("__s"))
      p = p.join(contrib.select(col("dst").as("id"), col("__s")), Seq("id"), "left")
        .withColumn("p",
          round(tele + lit(damping) *
            coalesce(col("__s"), lit(0).cast(DecimalType(38, 12))).cast("double"), 12))
        .drop("__s")
        // p feeds the next iteration TWICE (directly + inside contrib):
        // without truncation each iteration doubles the evaluated subtree
        // (2^iters blowup). One eager checkpoint per iteration of the tiny
        // (|V| rows) rank table — the connectedComponents discipline.
        .localCheckpoint()
    }
    p.select(col("id"), col("deg"), col("p"))
  }
}
