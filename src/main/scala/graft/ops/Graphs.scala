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
        .transform(graft.util.Cleanup.checkpoint(_))
    }
    // the final p is checkpointed (no lineage into und): safe to release
    und.unpersist(false)
    p.select(col("id"), col("deg"), col("p"))
  }

  /** Per-vertex triangle counts + local clustering coefficient over an
    * undirected edge list (`src`, `dst`) — the density signal that tells a
    * dedup/community pipeline whether a near-dup neighborhood is a clique
    * (one template, safe to collapse) or a hub (a boilerplate string
    * bridging unrelated docs, do NOT collapse).
    *
    * Algorithm: degree-ordered edge orientation (Suri & Vassilvitskii,
    * "Counting Triangles and the Curse of the Last Reducer", WWW'11).
    * Each undirected edge is oriented from its lower (degree, id) endpoint
    * to its higher one; every triangle then has exactly one vertex with
    * two out-edges, so wedges (b1, b2 out of the same a) joined against
    * the oriented edge set count each triangle ONCE. The orientation is
    * the scale story: out-degree is bounded by O(sqrt(m)) regardless of
    * how skewed the raw degree distribution is, so the wedge fan-out —
    * the quadratic term a naive adjacency self-join puts on the hottest
    * vertex — is charged to low-degree endpoints instead. Three shuffles
    * total (degree agg, wedge self-join on the wedge center, closure
    * equi-join on the (b1,b2) pair); nothing driver-side.
    *
    * Determinism: triangle counts are exact integers; `lcc` is one IEEE
    * double division truncated to 6 decimals (floor, not round — the
    * cross-engine tie discipline).
    *
    * Returns (id, deg, triangles, lcc) with every vertex present,
    * lcc = 2*T / (deg*(deg-1)) for deg >= 2 else 0.0. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val e0 = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val deg = e0.select(col("u").as("id"))
      .union(e0.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // orient each edge lower (deg, id) -> higher (deg, id); the deg join is
    // a plain key join (broadcast when |V| is small, shuffle when it isn't
    // — AQE's call, both correct at scale)
    val withDeg = e0
      .join(deg.select(col("id").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), Seq("v"))
    val lt = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val ori = withDeg.select(
      when(lt, col("u")).otherwise(col("v")).as("a"),
      when(lt, col("v")).otherwise(col("u")).as("b"),
      when(lt, col("dv")).otherwise(col("du")).as("db"))
    // wedges: two out-edges of the same center a, ordered by the endpoint
    // rank so each unordered {b1, b2} appears once; closure: the third edge
    // (b1 -> b2) is necessarily oriented that way because rank(b1) < rank(b2)
    val wedges = ori.as("e1")
      .join(ori.select(col("a"), col("b").as("b2"), col("db").as("db2")).as("e2"),
        col("e1.a") === col("e2.a") &&
          (col("e1.db") < col("db2") ||
            (col("e1.db") === col("db2") && col("e1.b") < col("b2"))))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("b2").as("z"))
    val tri = wedges.join(
      ori.select(col("a").as("y"), col("b").as("z")), Seq("y", "z"))
    val perVertex = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
    deg.join(perVertex, Seq("id"), "left")
      .select(col("id"), col("deg"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("deg") >= 2,
          floor(coalesce(col("triangles"), lit(0L)).cast("double") * 2.0 /
            (col("deg") * (col("deg") - 1)).cast("double") * lit(1e6)) / lit(1e6))
          .otherwise(lit(0.0)).as("lcc"))
  }
}
