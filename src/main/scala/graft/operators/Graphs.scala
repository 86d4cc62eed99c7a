package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge lists — the rank-propagation
  * companion to [[Dedup]]'s connected components (label propagation). First
  * use: PageRank over a document kNN graph, the diversity/centrality signal
  * a training-data pipeline derives from its own similarity structure
  * (rank-weighted sampling, coreset picks).
  */
object Graphs {

  /** The fixed-point scale of [[pageRank]] ranks: ranks are integers on a
    * 10⁻¹² grid of the unit mass. */
  val Scale: Long = 1000000000000L

  /** Integer-arithmetic PageRank (Page et al. 1999) over a directed edge
    * list — EVERY operation is a BIGINT `div`/`+`/`*`, no floats anywhere,
    * so the trajectory is bit-exact on any engine (the stronger cousin of
    * the micro-grid discipline: no grid-boundary hazard at all).
    *
    * Semantics (the oracle replays them verbatim):
    *  - nodes = distinct(src ∪ dst); `N` = their count;
    *  - `r₀ = Scale div N`;
    *  - each round: `S(i) = Σ_{j→i} (r(j) div d(j))` over DISTINCT edges
    *    (`d` = out-degree), then
    *    `r'(i) = (dampingComplementPct·Scale) div (100·N) + (dampingPct·S(i)) div 100`;
    *  - dangling mass vanishes (standard teleport-less-redistribution
    *    variant) — total mass is NOT conserved under `div` floors anyway;
    *    ranks are a deterministic ordering signal, not probabilities.
    *
    * Scale shape: each round is two hash shuffles — contributions join
    * ranks⋈edges on src, then aggregate on dst — both carrying |E| compact
    * rows; out-degrees are computed once. Rounds materialize through the
    * [[Dedup.Checkpointer]] (superseded rounds released) exactly like the
    * connected-components and BPE loops; O(iterations) rounds, each a
    * fixed two-shuffle cost.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int, dampingPct: Int = 85,
               checkpointer: Dedup.Checkpointer = Dedup.Checkpointer.Local)
      : DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    require(dampingPct >= 0 && dampingPct <= 100,
      "dampingPct must be in [0, 100]")
    // cut: the edge list feeds the degree table and EVERY iteration's
    // contribution join — uncut, an expensive upstream (a kNN scoring
    // pass, say) re-executes once per round
    val e = checkpointer.cut(
      edges.select(col(srcCol).as("__s"), col(dstCol).as("__d")).distinct())
    val nodes = e.select(col("__s").as("node"))
      .union(e.select(col("__d").as("node"))).distinct()
    val deg = e.groupBy("__s").agg(count(lit(1)).as("__deg"))
    val n = nodes.count()
    require(n > 0, "pageRank needs at least one edge")
    val teleport = (100L - dampingPct) * Scale / (100L * n)
    var ranks = checkpointer.cut(
      nodes.withColumn("rank_fx", lit(Scale / n)))
    try {
      var it = 0
      while (it < iterations) {
        val contribs = e
          .join(ranks.select(col("node").as("__s"), col("rank_fx")), Seq("__s"))
          .join(deg, Seq("__s"))
          .select(col("__d").as("node"),
            expr("rank_fx div __deg").as("__c"))
          .groupBy("node").agg(sum("__c").as("__in"))
        val next = checkpointer.cut(
          nodes.join(contribs, Seq("node"), "left")
            .select(col("node"),
              (lit(teleport) +
                expr(s"$dampingPct * coalesce(__in, 0L) div 100"))
                .as("rank_fx")))
        checkpointer.release(ranks)
        ranks = next
        it += 1
      }
      // the result depends only on the final (eager) ranks cut — release
      // the edge cut here so Reliable stores don't accrete one edges
      // subdir per pageRank call (connectedComponents' discipline)
      checkpointer.release(e)
      // the final cut is intentionally NOT released — the caller consumes
      // it (same contract as mergeComponents' last round)
      ranks
    } catch {
      case t: Throwable =>
        // failure path (lost executor, cancel): drop both live cuts, same
        // as connectedComponents — don't leave them on the store
        checkpointer.release(ranks)
        checkpointer.release(e)
        throw t
    }
  }

  /** Per-node triangle participation counts over the UNDIRECTED version of
    * an edge list: `(node, n_triangles)` for nodes in ≥ 1 triangle —
    * clustering structure of the similarity graph (a node's triangles =
    * how much its neighborhood agrees with itself).
    *
    * Degree-ordered orientation (the standard distributed algorithm —
    * Suri & Vassilvitskii 2011): each undirected edge points from the
    * lower (degree, id) endpoint to the higher, which caps every
    * out-degree at O(√E), so the wedge join (out ⋈ out on the apex) is
    * Σ outdeg² — bounded — instead of Σ deg² (hub-quadratic). Triangles =
    * wedges (v, w) closed by an oriented v→w edge: ONE self-join + one
    * closing equi-join, all on compact keys; every triangle is found
    * exactly once (its orientation-minimal apex).
    */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = und.select(col("a").as("n"))
      .unionAll(und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // orient from lower (degree, id) to higher
    val oriented = und
      .join(deg.select(col("n").as("a"), col("d").as("__da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("__db")), Seq("b"))
      .select(
        when(struct(col("__da"), col("a")) < struct(col("__db"), col("b")),
          struct(col("a").as("u"), col("b").as("v"),
            col("__db").as("dv")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"),
            col("__da").as("dv"))).as("__e"))
      .select(col("__e.u").as("u"), col("__e.v").as("v"),
        col("__e.dv").as("dv"))
    val wedges = oriented.select(col("u"), col("v"), col("dv"))
      .join(oriented.select(col("u"), col("v").as("w"), col("dv").as("dw")),
        Seq("u"))
      .filter(struct(col("dv"), col("v")) < struct(col("dw"), col("w")))
    val closing = oriented.select(col("u").as("v"), col("v").as("w"))
    val tris = wedges.join(closing, Seq("v", "w")).select("u", "v", "w")
    tris.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }
}
