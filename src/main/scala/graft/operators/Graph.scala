package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality over duplicate/similarity graphs. Connected
  * components ([[Dedup.connectedComponents]]) answer "which docs belong
  * together"; PageRank (Page, Brin, Motwani, Winograd 1999) answers
  * "which member REPRESENTS the family" — keep-min-id keeps an
  * arbitrary doc, centrality keeps the one most linked within its
  * cluster (the hub every near-copy derives from), which is the
  * defensible canonical-selection rule when dedup families mix
  * upstream/downstream copies.
  *
  * Determinism (the portability contract every iterative operator here
  * honors): ranks are INTEGER micro-units (1.0 = 1,000,000), each
  * iteration is floor divisions and integer sums only — no float
  * accumulates across rounds, so retries, re-runs and the DuckDB oracle
  * reproduce every rank bit-for-bit. The usual double-precision
  * PageRank drifts by summation order; this one cannot.
  *
  * Scale shape: identical to the CC machinery — (src)-keyed joins with
  * the bounded (src, outdeg) frame, (dst)-keyed inflow aggregation
  * (map-side combined), one localCheckpoint per round through
  * [[Checkpoints.ckpt]] (reliable-checkpoint flag honored) so the plan
  * never grows with iterations. maxIter is fixed, not convergence-
  * tested: no driver round trips beyond the checkpoint actions.
  */
object Graph {

  /** Integer fixed-point PageRank over an undirected pair set
    * (id_a, id_b): ranks in micro-units with damping 0.85 as the exact
    * rational 85/100 — rank' = 150000 + (85 * inflow) DIV 100 where
    * inflow = Σ_{u→v} rank_u DIV outdeg_u. Every node of the
    * symmetrized edge set has outdeg >= 1, so there are no dangling
    * nodes. Output: (id, rank) with Σ rank <= n · 1e6 (floor divisions
    * shed sub-micro mass — deterministically, both engines). */
  def pageRank(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    require(maxIter >= 1, "pageRank: maxIter >= 1")
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .transform(Checkpoints.ckpt) // consumed every round + outdeg + nodes
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("__od"))
      .transform(Checkpoints.ckpt)
    val nodes = edges.select(col("src").as("id")).distinct()
      .transform(Checkpoints.ckpt)
    var rank = nodes.withColumn("rank", lit(1000000L))
    for (_ <- 1 to maxIter) {
      val contrib = rank.join(outdeg, rank("id") === outdeg("src"))
        .select(rank("id").as("__u"), expr("rank DIV __od").as("__c"))
      val inflow = edges.join(contrib, col("src") === col("__u"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("__c")).as("__in"))
      // No zero-pad join (r14): on the SYMMETRIZED edge set the dst set
      // equals the src set equals the node set — every node has at least
      // one in-edge, so `inflow` already covers every node and the former
      // nodes-left-join + coalesce(__in, 0) was an identity pad costing
      // one exchange per round. Values are bit-identical.
      rank = inflow
        .select(col("id"), (lit(150000L) +
          expr("(85 * __in) DIV 100")).as("rank"))
        // LAZY (r14): cuts the growing plan each round without a per-round
        // materialization job — each round's rank has ONE sequential
        // consumer (the next round's contrib join), so all `maxIter`
        // rounds fold into the final action's DAG: maxIter fewer driver
        // barriers. The shared edges/outdeg/nodes frames above stay EAGER
        // (multi-stage fan-out — see ckptLazy's scaladoc).
        .transform(Checkpoints.ckptLazy)
    }
    rank
  }

  /** Integer fixed-point HITS (Kleinberg 1999) over a DIRECTED pair set
    * (id_a -> id_b): hubs point at authorities; on a dedup graph
    * oriented min-id -> max-id this separates "source" members (high
    * hub) from "derived" members (high authority), the directional
    * complement to [[pageRank]]'s undirected centrality.
    *
    * Same determinism contract as pageRank: scores are micro-unit
    * BIGINTs, and the per-half-step normalization is an integer rescale
    * to max = 1e6 (`s * 1e6 DIV max(s)`) instead of the usual float
    * L2 norm — without normalization iterates grow like (max degree)^2
    * per round and overflow; with the integer max-rescale every
    * iterate is exactly replayable (the DuckDB oracle unrolls the
    * rounds verbatim). Fixed `maxIter`, no convergence action.
    *
    * Scale shape: two keyed joins + two aggregations per round (the CC
    * machinery's shape), a 1-row broadcast max per half-step, one
    * [[Checkpoints.ckpt]] per round so the plan never grows. Output:
    * (id, hub, auth) over all nodes of the edge set. */
  def hits(pairs: DataFrame, maxIter: Int = 8): DataFrame = {
    require(maxIter >= 1, "hits: maxIter >= 1")
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .distinct()
      .transform(Checkpoints.ckpt) // consumed twice per round
    val nodes = edges.select(col("src").as("id"))
      .unionByName(edges.select(col("dst").as("id")))
      .distinct()
      .transform(Checkpoints.ckpt)
    def rescale(scored0: DataFrame, out: String): DataFrame = {
      // materialize the inflow ONCE: both consumers — the max broadcast
      // and the rescaled projection — read the checkpoint. Broadcasting
      // the max over the UN-cached inflow plan ran the edges join + agg
      // twice per half-step (r8 perf fix); the outer per-half-step ckpt
      // moved here, so the action count per round is unchanged.
      // LAZY (r14): the broadcast-max job right below is the single first
      // consumer — it materializes the blocks, the rescaled projection
      // reads them; one fewer job per half-step (16 per hits call).
      val scored = Checkpoints.ckptLazy(scored0)
      // integer normalization: the max inflow of a non-empty edge set is
      // >= 1 (some node receives at least one positive contribution), so
      // the DIV is never by zero
      val m = scored.agg(max(col("__s")).as("__m"))
      // the product runs in DECIMAL: __s reaches in-degree x 1e6, so the
      // BIGINT multiply overflowed Long past in-degree ~9.2e6 — plausible
      // on a 100 TB dedup graph (r07 ADVICE). DIV (IntegralDivide)
      // returns BIGINT and the rescaled value is <= 1e6 by construction.
      scored.crossJoin(broadcast(m))
        .select(col("id"),
          expr("CAST(__s AS DECIMAL(25,0)) * 1000000 DIV __m").as(out))
    }
    // Sparse-support iteration (r14): auth's support is EXACTLY the dst
    // set and hub's exactly the src set — a node outside them scores 0 in
    // every round (no in-edge ⇒ inflow 0 forever; no out-edge ⇒ never a
    // src key). The old per-half-step nodes-left-join + coalesce(__in, 0)
    // only re-padded those structural zeros, costing one exchange per
    // half-step (16 per call at maxIter 8); padding once at the end is
    // bit-identical: every edge's src is in hub's support and every dst
    // in auth's, so the join sums never see a missing row, and the
    // rescale max over the support equals the max over all nodes (zeros
    // never win — some inflow is >= 1).
    var hub = edges.select(col("src").as("id")).distinct()
      .withColumn("hub", lit(1000000L))
    var auth: DataFrame = null
    for (_ <- 1 to maxIter) {
      val rawAuth = edges.join(hub, edges("src") === hub("id"))
        .groupBy(col("dst").as("id")).agg(sum(col("hub")).as("__s"))
      // the ckpt lives INSIDE rescale (on the raw inflow); downstream
      // consumers re-derive only the cheap projection + broadcast max
      auth = rescale(rawAuth, "auth")
      val rawHub = edges.join(auth, edges("dst") === auth("id"))
        .groupBy(col("src").as("id")).agg(sum(col("auth")).as("__s"))
      hub = rescale(rawHub, "hub")
    }
    nodes.join(hub, Seq("id"), "left").join(auth, Seq("id"), "left")
      .select(col("id"), coalesce(col("hub"), lit(0L)).as("hub"),
        coalesce(col("auth"), lit(0L)).as("auth"))
  }

  /** k-core peeling: `rounds` FIXED iterations of "drop every node with
    * degree < k, keep edges between survivors" over the canonical a<b
    * edge set; returns (id, deg) — each surviving node with its degree
    * inside the core. Fixed rounds (not convergence-tested) keep the
    * operator deterministic and driver-round-trip-free, the PageRank
    * convention: the oracle unrolls the SAME rounds, so results match
    * even on graphs whose cascade is longer (document rounds per call
    * site; dedup similarity graphs cascade in 2-3 rounds). Scale
    * shape: per round one degree aggregate + two semi-joins keyed on
    * the endpoints, plan cut per round by a checkpoint. */
  def kCore(pairs: DataFrame, k: Int, rounds: Int = 6): DataFrame = {
    require(k >= 1 && rounds >= 1, "kCore: k >= 1, rounds >= 1")
    var e = pairs
      .select(least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .filter(col("a") < col("b")).distinct()
      .transform(Checkpoints.ckpt)
    def degrees(edges: DataFrame): DataFrame =
      edges.select(col("a").as("id"))
        .unionByName(edges.select(col("b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    for (_ <- 1 to rounds) {
      val keep = degrees(e).filter(col("deg") >= k).select(col("id"))
      e = e
        .join(keep.select(col("id").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("id").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        // EAGER (r15, reverting the r14 lazy experiment): each round's
        // edge set is consumed by a 3-leg fan-out (degree agg + two
        // semi-join probes) — exactly ckptLazy's forbidden racing-sibling
        // shape (ADVICE r14). The r14 lazy form measured a small sf0.1
        // win, but the sf1 ScaleBench probe VERDICT r14 asked for
        // measured the racing siblings' duplicated computation directly
        // (SCALEBENCH_r15kcore_{lazy8g,lazy32,eager32}.json): at the 8 g
        // default heap the lazy form's timed sf1 reps all die with
        // SparkOutOfMemoryError [UNABLE_TO_ACQUIRE_MEMORY]; at 32 g both
        // complete and lazy is 2.8x SLOWER (sf1 medians 247.8 s vs
        // 87.1 s, task CPU 1776 s vs 1304 s). Correct-and-2.8x-at-scale
        // beats 0.3 s at sf0.1.
        .transform(Checkpoints.ckpt)
    }
    degrees(e)
  }

  /** Triangle census of an undirected pair set (id_a, id_b): one row
    * (n_nodes, n_edges, n_wedges, n_triangles, clustering) where
    * clustering is the global coefficient 3T / W. Counts are exact
    * integers (wedges = sum deg*(deg-1) DIV 2 — always even, the DIV is
    * exact); clustering is ONE double division of exact operands, so
    * the whole row replays bit-for-bit cross-engine.
    *
    * Edges canonicalize to a < b (self-loops dropped, duplicates
    * merged); each triangle a < b < c is then counted exactly once as
    * the wedge (a,b)+(b,c) closed by (a,c) — the standard oriented
    * wedge-close join. Scale shape: two shuffle joins keyed on the
    * shared vertex plus one degree aggregate; the classic hardening
    * for power-law graphs is degree-based orientation (point each edge
    * at the higher-degree endpoint) which bounds per-vertex wedge
    * fan-out by sqrt(m) — id-orientation is kept here because dedup
    * similarity graphs are clique-ish with bounded family sizes
    * ([[Dedup.dropFrequentLines]]-capped), not power-law. */
  def triangleStats(pairs: DataFrame): DataFrame = {
    val e = pairs
      .select(least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .filter(col("a") < col("b")).distinct()
      .transform(Checkpoints.ckpt) // consumed 4x: 3 join legs + degrees
    val deg = e.select(col("a").as("id"))
      .unionByName(e.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    // coalesce: sum over zero rows is NULL; an empty edge set must
    // yield the all-zero census row (clustering 0.0), matching the
    // oriented-wedge column's convention
    val degStats = deg.agg(
      count(lit(1)).as("n_nodes"),
      coalesce(expr("sum(deg * (deg - 1) DIV 2)"), lit(0L)).as("n_wedges"))
    val tri = e.as("x").join(e.as("y"), col("x.b") === col("y.a"))
      .select(col("x.a").as("wa"), col("y.b").as("wc"))
      .join(e.as("z"),
        col("wa") === col("z.a") && col("wc") === col("z.b"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val edges = e.agg(count(lit(1)).as("n_edges"))
    degStats.crossJoin(broadcast(edges)).crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") === 0, lit(0.0))
          .otherwise((lit(3L) * col("n_triangles")).cast("double") /
            col("n_wedges").cast("double")).as("clustering"))
  }

  /** [[triangleStats]]'s power-law hardening: DEGREE-oriented wedge
    * enumeration (Schank & Wagner 2005 "forward"; the standard fix
    * noted in triangleStats's scaladoc). Each undirected edge points
    * from its (degree, id)-smaller endpoint to its larger one — a total
    * order, so orientation is deterministic and acyclic — and wedges
    * are enumerated only at a node's OUT-edges. A hub of degree d
    * contributes C(d, 2) wedges to the id-oriented join but has out-
    * degree ~0 here (every hub edge points INTO it), so per-node wedge
    * fan-out is bounded by out-degree <= O(sqrt(m)) and the join never
    * explodes on skewed degree distributions — the 100 TB posture for
    * triangle counting when the graph is NOT clique-capped (one shared
    * "unknown" contact key = one hub). The triangle total is identical
    * to [[triangleStats]]'s by construction (each triangle is counted
    * once, at its (deg, id)-smallest corner), which the q379/q380
    * fixture pair pins cross-engine.
    *
    * Output: (n_nodes, n_edges, n_wedges, n_wedges_oriented,
    * n_triangles, clustering) — n_wedges and clustering are the same
    * exact-integer / one-double-division values as triangleStats;
    * n_wedges_oriented = sum C(outdeg, 2) is the work the oriented
    * join actually does. Scale shape: one degree aggregate, two
    * id-keyed shuffle joins to attach endpoint degrees (node-set-sized
    * — NOT broadcastable), then the same two shuffle joins as
    * triangleStats but keyed on the oriented src, whose fan-out the
    * orientation bounds. */
  def triangleStatsOriented(pairs: DataFrame): DataFrame = {
    val e = pairs
      .select(least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .filter(col("a") < col("b")).distinct()
      .transform(Checkpoints.ckpt) // degrees + both orientation joins
    val deg = e.select(col("a").as("id"))
      .unionByName(e.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      .transform(Checkpoints.ckpt) // joined onto both endpoints + stats
    // coalesce: sum over zero rows is NULL; an empty edge set must
    // yield the all-zero census row (clustering 0.0), matching the
    // oriented-wedge column's convention
    val degStats = deg.agg(
      count(lit(1)).as("n_nodes"),
      coalesce(expr("sum(deg * (deg - 1) DIV 2)"), lit(0L)).as("n_wedges"))
    // ties in (deg, id) are impossible for distinct ids, so the edge
    // orientation below is strict and total
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val o = e
      .join(deg.select(col("id").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("deg").as("db")), Seq("b"))
      .select(
        when(aFirst, col("a")).otherwise(col("b")).as("src"),
        when(aFirst, col("b")).otherwise(col("a")).as("dst"),
        when(aFirst, col("db")).otherwise(col("da")).as("dd"))
      .transform(Checkpoints.ckpt) // 3 join legs + the outdeg aggregate
    // a wedge (src -> dst1, src -> dst2) with dst1 (deg, id)-before dst2
    // can only close via the edge dst1 -> dst2 — orientation follows the
    // same total order, so one semi-join probe direction suffices
    val wedgeOrd = col("x.dd") < col("y.dd") ||
      (col("x.dd") === col("y.dd") && col("x.dst") < col("y.dst"))
    val tri = o.as("x").join(o.as("y"),
        col("x.src") === col("y.src") && wedgeOrd)
      .select(col("x.dst").as("wa"), col("y.dst").as("wc"))
      .join(o.as("z"),
        col("wa") === col("z.src") && col("wc") === col("z.dst"),
        "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val owedges = o.groupBy(col("src")).agg(count(lit(1)).as("__od"))
      .agg(coalesce(expr("sum(__od * (__od - 1) DIV 2)"), lit(0L))
        .as("n_wedges_oriented"))
    val edges = e.agg(count(lit(1)).as("n_edges"))
    degStats.crossJoin(broadcast(edges)).crossJoin(broadcast(owedges))
      .crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_wedges_oriented"), col("n_triangles"),
        when(col("n_wedges") === 0, lit(0.0))
          .otherwise((lit(3L) * col("n_triangles")).cast("double") /
            col("n_wedges").cast("double")).as("clustering"))
  }
}
