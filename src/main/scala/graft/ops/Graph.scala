package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge lists — the companion of
  * [[Dedup.connectedComponents]] (which owns cluster formation): centrality
  * scores used by curation pipelines to pick cluster REPRESENTATIVES by
  * importance instead of min-id, and to rank near-duplicate communities by
  * how central their members are.
  */
object Graph {

  /** MUTUAL-kNN edges from any ranked neighbor frame (query_id,
    * neighbor_id) — brute-force exact, LSH, or IVF top-k all fit: an
    * undirected edge (a < b) exists iff each endpoint appears in the
    * other's top-k. Mutuality is the classic symmetrization that prunes
    * hub-induced one-way links before community/centrality analysis.
    * One self-semi-join on (id, id) pairs — two longs per row.
    */
  def mutualEdges(topk: DataFrame): DataFrame = {
    val e = topk.select(col("query_id").as("id_a"), col("neighbor_id").as("id_b"))
    e.join(e.select(col("id_b").as("id_a"), col("id_a").as("id_b")),
        Seq("id_a", "id_b"), "left_semi")
      .where(col("id_a") < col("id_b"))
  }

  /** Deterministic PageRank over a DIRECTED edge list (src, dst) and a node
    * frame (id): `iters` synchronous iterations of
    *
    *   pr(v) = 0.15/N + 0.85 · (Σ_{u→v} pr(u)/deg(u) + DM/N)
    *
    * with dangling mass DM = Σ_{deg(u)=0} pr(u) redistributed uniformly —
    * the standard damped random surfer (Page et al. 1999). Every
    * mass-gathering sum is decimal(38,18)-exact (order-independent), the
    * per-edge contribution pr/deg and the final combination are fixed
    * double expressions, so the scores are bit-reproducible on any
    * partitioning and hash-match an oracle that mirrors the same casts
    * (the q112 power-iteration discipline applied to a graph).
    *
    * Scale shape per iteration: one (src-keyed) join to attach pr/deg, one
    * dst-keyed decimal aggregation — ids and one double per row through
    * every exchange; N and the dangling mass are 1-row broadcasts; the
    * rank frame is localCheckpoint'd each iteration (it feeds both the
    * next contribution join and the dangling sum — and 10 iterations of
    * unbroken lineage would replay the whole chain per action).
    */
  /** Degree-oriented triangle census over an undirected edge set
    * (id_a < id_b): one row (n_edges, n_wedges, n_triangles, clustering)
    * where clustering is the global coefficient 3·triangles / wedges.
    *
    * Scale shape — the MPC triangle-counting standard (orient, wedge at
    * the light apex, close): every edge directs from its (degree, id)-
    * smaller endpoint, so wedges enumerate at each triangle's LIGHTEST
    * vertex and the self-join fan-out is Σ d⁺(v)² with d⁺ ≤ √(2m) — the
    * arboricity bound that keeps hub vertices from exploding the join.
    * Closing is one semi-join back to the (id-ordered) edge set; counts
    * and wedges are exact integers, so the single output row hash-matches
    * an oracle that counts triangles the naive a<b<c way.
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    val ed = edges.select(col("id_a"), col("id_b")).localCheckpoint()
    val deg = ed.select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val closed = orientedClosedTriangles(ed, deg)
    val tri = closed.agg(count(lit(1)).as("n_triangles"))
    // empty edge set: SUM over zero rows is NULL — report 0 wedges, not null
    val wedges = deg.agg(
      coalesce(sum(expr("(deg * (deg - 1)) div 2")), lit(0L)).as("n_wedges"))
    ed.agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(tri))
      .crossJoin(broadcast(wedges))
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
        ((col("n_triangles") * lit(3L)).cast("double") /
          col("n_wedges").cast("double")).as("clustering"))
  }

  /** The degree-oriented triangle enumeration shared by [[triangleStats]]
    * and [[localClustering]]: edges direct from their (degree, id)-smaller
    * endpoint, wedges open at the light apex, and a semi-join back to the
    * id-ordered edge set closes them. Returns one row per triangle with all
    * three members as (src, v, w), v < w.
    */
  private def orientedClosedTriangles(ed: DataFrame, deg: DataFrame): DataFrame = {
    val withDeg = ed
      .join(deg.select(col("id").as("id_a"), col("deg").as("da")), "id_a")
      .join(deg.select(col("id").as("id_b"), col("deg").as("db")), "id_b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("id_a") < col("id_b"))
    val oriented = withDeg.select(
      when(aFirst, col("id_a")).otherwise(col("id_b")).as("src"),
      when(aFirst, col("id_b")).otherwise(col("id_a")).as("dst"))
      .localCheckpoint()
    oriented.select(col("src"), col("dst").as("v"))
      .join(oriented.select(col("src"), col("dst").as("w")), Seq("src"))
      .where(col("v") < col("w"))
      .join(ed.select(least(col("id_a"), col("id_b")).as("v"),
        greatest(col("id_a"), col("id_b")).as("w")), Seq("v", "w"), "left_semi")
  }

  /** Per-node clustering coefficient: lcc(i) = 2·t_i / (deg_i·(deg_i−1))
    * where t_i counts triangles through i. Same degree-oriented enumeration
    * as [[triangleStats]] (each closed triangle explodes to its 3 members —
    * a 3× constant, not a data-sized blow-up); nodes of degree < 2 have no
    * defined coefficient and are excluded. Exact integers until the one
    * division. Output: (id, deg, n_triangles, lcc).
    */
  def localClustering(edges: DataFrame): DataFrame = {
    val ed = edges.select(col("id_a"), col("id_b")).localCheckpoint()
    val deg = ed.select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val tn = orientedClosedTriangles(ed, deg)
      .select(explode(array(col("src"), col("v"), col("w"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_triangles"))
    deg.where(col("deg") >= 2)
      .join(tn, Seq("id"), "left_outer")
      .select(col("id"), col("deg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        ((coalesce(col("n_triangles"), lit(0L)) * lit(2L)).cast("double") /
          (col("deg") * (col("deg") - lit(1L))).cast("double")).as("lcc"))
  }

  /** Adamic-Adar link prediction over an undirected edge set (id_a < id_b):
    * for each NON-adjacent pair (a, b) sharing at least one neighbor,
    * score = Σ_{z ∈ N(a)∩N(b)} 1/ln(deg z) — common neighbors weighted
    * inversely by their hubness. The link-prediction read over the
    * mutual-kNN graph: "which near-dup clusters are one edge away from
    * merging". Returns the top-`k` pairs.
    *
    * Scale shape: wedge enumeration through each center z costs Σ deg(z)²
    * — bounded on kNN graphs (deg ≤ k by construction); a wedge center
    * always has deg ≥ 2, so ln(deg) > 0 and the weight is finite. The
    * existing-edge exclusion is a native LeftAnti; the per-pair fold is
    * decimal(38,18); top-k is TakeOrdered with full tie-breaks.
    */
  def adamicAdar(edges: DataFrame, k: Int): DataFrame = {
    val ed = edges.select(col("id_a"), col("id_b")).localCheckpoint()
    val adj = ed.select(col("id_a").as("id"), col("id_b").as("nbr"))
      .unionByName(ed.select(col("id_b").as("id"), col("id_a").as("nbr")))
    val deg = adj.groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val cand = adj.select(col("nbr").as("a"), col("id").as("z"))
      .join(adj.select(col("id").as("z"), col("nbr").as("b")), "z")
      .where(col("a") < col("b"))
    cand.join(deg.select(col("id").as("z"), col("deg")), "z")
      .groupBy(col("a"), col("b"))
      .agg(Num.dsum38(lit(1.0) / log(col("deg").cast("double"))).as("aa_score"),
        count(lit(1)).as("n_common"))
      .join(ed.select(col("id_a").as("a"), col("id_b").as("b")),
        Seq("a", "b"), "left_anti")
      .select(col("a").as("id_a"), col("b").as("id_b"),
        col("aa_score"), col("n_common"))
      .orderBy(col("aa_score").desc, col("id_a").asc, col("id_b").asc)
      .limit(k)
  }

  def pageRank(
      nodes: DataFrame,
      edges: DataFrame,
      iters: Int,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val d = lit(damping)
    val oneMinusD = lit(1.0 - damping)
    val nn = nodes.agg(count(lit(1)).as("nn"))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    var r = nodes.select(col("id"))
      .crossJoin(broadcast(nn))
      .select(col("id"), (lit(1.0) / col("nn").cast("double")).as("pr"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = edges.join(deg, "src")
        .join(r.select(col("id").as("src"), col("pr")), "src")
        .select(col("dst"),
          (col("pr") / col("deg").cast("double")).as("c"))
      val gathered = contrib.groupBy(col("dst"))
        .agg(sum(col("c").cast("decimal(38,18)")).as("s"))
      val dangling = r.join(deg, r("id") === deg("src"), "left_anti")
        .agg(coalesce(sum(col("pr").cast("decimal(38,18)")),
          lit(0).cast("decimal(38,18)")).as("dm"))
      r = r.select(col("id"))
        .join(gathered, col("id") === col("dst"), "left_outer")
        .crossJoin(broadcast(nn))
        .crossJoin(broadcast(dangling))
        .select(col("id"),
          ((oneMinusD / col("nn").cast("double")) +
            d * (coalesce(col("s").cast("double"), lit(0.0)) +
              col("dm").cast("double") / col("nn").cast("double"))).as("pr"))
        .localCheckpoint()
    }
    r
  }

  /** k-core decomposition (bounded peel): repeatedly delete vertices of
    * degree < k until none remain; what survives is the maximal subgraph
    * with minimum degree ≥ k — the standard "dense cohesive core" filter
    * that strips kNN-graph tendrils before community analysis.
    *
    * The peel is a driver loop of `maxRounds` BOUNDED iterations: each
    * round is one (id)-keyed degree aggregation + two semi joins, frames
    * carry bare id pairs, and every round localCheckpoints (the PageRank
    * pacing). The fixpoint is reached when a round deletes nothing; extra
    * rounds past the fixpoint are no-ops, so a `maxRounds` large enough to
    * converge (GraphSpec pins convergence on the catalog graph; peel depth
    * is bounded by the graph's degeneracy ordering length, tiny for kNN
    * graphs whose degree is capped by the k of the kNN) makes the result
    * the true k-core regardless of the exact count. Early-exits when a
    * round leaves the edge count unchanged.
    *
    * Input: undirected edges (id_a, id_b), one row per edge. Output:
    * (id, deg) for core members, deg = degree WITHIN the core.
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 8): DataFrame = {
    require(k >= 1 && maxRounds >= 1, "k and maxRounds must be positive")
    def degrees(e: DataFrame): DataFrame =
      e.select(explode(array(col("id_a"), col("id_b"))).as("id"))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    var e = edges.select(col("id_a"), col("id_b")).localCheckpoint()
    var nEdges = e.count()
    var done = nEdges == 0L
    var round = 0
    while (!done && round < maxRounds) {
      val alive = degrees(e).where(col("deg") >= k).select(col("id"))
        .localCheckpoint()
      e = e
        .join(alive.select(col("id").as("id_a")), Seq("id_a"), "left_semi")
        .join(alive.select(col("id").as("id_b")), Seq("id_b"), "left_semi")
        .select(col("id_a"), col("id_b"))
        .localCheckpoint()
      val n = e.count()
      done = n == nEdges || n == 0L
      nEdges = n
      round += 1
    }
    degrees(e)
  }

  /** Synchronous LABEL PROPAGATION community detection (Raghavan et al.
    * 2007), determinized: labels start as node ids; each round every node
    * adopts its neighbors' most frequent label, ties broken by MIN label.
    * A FIXED round count (no early exit) keeps engine and oracle on the
    * same unrolled computation, so the hash-match is unconditional —
    * converged or mid-oscillation (synchronous LPA can 2-cycle on
    * bipartite structures; a fixed round count makes even that
    * deterministic).
    *
    * Scale shape: each round is one (adjacency ⋈ labels) join on bare ids
    * + one keyed count + one per-node argmax window — the connected-
    * components envelope (id,label)-only shuffles, localCheckpoint-paced.
    * Round counts stay small (LPA converges in a handful of sweeps on
    * community-structured graphs).
    */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "need at least one propagation round")
    val e = edges.select(col("id_a"), col("id_b")).localCheckpoint()
    val adj = e.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(e.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint()
    var lab = adj.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint()
    val W = org.apache.spark.sql.expressions.Window
    for (_ <- 1 to rounds) {
      lab = adj.join(lab.select(col("id").as("dst"), col("lbl")), "dst")
        .groupBy(col("src"), col("lbl")).agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(
          W.partitionBy(col("src")).orderBy(col("c").desc, col("lbl").asc)))
        .where(col("rn") === 1)
        .select(col("src").as("id"), col("lbl"))
        .localCheckpoint()
    }
    lab
  }
}
