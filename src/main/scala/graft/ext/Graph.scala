package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over relational edge lists. The flagship is a
  * FIXED-POINT PageRank: ranks are integers scaled by 1e6 and every
  * per-edge contribution is integer division, so the result is
  * bit-identical regardless of partitioning, engine, or summation order —
  * floating-point PageRank cannot be hash-compared across engines because
  * `sum(double)` depends on reduction order.
  *
  * Update rule (damping 0.85, scaled by 1e6):
  *   contrib(e) = (pr(src) * 85) div (100 * outdeg(src))
  *   pr'(node)  = 150000 + Σ incoming contrib
  *
  * Scale shape per iteration: one hash join of the rank table (|V| rows)
  * onto the edge list keyed by src, one groupBy dst — both shuffle on a
  * graph key, and the edge list's exchange is reused across iterations
  * (ReusedExchange; at cluster scale the edge list would be
  * checkpoint-materialized once instead of recomputed, same plan shape).
  * Rank tables are |V|-sized — candidates for broadcast when V is small
  * relative to E, which AQE decides per iteration.
  */
object Graph {

  /** Directed co-occurrence edges: (src, dst) part pairs appearing in the
    * same order, both directions, deduplicated. One self-equi-join on the
    * order key + one distinct — shuffles keyed on l_orderkey then on the
    * pair. Pair multiplicity per order is bounded by order width (~7
    * lines), so the join fans out by a constant, not by data size. */
  def copurchaseEdges(lineitem: DataFrame): DataFrame = {
    val a = lineitem.select(col("l_orderkey"), col("l_partkey").as("src"))
    val b = lineitem.select(col("l_orderkey"), col("l_partkey").as("dst"))
    a.join(b, "l_orderkey")
      .filter(col("src") =!= col("dst"))
      .select("src", "dst")
      .distinct()
  }

  /** Attach each edge's source out-degree — done ONCE, before the
    * iteration loop, so the per-iteration plan never re-aggregates
    * degrees. Callers materialize the result (parquet artifact or
    * checkpoint) before iterating; a DataFrame is lazily REcomputed at
    * every reference, so iterating over an unmaterialized edge list
    * re-derives it per iteration. */
  def withOutDegree(edges: DataFrame): DataFrame =
    edges.join(edges.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")

  /** Per-node triangle participation counts over a symmetric edge list,
    * via adjacency-list intersection (the "compact-forward" layout):
    * orient each undirected edge low-degree → high-degree (ties by id),
    * build each node's FORWARD-neighbor list once, then for every
    * oriented edge (a, b) the witnesses are `array_intersect(N⁺(a),
    * N⁺(b))` — each triangle {x, y, z} with x ≺ y ≺ z in the (degree,
    * id) order carries oriented edges x→y, x→z, y→z, so it closes on
    * edge (x, y) exactly once. Corners explode and count per node.
    *
    * Why degree orientation, not id orientation? Forward-adjacency
    * state per node is its FORWARD degree. Under id order that is the
    * node's full residual degree — a low-id hub on a power-law graph
    * collects a max-degree-sized array in one aggregation buffer. Under
    * (degree, id) order a node's forward neighbors all have ≥ its
    * degree, which bounds every forward list by O(√|E|) (arboricity
    * argument: d_fwd(v) ≤ deg(v) and d_fwd(v) counts only
    * higher-degree neighbors, so d_fwd(v)² ≤ deg(v)·d_fwd(v) ≤ 2|E|) —
    * per-node state is bounded by graph size, not by the hubs. The
    * triangle set is identical under any total order (spec-pinned on a
    * hub graph).
    *
    * Why not the textbook wedge join (a→b ⋈ b→c, then semi-probe a→c)?
    * The wedge intermediate is Σ deg² ≈ |E|·avg-degree rows THROUGH A
    * SHUFFLE — measured 49M rows at sf0.1 / 144 s per trial at the 8×
    * probe. Intersection never materializes open wedges: the widest
    * flow is |E| rows carrying two degree-length arrays (the same
    * information, amortized columnar), and only CLOSED triangles leave
    * the intersection. Both adjacency joins are pinned shuffle_hash —
    * the adjacency table is corpus-sized, never broadcast-safe, and
    * sorting |E| array-payload rows for SMJ is wasted work. Degrees
    * come from one groupBy over the symmetric list (degree ≡
    * out-degree there), and the degree join is shuffle_hash-pinned for
    * the same data-dependent-size reason. */
  /** Symmetric edge list → (degree, id)-oriented edges (a ≺ b), each
    * undirected edge exactly once. On a symmetric list degree ≡
    * out-degree, so when the edges already carry `outdeg` (the
    * [[withOutDegree]] artifact) the src side needs NO degree join —
    * only the dst side joins the |V|-row degree table (shuffle_hash:
    * |V| is data-dependent, never assume broadcast). Exposed for the
    * hub-graph state-bound spec; see [[triangleCounts]] for why the
    * order matters. */
  private[graft] def orientByDegree(edges: DataFrame): DataFrame = {
    val hasDeg = edges.columns.contains("outdeg")
    val deg =
      if (hasDeg) edges.select(col("src").as("node"), col("outdeg").as("deg")).distinct()
      else edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    val withA =
      if (hasDeg) edges.select(col("src"), col("dst"), col("outdeg").as("deg_a"))
      else edges.select("src", "dst")
        .join(deg.hint("shuffle_hash").select(col("node").as("sk"), col("deg").as("deg_a")),
          col("src") === col("sk"))
    withA
      .join(deg.hint("shuffle_hash").select(col("node").as("dk"), col("deg").as("deg_b")),
        col("dst") === col("dk"))
      .filter(col("deg_a") < col("deg_b") ||
        (col("deg_a") === col("deg_b") && col("src") < col("dst")))
      .select(col("src").as("a"), col("dst").as("b"))
  }

  /** Degree-oriented forward adjacency for `edges` — the CSR-style table
    * a triangle query serves from. Array ORDER is partitioning-dependent
    * (collect_list), but every consumer is order-insensitive
    * (array_intersect), so results stay partition-invariant. */
  def orientedAdjacency(oriented: DataFrame): DataFrame =
    oriented.groupBy(col("a").as("node"))
      .agg(collect_list(col("b")).as("nbrs"))

  /** Triangle counts served from PRE-oriented edges + adjacency (the
    * artifact path): two graph-key joins + array intersection — no
    * degree or orientation work in the serving plan. In production the
    * oriented adjacency is materialized once per graph snapshot (exactly
    * like a graph engine's CSR build) and every triangle/clustering
    * query reads it. */
  def triangleCountsServed(oriented: DataFrame, adj: DataFrame,
      topN: Int): DataFrame = {
    val tri = oriented
      .join(adj.hint("shuffle_hash").select(col("node").as("na_key"), col("nbrs").as("na")),
        col("a") === col("na_key"))
      .join(adj.hint("shuffle_hash").select(col("node").as("nb_key"), col("nbrs").as("nb")),
        col("b") === col("nb_key"))
      .select(col("a"), col("b"),
        explode(array_intersect(col("na"), col("nb"))).as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node")
      .agg(count(lit(1)).as("n_triangles"))
      .orderBy(desc("n_triangles"), col("node"))
      .limit(topN)
  }

  def triangleCounts(edges: DataFrame, topN: Int): DataFrame = {
    val e = orientByDegree(edges)
    triangleCountsServed(e, orientedAdjacency(e), topN)
  }

  /** `iters` rounds of the fixed-point update over a symmetric edge list
    * carrying (src, dst, outdeg) — see [[withOutDegree]]. Symmetric ⇒
    * every node with an in-edge has an out-edge, so no dangling mass.
    * Each iteration is ONE rank⋈edges join (both sides keyed on the
    * graph key) plus one groupBy dst. Returns (node, pr), pr × 1e6.
    *
    * `materializeRanks` is the at-scale mode: each iteration's rank table
    * is localCheckpoint-materialized (identical values — the fixed-point
    * arithmetic is integer — so the oracle is unaffected). That buys two
    * things a 1000-executor run needs: (1) lineage truncation, so
    * iteration N's plan does not re-derive iterations 1..N-1 (the same
    * reason [[Dedup]]'s connected components checkpoints); (2) the
    * rank⋈edges join sees two BARE shuffle reads, which is the shape
    * AQE's skew-join rule pattern-matches — with inline ranks the final
    * HashAggregate sits between the shuffle and the join sort and the
    * rewrite can never fire, so a power-law hub source pins its whole
    * shuffle partition on one task (spec-pinned: ScaleOpsSpec asserts
    * skew=true fires in this mode on a hub graph). Default off: the
    * harness-scale registered query keeps the single lazy plan. */
  /** One fixed-point update: rank⋈edges on the graph key, contributions
    * re-aggregated per destination. Exposed so the skew spec can drive
    * the exact iteration join over materialized inputs. */
  private[graft] def pagerankStep(edgesWithDeg: DataFrame, ranks: DataFrame): DataFrame =
    edgesWithDeg
      .join(ranks, col("src") === col("node"))
      .select(col("dst"),
        expr("(pr * 85) div (100 * outdeg)").as("contrib"))
      .groupBy(col("dst").as("node"))
      .agg((lit(150000L) + sum("contrib")).as("pr"))
      .select(col("node"), col("pr"))

  def pagerankFixedPoint(edgesWithDeg: DataFrame, iters: Int,
      materializeRanks: Boolean = false): DataFrame = {
    def mat(df: DataFrame): DataFrame =
      if (materializeRanks) df.localCheckpoint() else df
    var ranks = mat(edgesWithDeg.select(col("src").as("node")).distinct()
      .withColumn("pr", lit(1000000L)))
    for (_ <- 1 to iters)
      ranks = mat(pagerankStep(edgesWithDeg, ranks))
    ranks
  }

  /** Personalized PageRank: same fixed-point integer update as
    * [[pagerankFixedPoint]], but teleport mass lands ONLY on `seeds`
    * (node column), so rank measures proximity to the seed set — the
    * "related items for THESE products" / "pages like THIS cluster"
    * query. The rank table stays defined over ALL nodes every round
    * (zero rank rows cost nothing and keep the recurrence one shape);
    * `seeds` is a top-k list, bounded by construction, so its two joins
    * per round broadcast legitimately — the rank⋈edges join stays keyed
    * on the graph key exactly like the global variant. */
  def pprFixedPoint(edgesWithDeg: DataFrame, seeds: DataFrame,
      iters: Int): DataFrame = {
    // nodes and the seed list are MATERIALIZED once (localCheckpoint):
    // both are referenced by every teleport round, and as lazy frames
    // each round's plan re-derived them from scratch — the r16 plan
    // audit read ELEVEN scans of the edge artifact for 3 rounds (the
    // outer-join null filters break canonical-plan equality, so Spark's
    // ReuseExchange never unified the copies). One |V|-row and one
    // k-row materialization replace 2 aggregate+TakeOrdered passes per
    // round; the per-round rank⋈edges join is untouched.
    val nodes = edgesWithDeg.select(col("src").as("node")).distinct()
      .localCheckpoint()
    val seed = broadcast(seeds.select(col("node").as("sn")).localCheckpoint())
    def teleported(inflow: DataFrame): DataFrame =
      nodes
        .join(seed, col("node") === col("sn"), "left")
        .join(inflow.hint("shuffle_hash")
          .select(col("node").as("ik"), col("inflow")), col("node") === col("ik"), "left")
        .select(col("node"),
          (when(col("sn").isNotNull, 150000L).otherwise(0L) +
            coalesce(col("inflow"), lit(0L))).as("pr"))
    var ranks = nodes.join(seed, col("node") === col("sn"), "left")
      .select(col("node"),
        when(col("sn").isNotNull, 1000000L).otherwise(0L).as("pr"))
    for (_ <- 1 to iters)
      ranks = teleported(
        edgesWithDeg.join(ranks, col("src") === col("node"))
          .select(col("dst"), expr("(pr * 85) div (100 * outdeg)").as("contrib"))
          .groupBy(col("dst").as("node"))
          .agg(sum("contrib").as("inflow"))
          .select(col("node"), col("inflow")))
    ranks
  }

  /** Link prediction over a symmetric co-occurrence graph: for node pairs
    * with NO existing edge, count common neighbors and score with the
    * Resource-Allocation index Σ 1/deg(center) — kept fixed-point
    * (`1000000 div deg`, integer) so the sum is order-invariant and
    * cross-engine exact, the same trick as [[pagerankFixedPoint]] (a
    * float `1/ln(deg)` Adamic-Adar cannot be hash-compared: summation
    * order AND libm vs JVM `log` both drift).
    *
    * Wedge enumeration CANNOT borrow the triangle degree-orientation
    * bound: a wedge's center is fixed (the common neighbor), so exact
    * all-pairs is Σ deg(center)² — quadratic at hubs. The scalable
    * semantic CAPS center degree instead: hub centers are excluded
    * outright (the oracle applies the same cap), bounding wedges per
    * center at cap² and total work at cap·|E|. This matches practice,
    * not just plan shape — a hub's RA contribution 1/deg is the weakest
    * signal, and "everyone co-bought it" centers recommend noise; every
    * production co-occurrence recommender (and the standard RA/AA
    * literature) prunes or downweights hubs for the same two reasons.
    *
    * Plan: one self-equi-join of the capped center adjacency on the
    * center key (shuffle_hash — both sides are corpus-sized), one pair
    * groupBy, one anti-join against existing edges, TakeOrdered top-k.
    * Ties cannot reach the cutoff nondeterministically: (u, v) is unique
    * per row and closes the sort key. */
  def linkPredictRA(edgesWithDeg: DataFrame, maxCenterDeg: Int, topK: Int): DataFrame = {
    val ctr = edgesWithDeg.filter(col("outdeg") <= maxCenterDeg)
    val left = ctr.select(col("src").as("ctr"), col("dst").as("u"), col("outdeg"))
    val right = ctr.select(col("src").as("ctr"), col("dst").as("v"))
    val wedges = left.join(right.hint("shuffle_hash"), "ctr")
      .filter(col("u") < col("v"))
    val scored = wedges.groupBy("u", "v").agg(
      count(lit(1)).as("common_neighbors"),
      sum(expr("1000000 div outdeg")).as("ra_score"))
    val existing = edgesWithDeg.select(col("src").as("u"), col("dst").as("v"))
    scored.join(existing.hint("shuffle_hash"), Seq("u", "v"), "left_anti")
      .orderBy(col("ra_score").desc, col("u"), col("v"))
      .limit(topK)
  }
}
