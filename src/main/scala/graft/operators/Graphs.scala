package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond [[Dedup.clusters]]' connected
  * components: PageRank over the comment-reply graph ("which threads/
  * comments accumulate influence"), in the engine's auditable-numerics
  * house style.
  *
  * ==Integer-exact PageRank==
  * The textbook iteration r ← (1−d)/N + d·Σ r(u)/deg(u) runs on
  * doubles, whose partial-sum order is partition-dependent — a
  * hash-gate killer. This operator defines THE semantics as the
  * integer-quantized iteration at a fixed scale (10¹² units of total
  * mass):
  *
  *   r₀       = scale div N
  *   contrib  = (r·85 div 100) div deg        (per out-edge)
  *   r_{t+1}  = (scale·15 div 100) div N + Σ contrib
  *
  * Every step is exact long arithmetic — associative sums, engine-
  * independent division — so a fixed iteration count replays
  * relationally to the bit. Dangling nodes (no out-edges) leak their
  * damped mass by design (the "sink loss" convention), which is
  * deterministic and documented rather than the redistribute variant's
  * extra global aggregate per step.
  *
  * Scale shape: each iteration is one edge-join + one dst-aggregation
  * (two exchanges bounded by |edges|), with per-iteration
  * localCheckpoint so the lazy chain stays linear (the MMR lineage
  * lesson). N and the two per-run constants are driver-side scalars
  * from one count.
  */
object Graphs {

  /** Edge-row ceiling for the broadcast wedge close in [[triangles]]:
    * the oriented edge set hashes to roughly 50 B/row as a broadcast
    * relation (two longs + HashedRelation overhead), so 10M edges ≈
    * 0.5 GB resident per executor — the practical broadcast reach.
    * Past it the close partitions BOTH sides on (b, c) instead. */
  val BroadcastCloseMaxEdges = 10000000L

  /** Exactly-once TRIANGLE enumeration over an undirected graph (edges
    * as distinct u < v pairs) — the co-occurrence/community primitive
    * (market-basket affinity, cohesion scoring). Degree-ordered
    * orientation: every edge points from its lower (deg, id) endpoint
    * to the higher, so each triangle is generated exactly once from its
    * lowest-ordered corner and wedge fan-out is bounded by the
    * degeneracy-ordered out-degree (the standard distributed triangle
    * device — a hub's O(deg²) wedge explosion lands on the LOW-degree
    * neighbors instead). The order key rides as a comparable struct
    * (deg, id) — no global rank window, no |V| sort.
    *
    * The wedge CLOSE is size-gated on |E| (one count over the already-
    * checkpointed edge set): within `broadcastMaxEdges` the oriented
    * edges broadcast and the Σ outdeg² wedge stream never leaves its
    * generating stage; beyond it — where the broadcast would OOM every
    * executor — both wedges and edges hash-partition on (b, c), with a
    * shuffle_hash hint so the |E|-sized side builds the hash table and
    * the wedge stream only shuffle-writes, never sorts. The wedge rows
    * are projected to (src, b, c) before the close so the fallback
    * exchange moves three longs per wedge, nothing more.
    *
    * Returns (a, b, c) triangle rows; [[trianglesPerNode]] folds them
    * into per-node participation counts.
    */
  def triangles(edges: DataFrame,
      broadcastMaxEdges: Long = BroadcastCloseMaxEdges): DataFrame =
    triangleCore(edges, broadcastMaxEdges, wedgeFanoutCap = None)

  /** [[triangles]] with a SKEW SHED on the wedge-generating corner: a
    * source whose degeneracy-ordered out-degree exceeds `wedgeFanoutCap`
    * is dropped BEFORE wedge generation — its C(outdeg, 2) wedge fan-out
    * (the "one hot hub = one giant wedge group" failure shape: a dense
    * community's lowest-ordered member owns the whole community's wedge
    * explosion in a single (src) group) never materializes. The shed is
    * visible at runtime via observe() under the `graft_shed_` prefix
    * (shed_sources, shed_wedges = Σ C(outdeg, 2) over shed sources —
    * exact integer accounting of what was NOT enumerated, the no-silent-
    * caps contract). Capped semantics are exact and replayable: the
    * output is precisely the triangles whose generating corner (lowest
    * (deg, id) endpoint) keeps outdeg ≤ cap — the close side still uses
    * the FULL edge set, so only hub-cornered triangles are shed. */
  /** Estimated resident bytes per oriented edge in a ShuffledHashJoin
    * build relation (two longs + UnsafeRow header + BytesToBytesMap
    * entry overhead) — the sizing basis for the auto-fallback below. */
  val CloseBuildBytesPerRow = 48L

  /** Per-partition build budget for the shuffle_hash close. Past it the
    * close auto-falls back to sort-merge, because Spark's SHJ build has
    * NO spill path (it throws SparkOutOfMemoryError at the wall — a
    * fact graft.Stress section 4 measured); 64 MB matches AQE's
    * advisory partition size and sits far inside any sane executor's
    * per-task execution share. */
  val CloseBuildMaxPartitionBytes: Long = 64L * 1024 * 1024

  /** Join hint for the beyond-broadcast wedge close.
    *  - `"shuffle_hash"` (default): the wedge stream only shuffle-writes
    *    and probes — never sorts. The fast path. Its contract: the
    *    per-partition |E| build must fit in execution memory (Spark's
    *    ShuffledHashJoin build has NO spill path — it throws
    *    SparkOutOfMemoryError past the wall). The build size is
    *    estimated up front (|E| × [[CloseBuildBytesPerRow]] over the
    *    session's shuffle partitions) and past
    *    `closeBuildMaxPartitionBytes` the close AUTO-falls back to
    *    sort-merge rather than gamble on a spill-less build.
    *  - `"merge"`: the spill-graceful close — both sides stream through
    *    the ExternalSorter, surviving arbitrary memory starvation at
    *    the cost of sorting the Σ outdeg² wedge stream
    *    (graft.Stress section 4 rehearses exactly this pairing). */
  def trianglesCapped(edges: DataFrame, wedgeFanoutCap: Long,
      broadcastMaxEdges: Long = BroadcastCloseMaxEdges,
      closeHint: String = "shuffle_hash",
      closeBuildMaxPartitionBytes: Long = CloseBuildMaxPartitionBytes): DataFrame = {
    require(wedgeFanoutCap >= 1, s"wedgeFanoutCap must be >= 1: $wedgeFanoutCap")
    triangleCore(edges, broadcastMaxEdges, Some(wedgeFanoutCap), closeHint,
      closeBuildMaxPartitionBytes)
  }

  private def triangleCore(edges: DataFrame, broadcastMaxEdges: Long,
      wedgeFanoutCap: Option[Long],
      closeHint: String = "shuffle_hash",
      closeBuildMaxPartitionBytes: Long = CloseBuildMaxPartitionBytes): DataFrame = {
    val e = edges.select(col("u"), col("v")).localCheckpoint(false)
    val deg = e.select(col("u").as("p")).unionByName(e.select(col("v").as("p")))
      .groupBy("p").agg(count(lit(1)).as("deg"))
    // order key packed into ONE long (deg·2³² + id, both < 2³¹): the
    // kb < kc test runs ~Σ outdeg² times in the wedge loop, and a
    // primitive long compare there is materially cheaper than a
    // two-field struct ordering
    val withK = e
      .join(deg.select(col("p").as("u"),
        (col("deg") * 4294967296L + col("p")).as("ku")), "u")
      .join(deg.select(col("p").as("v"),
        (col("deg") * 4294967296L + col("p")).as("kv")), "v")
    val oriented = withK.select(
        when(col("ku") < col("kv"), col("u")).otherwise(col("v")).as("src"),
        when(col("ku") < col("kv"), col("v")).otherwise(col("u")).as("dst"),
        when(col("ku") < col("kv"), col("kv")).otherwise(col("ku")).as("kdst"))
      .localCheckpoint(false)
    // skew shed (trianglesCapped only): out-degrees aggregate on the
    // same src hash-partitioning the wedge join needs anyway, the shed
    // counters ride that stage as a pass-through CollectMetrics, and the
    // kept-source semi filter joins back on src — no extra exchange
    // shape beyond the outdeg aggregate itself
    val wedgeSrc = wedgeFanoutCap match {
      case None => oriented
      case Some(cap) =>
        val kept = oriented.groupBy("src").agg(count(lit(1)).as("_od"))
          .observe(graft.operators.Guard.shedMetricName("triangleWedges"),
            sum(when(col("_od") > cap, 1L).otherwise(0L)).as("shed_sources"),
            sum(when(col("_od") > cap, expr("(_od * (_od - 1)) div 2"))
              .otherwise(0L)).as("shed_wedges"))
          .filter(col("_od") <= cap)
          .select("src")
        oriented.join(kept, Seq("src"))
    }
    val w1 = wedgeSrc.select(col("src"), col("dst").as("b"), col("kdst").as("kb"))
    val w2 = wedgeSrc.select(col("src"), col("dst").as("c"), col("kdst").as("kc"))
    // the close key (b, c) packed into ONE long — same id < 2³¹ contract
    // as the order-key packing above. A single-long equi-join key builds
    // Spark's specialized LongHashedRelation instead of the generic
    // UnsafeRow-keyed map (the Σ outdeg² probe stream hits that map once
    // per wedge — measured 4.4 s → 1.9 s at sf0.1's 41M wedges), and on
    // the beyond-broadcast path the wedge exchange carries two longs per
    // wedge instead of three (b and c unpack from the key after the join).
    val wedges = w1.join(w2, Seq("src")).filter(col("kb") < col("kc"))
      .select(col("src"), (col("b") * 4294967296L + col("c")).as("bc"))
    val close = oriented
      .select((col("src") * 4294967296L + col("dst")).as("bc"))
    // close wedges against a BROADCAST of the edge set when it fits: the
    // wedge stream (Σ outdeg² rows — orders of magnitude bigger than
    // |E|) is generated and filtered inside one stage and never
    // shuffles; only |E| bytes move. Without this the wedges exchange
    // dominated the whole query (measured 49.6 s → 5 s at sf0.1's
    // 1.2M-edge graph). Beyond broadcast reach, hash-partition both
    // sides on the packed key; shuffle_hash keeps the wedge side
    // sort-free.
    val eCount = e.count()
    val closed =
      if (eCount <= broadcastMaxEdges)
        wedges.join(broadcast(close), Seq("bc"))
      else {
        val parts = math.max(1, edges.sparkSession.conf
          .get("spark.sql.shuffle.partitions", "200").toInt)
        // past the per-partition build budget the spill-less SHJ build
        // would OOM, not degrade — auto-select the sort-merge close
        val hint =
          if (closeHint == "shuffle_hash" &&
              eCount * CloseBuildBytesPerRow / parts > closeBuildMaxPartitionBytes)
            "merge"
          else closeHint
        wedges.join(close.hint(hint), Seq("bc"))
      }
    closed.select(col("src").as("a"),
      shiftright(col("bc"), 32).as("b"),
      col("bc").bitwiseAND(lit(4294967295L)).as("c"))
  }

  /** Per-node triangle participation counts, top-k by (count desc, id). */
  def trianglesPerNode(edges: DataFrame, k: Int,
      broadcastMaxEdges: Long = BroadcastCloseMaxEdges): DataFrame = {
    // materialize the enumeration once: the 3-way corner union would
    // otherwise re-run the whole wedge pipeline per branch (the plan
    // showed it thrice — the dominant cost, not the wedges themselves)
    val tri = triangles(edges, broadcastMaxEdges).localCheckpoint(false)
    tri.select(col("a").as("p"))
      .unionByName(tri.select(col("b").as("p")))
      .unionByName(tri.select(col("c").as("p")))
      .groupBy("p").agg(count(lit(1)).as("n_tri"))
      .orderBy(col("n_tri").desc, col("p").asc)
      .limit(k)
  }

  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int,
      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && scale > 0)
    val ids = nodes.select(col("id")).localCheckpoint(false)
    val e = edges.select(col("src"), col("dst")).localCheckpoint(false)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(false)
    val n = ids.count()
    require(n > 0, "empty graph")
    val base = (scale * 15L / 100L) / n
    var rank = ids.select(col("id"), lit(scale / n).as("r"))
    for (_ <- 1 to iters) {
      val contrib = rank.join(e, col("id") === col("src"))
        .join(outdeg, "src")
        .select(col("dst"), expr("((r * 85) div 100) div deg").as("c"))
        .groupBy("dst").agg(sum("c").as("cin"))
        .withColumnRenamed("dst", "id")
      rank = ids
        .join(contrib, Seq("id"), "left")
        .select(col("id"), (lit(base) + coalesce(col("cin"), lit(0L))).as("r"))
        .localCheckpoint(false)
    }
    rank.select(col("id"), col("r").as("pr"))
  }

  /** Stationary distribution of an empirical MARKOV CHAIN (power
    * iteration over the row-normalized transition counts) in the
    * integer-exact PageRank regime: mass in `scale` units,
    *
    *   x₀(s)     = scale div K
    *   x_{t+1}(s) = Σ_f (x_t(f)·c(f,s)) div rowtot(f)
    *
    * — every step exact long arithmetic (associative sums, engine-
    * independent division), so a fixed iteration count replays
    * relationally to the bit. Floor division leaks sub-unit mass per
    * step and states without outgoing transitions leak theirs entirely
    * (the PageRank sink-loss convention — deterministic, documented).
    * Per iteration: one transition join + one destination aggregate,
    * both |transitions|-bounded, per-iteration checkpoint. The state
    * vector is |states| rows end to end. */
  def markovStationary(pairs: DataFrame, iters: Int,
      scale: Long = 1000000000L): DataFrame = {
    require(iters >= 0 && scale > 0)
    val p = pairs.select(col("f"), col("t"), col("c"))
      .localCheckpoint(false)
    val states = p.select(col("f").as("s"))
      .unionByName(p.select(col("t").as("s"))).distinct()
      .localCheckpoint(false)
    val rowtot = p.groupBy("f").agg(sum("c").as("tot"))
    val k = states.count()
    require(k > 0, "empty chain")
    var x = states.withColumn("v", lit(scale / k))
    for (_ <- 1 to iters) {
      val next = x.join(p, col("s") === col("f"))
        .join(rowtot, "f")
        .select(col("t").as("s"), expr("(v * c) div tot").as("vc"))
        .groupBy("s").agg(sum("vc").as("vn"))
      x = states.join(next, Seq("s"), "left")
        .select(col("s"), coalesce(col("vn"), lit(0L)).as("v"))
        .localCheckpoint(false)
    }
    x
  }

  /** Multi-source BFS hop distances over an undirected graph (`edges` as
    * u < v pairs): min #hops from any seed, up to `maxHops`; unreachable
    * nodes are absent. Frontier expansion — per hop ONE |frontier⋈edges|
    * join + an anti-join against the visited set, each bounded by
    * |edges|; the frontier is localCheckpoint'd so the plan never
    * re-expands earlier hops (the MMR lineage lesson). Seeds outside the
    * graph still emit their dist-0 row.
    */
  def bfs(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0)
    val sym = edges.select(col("u"), col("v"))
      .unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(false)
    var visited = seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint(false)
    var frontier = visited
    var hop = 1L
    while (hop <= maxHops && !frontier.isEmpty) {
      val next = frontier.join(sym, col("node") === col("u"))
        .select(col("v").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("dist", lit(hop))
        .localCheckpoint(false)
      visited = visited.unionByName(next).localCheckpoint(false)
      frontier = next
      hop += 1
    }
    visited
  }

  /** Synchronous label propagation (community detection), `iters` fixed
    * rounds: every node simultaneously adopts its neighbors' most
    * frequent label, ties to the SMALLEST label — fully deterministic,
    * so the trajectory replays relationally step for step. Isolated
    * nodes keep their own id. Per round: one |edges| join + two
    * aggregations; the deterministic argmax is a lexicographic struct
    * max (count, -label), never a window over the corpus.
    */
  def labelPropagation(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 0)
    val ids = nodes.select(col("node")).distinct().localCheckpoint(false)
    val sym = edges.select(col("u"), col("v"))
      .unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(false)
    var labels = ids.withColumn("label", col("node"))
    for (_ <- 1 to iters) {
      val adopted = labels.join(sym, col("node") === col("v"))
        .groupBy(col("u"), col("label")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("u").as("node"))
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("newlab"))
      labels = ids
        .join(labels, "node").join(adopted, Seq("node"), "left")
        .select(col("node"), coalesce(col("newlab"), col("label")).as("label"))
        .localCheckpoint(false)
    }
    labels
  }

  /** k-core extraction (cohesion filtering — the standard "throw away
    * the fringe" device before community/embedding work): `rounds` fixed
    * SIMULTANEOUS peels — every round removes ALL nodes of current
    * degree < k at once — then the survivors with their in-core degree.
    * The simultaneous peel is deterministic and order-free (unlike the
    * sequential min-degree peel), so a FIXED round count replays
    * relationally stage for stage; once the peel reaches the k-core,
    * further rounds are no-ops, so an over-provisioned round count is
    * correctness-neutral (the spec pins convergence on the fixture, and
    * a caller can always add rounds without changing a converged
    * answer).
    *
    * Scale shape: per round ONE |E|-bounded degree aggregation + two
    * semi-joins of the edge set against the survivor set (key-partitioned
    * exchanges bounded by |E|), with per-round localCheckpoint so the
    * lazy chain never re-peels earlier rounds (the MMR lineage lesson).
    * Round count is bounded by the peel depth, which in practice is tiny
    * compared to |V| (it only exceeds O(log n) on path-like fringes).
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    var e = edges.select(col("u"), col("v")).localCheckpoint(false)
    for (_ <- 1 to rounds) {
      val deg = e.select(col("u").as("p"))
        .unionByName(e.select(col("v").as("p")))
        .groupBy("p").agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select("p")
      e = e.join(keep.withColumnRenamed("p", "ku"), col("u") === col("ku"))
        .join(keep.withColumnRenamed("p", "kv"), col("v") === col("kv"))
        .select("u", "v").localCheckpoint(false)
    }
    e.select(col("u").as("node")).unionByName(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("core_deg"))
  }

  /** Weighted single-source(-set) shortest paths — `rounds` fixed
    * Bellman-Ford relaxations over non-negative INTEGER edge weights:
    * every round relaxes every edge simultaneously and keeps the
    * per-node minimum, so the trajectory is deterministic and
    * order-free and a fixed round count replays relationally (the
    * kCore/LPA device). Distances are exact longs — min/+ is
    * associative, no float drift. After r rounds the distances are
    * exact for every node whose shortest path uses ≤ r edges; an
    * over-provisioned r is correctness-neutral once converged.
    *
    * Per round: ONE dist⋈edges join + one node-keyed min aggregate,
    * both bounded by |E|, with per-round localCheckpoint (the MMR
    * lineage lesson). Unreachable nodes are absent.
    */
  def weightedSssp(edges: DataFrame, seeds: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 0)
    val sym = edges.select(col("u"), col("v"), col("w"))
      .unionByName(edges.select(col("v").as("u"), col("u").as("v"),
        col("w")))
      .localCheckpoint(false)
    var dist = seeds.select(col("node")).distinct()
      .withColumn("d", lit(0L)).localCheckpoint(false)
    for (_ <- 1 to rounds) {
      val relaxed = dist.join(sym, col("node") === col("u"))
        .select(col("v").as("node"), (col("d") + col("w")).as("d"))
      dist = dist.unionByName(relaxed)
        .groupBy("node").agg(min("d").as("d"))
        .localCheckpoint(false)
    }
    dist
  }

  /** Link prediction by common neighbors: for every NON-adjacent pair
    * with ≥1 shared neighbor, the shared-neighbor count and Jaccard
    * overlap of neighborhoods in basis points (exact integers). Wedge
    * enumeration through each center node (fan-out bounded by that
    * node's degree), one (u,v) aggregation, an anti-join against the
    * edge set, and two degree lookups (plain equi-joins: the degree
    * table is |V|-sized, so broadcast is AQE's call, not a hint).
    */
  def commonNeighbors(edges: DataFrame): DataFrame = {
    val e = edges.select(col("u"), col("v")).localCheckpoint(false)
    val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
    val deg = sym.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
    val wedges = sym.as("a").join(sym.as("b"),
        col("a.u") === col("b.u") && col("a.v") < col("b.v"))
      .select(col("a.v").as("x"), col("b.v").as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("cn"))
    wedges
      .join(e, col("x") === col("u") && col("y") === col("v"), "left_anti")
      .join(deg.withColumnRenamed("node", "x")
        .withColumnRenamed("deg", "dx"), "x")
      .join(deg.withColumnRenamed("node", "y")
        .withColumnRenamed("deg", "dy"), "y")
      .select(col("x").as("u"), col("y").as("v"), col("cn"),
        expr("(cn * 10000) div (dx + dy - cn)").as("jaccard_bp"))
  }
}
