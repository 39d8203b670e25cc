package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational operator inventory (SURVEY.md §2.2-§2.8) expressed over
  * the driver's TPC-H-ish tables. Role mapping per FIXTURES.md §3:
  * orders/lineitem ≈ submissions/comments, customer ≈ authors.
  *
  * Money/quantity aggregates use the "cents" convention: ROUND(x*100) cast
  * to BIGINT before SUM, so both engines do exact integer arithmetic and
  * hash-compare reliably (doubles are never summed directly).
  */
object RelationalQueries {

  /** ROUND(x*100) -> BIGINT; exact in both engines for 2dp money values. */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1/A2-family hash aggregate with map-side partial agg; at 100 TB this
    // is one shuffle on (l_returnflag, l_linestatus) — low cardinality, so
    // partial aggregation collapses almost all rows before the exchange.
    "q1_agg" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(cents(col("l_quantity"))).as("sum_qty_c"),
          sum(cents(col("l_extendedprice"))).as("sum_price_c"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price_c"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // TPC-H Q3-shape: 3-table join, dim broadcast, ONE fact shuffle.
    "q3_shipping" -> ((s, dir) => q3(s, dir)),

    // TPC-H Q5-shape: 5-table snowflake, dims broadcast down the chain.
    "q5_nation_revenue" -> ((s, dir) => q5(s, dir)),

    // Market-basket association rules: top-20 part pairs by LIFT (with
    // support floor) — support/confidence/lift all exact integer/bp
    // ratios, so the rule ranking is engine-independent. One basket
    // self-join keyed on the order; item counts broadcast.
    "q_affinity" -> ((s, dir) => {
      val baskets = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val itemN = baskets.groupBy("p").agg(count(lit(1)).as("n_item"))
      val nOrders = baskets.select(countDistinct("o").as("n_orders"))
      val pairs = baskets.as("a").join(baskets.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .select(col("a.p").as("u"), col("b.p").as("v"))
        .groupBy("u", "v").agg(count(lit(1)).as("n_pair"))
        .filter(col("n_pair") >= 2)
      pairs
        .join(broadcast(itemN.select(col("p").as("u"), col("n_item").as("n_u"))), "u")
        .join(broadcast(itemN.select(col("p").as("v"), col("n_item").as("n_v"))), "v")
        .crossJoin(broadcast(nOrders))
        .select(col("u"), col("v"), col("n_pair"), col("n_u"), col("n_v"),
          expr("(n_pair * n_orders * 10000) div (n_u * n_v)").as("lift_bp"),
          expr("(n_pair * 10000) div n_u").as("conf_bp"))
        .orderBy(desc("lift_bp"), col("u"), col("v"))
        .limit(20)
    }),

    // ROLLUP hierarchy aggregate (region → nation → ALL), as an
    // aggregation CASCADE: the corpus is shuffled ONCE to the finest
    // (region, nation) grain, then the coarser levels re-aggregate the
    // |nations|-row result — Expand-based ROLLUP would instead push
    // 3× the fact rows through the exchange, so the cascade is the
    // 100 TB-correct plan, not a workaround. Level ids follow the SQL
    // convention: grouping(region)*2 + grouping(nation) ∈ {0, 1, 3}.
    "q_rollup" -> ((s, dir) => {
      val geo = Tables.load(s, dir, "nation")
        .join(Tables.load(s, dir, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name"))
      val cust = Tables.load(s, dir, "customer")
        .join(broadcast(geo), col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "r_name", "n_name")
      val finest = Tables.load(s, dir, "orders")
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("r_name"), col("n_name"),
          cents(col("o_totalprice")).as("price_c"))
        .groupBy("r_name", "n_name")
        .agg(sum("price_c").as("revenue_c"), count(lit(1)).as("n_orders"))
        // dim-bounded (|nations| rows): pin it so the coarser levels
        // re-aggregate the result instead of re-running the fact join.
        .localCheckpoint()
      val lvl0 = finest.select(lit(0L).as("lvl"),
        col("r_name").as("region"), col("n_name").as("nation"),
        col("revenue_c"), col("n_orders"))
      val lvl1 = finest.groupBy("r_name")
        .agg(sum("revenue_c").as("revenue_c"), sum("n_orders").as("n_orders"))
        .select(lit(1L).as("lvl"), col("r_name").as("region"),
          lit("ALL").as("nation"), col("revenue_c"), col("n_orders"))
      val lvl3 = finest
        .agg(sum("revenue_c").as("revenue_c"), sum("n_orders").as("n_orders"))
        .select(lit(3L).as("lvl"), lit("ALL").as("region"),
          lit("ALL").as("nation"), col("revenue_c"), col("n_orders"))
      lvl0.unionByName(lvl1).unionByName(lvl3)
        .orderBy("lvl", "region", "nation")
    }),

    // PIVOT: monthly order counts spread across the 5 priority classes —
    // one shuffle on the month key; the pivot is a single-pass conditional
    // aggregation (never one scan per class).
    "q_pivot" -> ((s, dir) => {
      val pri = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      val named = Seq("n_urgent", "n_high", "n_medium", "n_notspec", "n_low")
      val base = Tables.load(s, dir, "orders").select(
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .cast("long").as("ym"),
        col("o_orderpriority").as("pri"),
        cents(col("o_totalprice")).as("price_c"))
      val piv = base.groupBy("ym").pivot("pri", pri).agg(count(lit(1)))
      val renamed = pri.zip(named).foldLeft(piv) { case (d, (v, n)) =>
        d.withColumnRenamed(v, n)
      }.na.fill(0L, named)
      val totals = base.groupBy("ym")
        .agg(count(lit(1)).as("n_total"), sum("price_c").as("revenue_c"))
      renamed.join(totals, "ym").orderBy("ym")
    }),

    // Data-quality / referential-integrity audit: orphan facts, childless
    // parents, dangling FKs, domain violations, duplicate PKs — each check
    // is an independent anti-join or aggregate (shuffle-bounded by the
    // smaller key set; at 100 TB each runs as one sort-merge/anti pass,
    // and the union of 1-row results is driver-trivial).
    "q_integrity" -> ((s, dir) => {
      val ord = Tables.load(s, dir, "orders")
      val li = Tables.load(s, dir, "lineitem")
      val cust = Tables.load(s, dir, "customer")
      val nat = Tables.load(s, dir, "nation")
      def metric(name: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).cast("long").as("n"))
          .select(lit(name).as("metric"), col("n"))
      val checks = Seq(
        metric("orphan_lineitem",
          li.join(ord, li("l_orderkey") === ord("o_orderkey"), "left_anti")),
        metric("childless_order",
          ord.join(li, ord("o_orderkey") === li("l_orderkey"), "left_anti")),
        metric("dangling_custkey",
          ord.join(cust, ord("o_custkey") === cust("c_custkey"), "left_anti")),
        metric("bad_nationkey",
          cust.join(broadcast(nat),
            cust("c_nationkey") === nat("n_nationkey"), "left_anti")),
        metric("negative_price", li.filter(col("l_extendedprice") < 0)),
        metric("null_orderdate", ord.filter(col("o_orderdate").isNull)),
        metric("dup_pk_orders",
          ord.groupBy("o_orderkey").agg(count(lit(1)).as("c"))
            .filter(col("c") > 1)),
        metric("discount_out_of_range",
          li.filter(col("l_discount") < 0 || col("l_discount") > 1)))
      checks.reduce(_ unionByName _).orderBy("metric")
    }),

    // Privacy-release audit: k-anonymity (k=5) + l-diversity (l=2) over
    // customer quasi-identifiers (nation, market segment), sensitive
    // attribute = account-balance sign. One QI-keyed grouped pass.
    "q_k_anonymity" -> ((s, dir) => {
      graft.operators.Analytics.kAnonymity(
          Tables.load(s, dir, "customer"),
          qis = Seq("c_nationkey", "c_mktsegment"),
          sensitive = (col("c_acctbal") >= 0), k = 5L, l = 2L)
        .orderBy("c_nationkey", "c_mktsegment")
    }),

    // Benford first-digit audit over order totals (fraud/fabrication
    // screen): exact-integer digit extraction (unrolled divisions on
    // cents — no log10 doubles), expected mass as shared bp literals.
    "q_benford" -> ((s, dir) => {
      graft.operators.Analytics.benford(
          Tables.load(s, dir, "orders")
            .select(cents(col("o_totalprice")).as("c"))
            .filter(col("c") > 0), col("c"))
        .orderBy("digit")
    }),

    // 2D skyline (Pareto frontier) of parts: cheapest-for-their-size —
    // the sort+running-max device (O(n log n)), bucketed local pre-filter
    // so the exact global window sees survivors only; the oracle is the
    // NOT EXISTS dominance definition the device avoids.
    "q_skyline" -> ((s, dir) => {
      graft.operators.Analytics.skyline2d(
          Tables.load(s, dir, "part")
            .select(col("p_partkey"), cents(col("p_retailprice")).as("price_c"),
              col("p_size")),
          "p_partkey", col("price_c"), col("p_size"))
        .select(col("p_partkey"), col("x").as("price_c"), col("y").as("size"))
        .orderBy("price_c", "p_partkey")
    }),

    // SCD Type-2 dimension build from the event change log: collapse each
    // user's event_type stream into validity intervals [valid_from,
    // valid_to) with a version counter — ONE shuffle on user_id, all three
    // window passes share the same (key, ts) sort.
    "q_scd2" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      graft.operators.Scd.buildType2(ev, "user_id",
          TimesearchQueries.tsSec(ev), col("event_type"), col("event_id"))
        .orderBy("user_id", "version")
    }),

    // Point-in-time (PIT) dimension lookup — the SCD2 CONSUMING pattern:
    // each purchase fact joins the dimension version valid AT ITS
    // TIMESTAMP. Composes buildType2 with the as-of union-merge device
    // (one key exchange, carry-forward window — no inequality join in
    // the plan; the oracle deliberately IS the inequality join).
    "q_pit_join" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val t = TimesearchQueries.tsSec(ev)
      val dim = graft.operators.Scd.buildType2(ev, "user_id", t,
        col("event_type"), col("event_id"))
      val facts = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), t.as("t"), col("event_id"))
      graft.operators.TemporalJoin.asof(facts, dim, "user_id",
          leftTs = "t", leftId = "event_id",
          rightTs = "valid_from", rightId = "version",
          rightPayload = Seq("attr"), toleranceSec = Long.MaxValue / 4)
        .orderBy("event_id")
    }),

    // Snapshot diff (Delta CDF-style change classification): one
    // full-outer sort-merge join keyed on the order key. The "older"
    // snapshot is derived deterministically from orders in BOTH engines
    // (drop keys ≡0 mod 97 → added; restate price for ≡1 mod 97 →
    // changed; synthesize keys ≡0 mod 101 shifted out of range →
    // removed), so the classification itself is what's hash-gated.
    "q_table_diff" -> ((s, dir) => {
      val base = Tables.load(s, dir, "orders").select(
        col("o_orderkey").as("k"), cents(col("o_totalprice")).as("price_c"),
        col("o_orderstatus").as("status"))
      val older = base.filter(col("k") % 97 =!= 0)
        .withColumn("price_c",
          when(col("k") % 97 === 1, col("price_c") + 1000)
            .otherwise(col("price_c")))
        .unionByName(base.filter(col("k") % 101 === 0)
          .select((col("k") + 2000000000L).as("k"), col("price_c"),
            col("status")))
      graft.operators.Scd.diff(older, base, "k", Seq("price_c", "status"))
        .select("change", "k", "before_price_c", "before_status",
          "after_price_c", "after_status")
        .orderBy("change", "k")
    }),

    // TPC-H Q18 shape (large-volume customers): HAVING-filtered fact
    // aggregate drives the enrichment joins — after the quantity
    // threshold the large-order set is tiny and BROADCASTS into orders/
    // customer, so the only corpus-sized exchange is the lineitem agg.
    "q18_large_orders" -> ((s, dir) => {
      val big = Tables.load(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(cents(col("l_quantity"))).as("qty_c"))
        .filter(col("qty_c") > 25000L)
      Tables.load(s, dir, "orders")
        .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          cents(col("o_totalprice")).as("price_c"), col("qty_c"))
        .orderBy(desc("qty_c"), col("o_orderkey"))
        .limit(100)
    }),

    // Fuzzy (edit-distance) lookup: mangled part names resolved back to
    // their closest catalog entry — probes broadcast, corpus map-only
    // (length-band prune + banded thresholded levenshtein), ONE
    // probe-bounded top-1 aggregate. The probe set is derived
    // deterministically in both engines (first char dropped), so the
    // matcher itself is what's hash-gated.
    "q_fuzzy_lookup" -> ((s, dir) => {
      val part = Tables.load(s, dir, "part")
      val probes = part.filter(col("p_partkey") % 211 === 5)
        .select(col("p_partkey").as("pk"),
          expr("substring(p_name, 2)").as("pn"))
      graft.operators.Fuzzy.fuzzyLookup(part, "p_partkey", "p_name",
          probes, "pk", "pn", maxDist = 3)
        .orderBy("probe_key")
    }),

    // Multi-source BFS hop distances over the support-≥2 co-occurrence
    // graph: frontier expansion, one |frontier⋈edges| join + visited
    // anti-join per hop, frontiers pinned so no hop re-expands. The
    // WITH RECURSIVE oracle replays min-distance independently.
    "q_bfs" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey").distinct()
      val seeds = li.filter(col("l_partkey") % 97 === 0)
        .select(col("l_partkey").as("node")).distinct()
      graft.operators.Graphs.bfs(coEdges(s, dir), seeds, maxHops = 4)
        .orderBy("node")
    }),

    // Synchronous label-propagation communities (4 deterministic rounds,
    // most-frequent neighbor label, ties to the smallest): the argmax is
    // a lexicographic struct max — never a corpus window; the oracle
    // unrolls all 4 rounds as materialized stages.
    "q_lpa" -> ((s, dir) => {
      val e = coEdges(s, dir)
      val nodes = e.select(col("u").as("node"))
        .unionByName(e.select(col("v").as("node"))).distinct()
      graft.operators.Graphs.labelPropagation(nodes, e, iters = 4)
        .orderBy("node")
    }),

    // TPC-H Q10-shape: top-20 customers by revenue from RETURNED items —
    // the returned-line fact filter pushes to the scan, orders⋈lineitem
    // shuffles once on orderkey, the customer enrichment broadcasts.
    "q10_returns" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("rev_c"))
      val ord = Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey")
      val cust = Tables.load(s, dir, "customer").select("c_custkey", "c_name")
      ord.join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_custkey").agg(sum("rev_c").as("revenue_c"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("revenue_c"))
        .orderBy(desc("revenue_c"), col("c_custkey"))
        .limit(20)
    }),

    // Rolling 7-day revenue per order priority via a RANGE window frame
    // over the daily aggregate — the dashboard classic; the window runs
    // on the |days|·|priorities|-bounded daily table, never raw facts.
    "q_rolling" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ord = Tables.load(s, dir, "orders")
      val daily = ord.select(col("o_orderpriority").as("pri"),
          (unix_timestamp(col("o_orderdate")) -
            pmod(unix_timestamp(col("o_orderdate")), lit(86400L))).as("day"),
          cents(col("o_totalprice")).as("rev_c"))
        .groupBy("pri", "day").agg(sum("rev_c").as("rev_c"))
      val w = Window.partitionBy("pri").orderBy(col("day"))
        .rangeBetween(-6L * 86400L, 0L)
      daily
        .withColumn("rolling_7d_c", sum("rev_c").over(w))
        .withColumn("n_days_in_window", count(lit(1)).over(w))
        .orderBy("pri", "day")
    }),

    // Gaps-and-islands: each customer's LONGEST consecutive-day order
    // streak — the run device (day_index − dense row number is constant
    // within a streak) over the |customer-day|-bounded distinct table.
    "q_streaks" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val days = Tables.load(s, dir, "orders")
        .select(col("o_custkey").as("cust"),
          expr("unix_timestamp(o_orderdate) div 86400").as("d"))
        .distinct()
      val runs = days
        .withColumn("rn", row_number().over(
          Window.partitionBy("cust").orderBy("d")))
        .withColumn("grp", col("d") - col("rn"))
        .groupBy("cust", "grp").agg(count(lit(1)).as("len"))
      runs.groupBy("cust").agg(max("len").as("longest_streak"),
          count(lit(1)).as("n_streaks"))
        .filter(col("longest_streak") >= 2)
        .orderBy(desc("longest_streak"), col("cust"))
        .limit(50)
    }),

    // Weighted shortest paths (6 Bellman-Ford rounds) over the support-
    // weighted co-occurrence graph — w = 10000 div support, so stronger
    // ties are shorter; exact long min/+ algebra, unrolled oracle.
    "q_sssp" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey").distinct()
      val we = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2)
        .select(col("u"), col("v"), expr("10000 div c").as("w"))
      val seeds = li.filter(col("l_partkey") % 97 === 0)
        .select(col("l_partkey").as("node")).distinct()
      graft.operators.Graphs.weightedSssp(we, seeds, rounds = 6)
        .orderBy("node")
    }),

    // Item-item collaborative filtering: top-5 neighbors per part by
    // squared-cosine over binary order-basket vectors (no sqrt — the
    // monotone square is an exact integer ratio).
    "q_item_recs" -> ((s, dir) => {
      graft.operators.Recommend.itemNeighbors(
          Tables.load(s, dir, "lineitem")
            .select("l_orderkey", "l_partkey").distinct(),
          "l_orderkey", "l_partkey", k = 5)
        .orderBy("item", "rank")
    }),

    // k-core extraction (k=3, 12 simultaneous-peel rounds — the sf0.01
    // cascade needs 11, extras are no-ops): survivors of the support-≥2
    // co-occurrence graph with their in-core degree. At sf0.1 the
    // 3-core is GENUINELY empty (the support-thresholded graph thins as
    // baskets diversify) — the oracle agrees on emptiness, which is as
    // hash-gateable as any other answer.
    "q_kcore" -> ((s, dir) => {
      graft.operators.Graphs.kCore(coEdges(s, dir), k = 3, rounds = 12)
        .orderBy("node")
    }),

    // Link prediction: top-20 non-adjacent pairs by common-neighbor
    // count + exact Jaccard bp — wedge enumeration per center node,
    // one pair aggregation, anti-join against the edge set.
    "q_link_pred" -> ((s, dir) => {
      graft.operators.Graphs.commonNeighbors(coEdges(s, dir))
        .orderBy(desc("cn"), desc("jaccard_bp"), col("u"), col("v"))
        .limit(20)
    }),

    // Triangle counting over the part co-occurrence graph (parts sharing
    // an order) — market-basket cohesion; degree-ordered exactly-once
    // enumeration, per-part participation top-20.
    "q_triangles" -> ((s, dir) => {
      graft.operators.Graphs.trianglesPerNode(denseEdges(s, dir), k = 20)
        .withColumnRenamed("p", "part")
    }),

    // The SAME triangle count through the non-broadcast wedge close:
    // broadcastMaxEdges=0 forces the (b, c)-partitioned shuffle_hash
    // path — the 100 TB route when |E| exceeds broadcast reach — and the
    // oracle is q_triangles' verbatim, so both closes hash-gate against
    // the one ground truth every round.
    "q_triangles_shuffle" -> ((s, dir) => {
      graft.operators.Graphs.trianglesPerNode(denseEdges(s, dir), k = 20,
          broadcastMaxEdges = 0L)
        .withColumnRenamed("p", "part")
    }),

    // The capped (skew-shed) triangle close: sources whose degeneracy-
    // ordered out-degree exceeds 64 are dropped before wedge generation
    // (the hot-hub protection at 100 TB — a dense community's lowest
    // corner owns its whole wedge explosion), with observe() receipts.
    // Cap 64 is a REAL partial shed on this corpus (~half the sources at
    // sf0.01 and sf0.1), and the oracle replays the full degree-ordered
    // orientation + cap + close relationally, so the shed SEMANTICS —
    // not just the surviving count — hash-gate every round.
    "q_triangles_capped" -> ((s, dir) => {
      val tri = graft.operators.Graphs.trianglesCapped(
        denseEdges(s, dir), wedgeFanoutCap = 64L).localCheckpoint(false)
      tri.select(col("a").as("p"))
        .unionByName(tri.select(col("b").as("p")))
        .unionByName(tri.select(col("c").as("p")))
        .groupBy("p").agg(count(lit(1)).as("n_tri"))
        .orderBy(col("n_tri").desc, col("p").asc)
        .limit(20)
        .withColumnRenamed("p", "part")
    })
  )

  /** Dense part co-occurrence graph (support ≥ 1) for the triangle
    * queries — distinct u < v part pairs sharing an order. */
  private def denseEdges(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
  }

  /** Part co-occurrence graph, support ≥ 2 (parts sharing ≥2 orders):
    * the sparsified community graph q_bfs / q_lpa / q_link_pred run on —
    * support thresholding keeps |edges| stable across SFs (the dense
    * support-1 graph grows ~linearly with the corpus; the repeated-pair
    * signal saturates). One self-join on the order key + one pair agg. */
  private def coEdges(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
      .select("l_orderkey", "l_partkey").distinct()
    li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select("u", "v")
  }

  /** TPC-H Q3-shape: shipping-priority revenue — customer (filtered
    * segment, broadcast-sized) ⋈ orders (date-filtered) ⋈ lineitem; at
    * 100 TB the segment-filtered customer side broadcasts and the
    * orders⋈lineitem equi-join shuffles on orderkey ONCE; map-side
    * partial agg collapses before the group exchange. */
  private val q3 = (s: SparkSession, dir: String) => {
    val cust = Tables.load(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"),
        cents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev_c"))
    ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_orderkey")
      .agg(sum("rev_c").as("revenue_c"))
      .orderBy(desc("revenue_c"), col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-shape: revenue per nation — region→nation (tiny, both
    * broadcast) ⋈ customer ⋈ orders ⋈ lineitem; the only corpus-sized
    * shuffle is orders⋈lineitem on orderkey. */
  private val q5 = (s: SparkSession, dir: String) => {
    val nat = Tables.load(s, dir, "nation")
      .join(Tables.load(s, dir, "region").filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = Tables.load(s, dir, "customer")
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "n_name")
    val ord = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"),
        cents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev_c"))
    ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy("n_name")
      .agg(sum("rev_c").as("revenue_c"), count(lit(1)).as("n_items"))
      .orderBy(desc("revenue_c"), col("n_name"))
  }

  /** q_kcore oracle: the fixed-round simultaneous peel unrolled — per
    * round a degree stage, a survivor stage, and the edge restriction,
    * every stage AS MATERIALIZED (the BPE-oracle CTE-inlining lesson). */
  private def kcoreOracle(k: Int, rounds: Int): String = {
    val head =
      """WITH li AS MATERIALIZED (
           SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e0 AS MATERIALIZED (
           SELECT a.l_partkey AS u, b.l_partkey AS v
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2)"""
    val steps = (0 until rounds).map { t =>
      s"""d$t AS MATERIALIZED (
           SELECT p, count(*) AS deg
           FROM (SELECT u AS p FROM e$t UNION ALL SELECT v FROM e$t)
           GROUP BY p),
         k$t AS MATERIALIZED (SELECT p FROM d$t WHERE deg >= $k),
         e${t + 1} AS MATERIALIZED (
           SELECT u, v FROM e$t
           JOIN k$t a ON e$t.u = a.p
           JOIN k$t b ON e$t.v = b.p)"""
    }
    s"""$head,
       ${steps.mkString(",\n")}
       SELECT p AS node, CAST(count(*) AS BIGINT) AS core_deg
       FROM (SELECT u AS p FROM e$rounds UNION ALL SELECT v FROM e$rounds)
       GROUP BY p ORDER BY node"""
  }

  /** q_benford oracle: digit extraction as the SAME unrolled integer
    * divisions (12 tiny stages), expected mass from the SAME Scala
    * literal table ([[graft.operators.Analytics.benfordExpectedBp]]) —
    * the shared-definition device, so the two engines cannot drift. */
  private def benfordOracle: String = {
    val branches = graft.operators.Analytics.benfordThresholds(12)
      .map(t => s"WHEN c >= $t THEN $t").mkString(" ")
    val expect = graft.operators.Analytics.benfordExpectedBp.zipWithIndex
      .map { case (bp, i) => s"WHEN digit = ${i + 1} THEN $bp" }
      .mkString(" ")
    s"""WITH vals AS (
         SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c
         FROM orders WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 0),
       dig AS (
         SELECT c // (CASE $branches ELSE 1 END) AS digit FROM vals),
       counted AS (
         SELECT digit, CAST(count(*) AS BIGINT) AS n FROM dig
         WHERE digit BETWEEN 1 AND 9 GROUP BY digit),
       tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM counted)
       SELECT digit, n,
              CAST((n * 10000) // nt AS BIGINT) AS obs_bp,
              CAST(CASE $expect END AS BIGINT) AS exp_bp,
              CAST(abs((n * 10000) // nt - CASE $expect END) AS BIGINT) AS dev_bp
       FROM counted CROSS JOIN tot ORDER BY digit"""
  }

  /** q_sssp oracle: fixed Bellman-Ford rounds unrolled — per round one
    * relax + min stage over the weighted symmetric edge list. */
  private def ssspOracle(rounds: Int): String = {
    val head =
      """WITH li AS MATERIALIZED (
           SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         we AS MATERIALIZED (
           SELECT u, v, 10000 // c AS w FROM (
             SELECT a.l_partkey AS u, b.l_partkey AS v,
                    CAST(count(*) AS BIGINT) AS c
             FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
             GROUP BY 1, 2 HAVING count(*) >= 2)),
         sym AS MATERIALIZED (
           SELECT u, v, w FROM we UNION ALL SELECT v, u, w FROM we),
         d0 AS MATERIALIZED (
           SELECT DISTINCT l_partkey AS node, CAST(0 AS BIGINT) AS d
           FROM li WHERE l_partkey % 97 = 0)"""
    val steps = (1 to rounds).map { t =>
      s"""d$t AS MATERIALIZED (
           SELECT node, min(d) AS d FROM (
             SELECT node, d FROM d${t - 1}
             UNION ALL
             SELECT sym.v AS node, p.d + sym.w AS d
             FROM d${t - 1} p JOIN sym ON sym.u = p.node)
           GROUP BY node)"""
    }
    s"""$head,
       ${steps.mkString(",\n")}
       SELECT node, CAST(d AS BIGINT) AS d FROM d$rounds ORDER BY node"""
  }

  val oracles: Map[String, String] = Map(

    "q_kcore" -> kcoreOracle(k = 3, rounds = 12),

    "q_sssp" -> ssspOracle(rounds = 6),

    "q10_returns" ->
      """WITH li AS (
           SELECT l_orderkey,
                  CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS rev_c
           FROM lineitem WHERE l_returnflag = 'R'),
         agg AS (
           SELECT o_custkey, CAST(sum(rev_c) AS BIGINT) AS revenue_c
           FROM orders JOIN li ON o_orderkey = l_orderkey
           GROUP BY 1)
         SELECT c_custkey, c_name, revenue_c
         FROM agg JOIN customer ON o_custkey = c_custkey
         ORDER BY revenue_c DESC, c_custkey LIMIT 20""",

    "q_rolling" ->
      """WITH daily AS (
           SELECT o_orderpriority AS pri,
                  CAST(floor(epoch(o_orderdate)) AS BIGINT)
                    - (CAST(floor(epoch(o_orderdate)) AS BIGINT) % 86400) AS day,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
           FROM orders GROUP BY 1, 2)
         SELECT pri, day, rev_c,
                CAST(sum(rev_c) OVER (PARTITION BY pri ORDER BY day
                  RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW) AS BIGINT)
                  AS rolling_7d_c,
                CAST(count(*) OVER (PARTITION BY pri ORDER BY day
                  RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW) AS BIGINT)
                  AS n_days_in_window
         FROM daily ORDER BY pri, day""",

    "q_streaks" ->
      """WITH days AS (
           SELECT DISTINCT o_custkey AS cust,
                  CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS d
           FROM orders),
         runs AS (
           SELECT cust,
                  d - row_number() OVER (PARTITION BY cust ORDER BY d) AS grp
           FROM days),
         rl AS (SELECT cust, grp, CAST(count(*) AS BIGINT) AS len
                FROM runs GROUP BY 1, 2)
         SELECT cust, CAST(max(len) AS BIGINT) AS longest_streak,
                CAST(count(*) AS BIGINT) AS n_streaks
         FROM rl GROUP BY cust HAVING max(len) >= 2
         ORDER BY longest_streak DESC, cust LIMIT 50""",

    "q_item_recs" ->
      """WITH bi AS MATERIALIZED (
           SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
         ci AS (SELECT i, CAST(count(*) AS BIGINT) AS n_b FROM bi GROUP BY i),
         pairs AS MATERIALIZED (
           SELECT a.i AS i, x.i AS j, CAST(count(*) AS BIGINT) AS c_pair
           FROM bi a JOIN bi x ON a.b = x.b AND a.i < x.i
           GROUP BY 1, 2),
         sym AS (SELECT i, j, c_pair FROM pairs
                 UNION ALL SELECT j, i, c_pair FROM pairs),
         scored AS (
           SELECT sym.i AS item, sym.j AS rec, c_pair,
                  CAST((c_pair * c_pair * 10000) // (ca.n_b * cb.n_b)
                       AS BIGINT) AS cos2_bp
           FROM sym JOIN ci ca ON ca.i = sym.i
                    JOIN ci cb ON cb.i = sym.j)
         SELECT item, CAST(rank AS INT) AS rank, rec, c_pair, cos2_bp
         FROM (SELECT item, rec, c_pair, cos2_bp,
                      row_number() OVER (PARTITION BY item
                        ORDER BY cos2_bp DESC, c_pair DESC, rec ASC) AS rank
               FROM scored)
         WHERE rank <= 5 ORDER BY item, rank""",

    "q_k_anonymity" ->
      """WITH cells AS (
           SELECT c_nationkey, c_mktsegment, (c_acctbal >= 0) AS s,
                  CAST(count(*) AS BIGINT) AS n
           FROM customer GROUP BY 1, 2, 3)
         SELECT c_nationkey, c_mktsegment,
                CAST(sum(n) AS BIGINT) AS class_n,
                CAST(count(*) AS BIGINT) AS l_distinct,
                sum(n) >= 5 AS meets_k,
                count(*) >= 2 AS meets_l
         FROM cells GROUP BY 1, 2
         ORDER BY c_nationkey, c_mktsegment""",

    "q_benford" -> benfordOracle,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
         CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_c,
         CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_price_c,
         COUNT(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "q3_shipping" ->
      """SELECT l.l_orderkey,
                CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c
         FROM customer c
         JOIN orders o ON o.o_custkey = c.c_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         WHERE c.c_mktsegment = 'BUILDING'
           AND o.o_orderdate < TIMESTAMP '1998-01-01'
           AND l.l_shipdate > TIMESTAMP '1998-01-01'
         GROUP BY l.l_orderkey
         ORDER BY revenue_c DESC, l.l_orderkey
         LIMIT 10""",

    "q5_nation_revenue" ->
      """SELECT n.n_name,
                CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c,
                COUNT(*) AS n_items
         FROM region r
         JOIN nation n ON n.n_regionkey = r.r_regionkey
         JOIN customer c ON c.c_nationkey = n.n_nationkey
         JOIN orders o ON o.o_custkey = c.c_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         WHERE r.r_name = 'ASIA'
           AND o.o_orderdate >= TIMESTAMP '1996-01-01'
           AND o.o_orderdate < TIMESTAMP '1999-01-01'
         GROUP BY n.n_name
         ORDER BY revenue_c DESC, n.n_name""",

    "q_affinity" ->
      """WITH baskets AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         itemn AS (SELECT p, CAST(count(*) AS BIGINT) AS n_item FROM baskets GROUP BY p),
         no AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM baskets),
         pairs AS (
           SELECT a.p AS u, b.p AS v, CAST(count(*) AS BIGINT) AS n_pair
           FROM baskets a JOIN baskets b ON a.o = b.o AND a.p < b.p
           GROUP BY a.p, b.p HAVING count(*) >= 2)
         SELECT u, v, n_pair, iu.n_item AS n_u, iv.n_item AS n_v,
                CAST((n_pair * n_orders * 10000) // (iu.n_item * iv.n_item) AS BIGINT) AS lift_bp,
                CAST((n_pair * 10000) // iu.n_item AS BIGINT) AS conf_bp
         FROM pairs
         JOIN itemn iu ON iu.p = u
         JOIN itemn iv ON iv.p = v
         CROSS JOIN no
         ORDER BY lift_bp DESC, u, v LIMIT 20""",

    "q_rollup" ->
      """SELECT CAST(GROUPING(r_name)*2 + GROUPING(n_name) AS BIGINT) AS lvl,
                COALESCE(r_name, 'ALL') AS region,
                COALESCE(n_name, 'ALL') AS nation,
                CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_c,
                COUNT(*) AS n_orders
         FROM orders o
         JOIN customer c ON c.c_custkey = o.o_custkey
         JOIN nation n ON n.n_nationkey = c.c_nationkey
         JOIN region r ON r.r_regionkey = n.n_regionkey
         GROUP BY ROLLUP(r_name, n_name)
         ORDER BY lvl, region, nation""",

    // Independent formulation: explicit conditional aggregation instead of
    // a PIVOT construct — the forms cannot share a bug.
    "q_pivot" ->
      """SELECT CAST(year(o_orderdate)*100 + month(o_orderdate) AS BIGINT) AS ym,
                CAST(count(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
                CAST(count(*) FILTER (o_orderpriority = '2-HIGH') AS BIGINT) AS n_high,
                CAST(count(*) FILTER (o_orderpriority = '3-MEDIUM') AS BIGINT) AS n_medium,
                CAST(count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS n_notspec,
                CAST(count(*) FILTER (o_orderpriority = '5-LOW') AS BIGINT) AS n_low,
                COUNT(*) AS n_total,
                CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_c
         FROM orders GROUP BY 1 ORDER BY ym""",

    "q_integrity" ->
      """SELECT 'bad_nationkey' AS metric, CAST(count(*) AS BIGINT) AS n
           FROM customer c WHERE NOT EXISTS
             (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
         UNION ALL
         SELECT 'childless_order', CAST(count(*) AS BIGINT)
           FROM orders o WHERE NOT EXISTS
             (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
         UNION ALL
         SELECT 'dangling_custkey', CAST(count(*) AS BIGINT)
           FROM orders o WHERE NOT EXISTS
             (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
         UNION ALL
         SELECT 'discount_out_of_range', CAST(count(*) AS BIGINT)
           FROM lineitem WHERE l_discount < 0 OR l_discount > 1
         UNION ALL
         SELECT 'dup_pk_orders', CAST(count(*) AS BIGINT) FROM
           (SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)
         UNION ALL
         SELECT 'negative_price', CAST(count(*) AS BIGINT)
           FROM lineitem WHERE l_extendedprice < 0
         UNION ALL
         SELECT 'null_orderdate', CAST(count(*) AS BIGINT)
           FROM orders WHERE o_orderdate IS NULL
         UNION ALL
         SELECT 'orphan_lineitem', CAST(count(*) AS BIGINT)
           FROM lineitem l WHERE NOT EXISTS
             (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
         ORDER BY metric""",

    "q18_large_orders" ->
      """WITH big AS (
           SELECT l_orderkey,
                  CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS qty_c
           FROM lineitem GROUP BY 1
           HAVING SUM(CAST(round(l_quantity*100) AS BIGINT)) > 25000)
         SELECT c.c_custkey, c.c_name, o.o_orderkey,
                CAST(round(o_totalprice*100) AS BIGINT) AS price_c, qty_c
         FROM big
         JOIN orders o ON o.o_orderkey = big.l_orderkey
         JOIN customer c ON c.c_custkey = o.o_custkey
         ORDER BY qty_c DESC, o.o_orderkey LIMIT 100""",

    "q_fuzzy_lookup" ->
      """WITH probes AS (
           SELECT p_partkey AS pk, substr(p_name, 2) AS pn
           FROM part WHERE p_partkey % 211 = 5),
         cand AS (
           SELECT pk, pn, p_partkey AS mk, p_name AS mn,
                  levenshtein(pn, p_name) AS dist
           FROM probes CROSS JOIN part
           WHERE levenshtein(pn, p_name) <= 3),
         best AS (
           SELECT pk, pn, mk, mn, dist,
                  row_number() OVER (PARTITION BY pk
                    ORDER BY dist, mk) AS rn
           FROM cand)
         SELECT pk AS probe_key, pn AS probe_name, mk AS match_key,
                mn AS match_name, CAST(dist AS BIGINT) AS dist
         FROM best WHERE rn = 1 ORDER BY probe_key""",

    "q_bfs" ->
      """WITH RECURSIVE li AS MATERIALIZED (
           SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e2 AS MATERIALIZED (
           SELECT a.l_partkey AS u, b.l_partkey AS v
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         sym AS MATERIALIZED (
           SELECT u, v FROM e2 UNION ALL SELECT v, u FROM e2),
         seeds AS MATERIALIZED (
           SELECT DISTINCT l_partkey AS node FROM li WHERE l_partkey % 97 = 0),
         bfs(node, dist) AS (
           SELECT node, 0 FROM seeds
           UNION
           SELECT sym.v, b.dist + 1 FROM bfs b
           JOIN sym ON sym.u = b.node WHERE b.dist < 4)
         SELECT node, CAST(min(dist) AS BIGINT) AS dist
         FROM bfs GROUP BY node ORDER BY node""",

    // 4 unrolled synchronous rounds; deterministic argmax replayed as a
    // row_number window (count desc, label asc) — the BPE-oracle
    // materialization device keeps the stage chain linear.
    "q_lpa" ->
      """WITH li AS MATERIALIZED (
           SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e2 AS MATERIALIZED (
           SELECT a.l_partkey AS u, b.l_partkey AS v
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         sym AS MATERIALIZED (
           SELECT u, v FROM e2 UNION ALL SELECT v, u FROM e2),
         l0 AS MATERIALIZED (
           SELECT DISTINCT u AS node, u AS label FROM sym),
         c1 AS MATERIALIZED (
           SELECT sym.u, l.label, count(*) AS c FROM sym
           JOIN l0 l ON l.node = sym.v GROUP BY 1, 2),
         l1 AS MATERIALIZED (
           SELECT u AS node, label FROM (
             SELECT u, label, row_number() OVER
               (PARTITION BY u ORDER BY c DESC, label ASC) AS rn
             FROM c1) WHERE rn = 1),
         c2 AS MATERIALIZED (
           SELECT sym.u, l.label, count(*) AS c FROM sym
           JOIN l1 l ON l.node = sym.v GROUP BY 1, 2),
         l2 AS MATERIALIZED (
           SELECT u AS node, label FROM (
             SELECT u, label, row_number() OVER
               (PARTITION BY u ORDER BY c DESC, label ASC) AS rn
             FROM c2) WHERE rn = 1),
         c3 AS MATERIALIZED (
           SELECT sym.u, l.label, count(*) AS c FROM sym
           JOIN l2 l ON l.node = sym.v GROUP BY 1, 2),
         l3 AS MATERIALIZED (
           SELECT u AS node, label FROM (
             SELECT u, label, row_number() OVER
               (PARTITION BY u ORDER BY c DESC, label ASC) AS rn
             FROM c3) WHERE rn = 1),
         c4 AS MATERIALIZED (
           SELECT sym.u, l.label, count(*) AS c FROM sym
           JOIN l3 l ON l.node = sym.v GROUP BY 1, 2),
         l4 AS MATERIALIZED (
           SELECT u AS node, label FROM (
             SELECT u, label, row_number() OVER
               (PARTITION BY u ORDER BY c DESC, label ASC) AS rn
             FROM c4) WHERE rn = 1)
         SELECT node, label FROM l4 ORDER BY node""",

    "q_link_pred" ->
      """WITH li AS MATERIALIZED (
           SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e2 AS MATERIALIZED (
           SELECT a.l_partkey AS u, b.l_partkey AS v
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         sym AS MATERIALIZED (
           SELECT u, v FROM e2 UNION ALL SELECT v, u FROM e2),
         deg AS MATERIALIZED (
           SELECT u AS node, CAST(count(*) AS BIGINT) AS deg
           FROM sym GROUP BY 1),
         w AS MATERIALIZED (
           SELECT a.v AS x, b.v AS y, CAST(count(*) AS BIGINT) AS cn
           FROM sym a JOIN sym b ON a.u = b.u AND a.v < b.v
           GROUP BY 1, 2),
         nonadj AS (
           SELECT x, y, cn FROM w
           WHERE NOT EXISTS (SELECT 1 FROM e2 WHERE u = x AND v = y))
         SELECT x AS u, y AS v, cn,
                CAST((cn * 10000) // (dx.deg + dy.deg - cn) AS BIGINT) AS jaccard_bp
         FROM nonadj
         JOIN deg dx ON dx.node = x
         JOIN deg dy ON dy.node = y
         ORDER BY cn DESC, jaccard_bp DESC, u, v LIMIT 20""",

    // Dominance ground truth: the quadratic NOT EXISTS definition —
    // deliberately the formulation the windowed device replaces.
    "q_skyline" ->
      """WITH p AS (SELECT p_partkey,
                CAST(round(p_retailprice*100) AS BIGINT) AS price_c,
                CAST(p_size AS BIGINT) AS size
           FROM part)
         SELECT p_partkey, price_c, size FROM p a
         WHERE NOT EXISTS (
           SELECT 1 FROM p b
           WHERE b.price_c <= a.price_c AND b.size >= a.size
             AND (b.price_c < a.price_c OR b.size > a.size))
         ORDER BY price_c, p_partkey""",

    "q_scd2" ->
      """WITH log AS (
           SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
                  event_type AS attr, event_id AS tb
           FROM events),
         runs AS (
           SELECT *, lag(attr) OVER (PARTITION BY user_id ORDER BY ts_sec, tb) AS prev
           FROM log),
         heads AS (
           SELECT user_id, ts_sec, attr, tb FROM runs
           WHERE prev IS NULL OR prev <> attr)
         SELECT user_id, CAST(row_number() OVER w AS BIGINT) AS version, attr,
                ts_sec AS valid_from,
                COALESCE(lead(ts_sec) OVER w, -1) AS valid_to
         FROM heads
         WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, tb)
         ORDER BY user_id, version""",

    // the inequality join the union-merge plan avoids — per fact, the
    // greatest valid_from at-or-before its timestamp (version breaks
    // exact ties, matching the carry-forward's last-right-row rule)
    "q_pit_join" ->
      """WITH log AS (
           SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
                  event_type AS attr, event_id AS tb
           FROM events),
         runs AS (
           SELECT *, lag(attr) OVER (PARTITION BY user_id ORDER BY ts_sec, tb) AS prev
           FROM log),
         heads AS (
           SELECT user_id, ts_sec, attr, tb FROM runs
           WHERE prev IS NULL OR prev <> attr),
         dim AS (
           SELECT user_id, CAST(row_number() OVER w AS BIGINT) AS version,
                  attr, ts_sec AS valid_from
           FROM heads
           WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, tb)),
         facts AS (
           SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id
           FROM events WHERE event_type = 'purchase')
         SELECT event_id, user_id, t, version AS matched_id,
                valid_from AS matched_ts, attr
         FROM (SELECT f.event_id, f.user_id, f.t, d.version, d.valid_from,
                      d.attr,
                      row_number() OVER (PARTITION BY f.event_id
                        ORDER BY d.valid_from DESC, d.version DESC) AS rn
               FROM facts f JOIN dim d
                 ON d.user_id = f.user_id AND d.valid_from <= f.t)
         WHERE rn = 1 ORDER BY event_id""",

    "q_table_diff" ->
      """WITH base AS (
           SELECT o_orderkey AS k,
                  CAST(round(o_totalprice*100) AS BIGINT) AS price_c,
                  o_orderstatus AS status
           FROM orders),
         older AS (
           SELECT k,
                  CASE WHEN k % 97 = 1 THEN price_c + 1000 ELSE price_c END AS price_c,
                  status
           FROM base WHERE k % 97 <> 0
           UNION ALL
           SELECT k + 2000000000, price_c, status FROM base WHERE k % 101 = 0),
         d AS (
           SELECT COALESCE(o.k, n.k) AS k,
                  o.price_c AS before_price_c, o.status AS before_status,
                  n.price_c AS after_price_c, n.status AS after_status,
                  CASE WHEN o.k IS NULL THEN 'added'
                       WHEN n.k IS NULL THEN 'removed'
                       WHEN o.price_c IS DISTINCT FROM n.price_c
                            OR o.status IS DISTINCT FROM n.status THEN 'changed'
                  END AS change
           FROM older o FULL OUTER JOIN base n ON o.k = n.k)
         SELECT change, k, before_price_c, before_status,
                after_price_c, after_status
         FROM d WHERE change IS NOT NULL
         ORDER BY change, k""",

    // Triangle ground truth: the simple id-ordered triple join (the
    // count is orientation-independent, so the oracle can use the naive
    // formulation the degree-ordered operator avoids at scale).
    "q_triangles" -> trianglesOracle,
    // the shuffle-close variant must hit the SAME ground truth — one
    // oracle, two physical close strategies
    "q_triangles_shuffle" -> trianglesOracle,
    "q_triangles_capped" -> trianglesCappedOracle
  )

  private def trianglesOracle =
    """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
               FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey),
         tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
                 FROM e e1
                 JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
                 JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
         corners AS (
           SELECT a AS p FROM tri
           UNION ALL SELECT b FROM tri
           UNION ALL SELECT c FROM tri)
         SELECT p AS part, CAST(count(*) AS BIGINT) AS n_tri
         FROM corners GROUP BY p
         ORDER BY n_tri DESC, part LIMIT 20"""

  /** Relational replay of [[graft.operators.Graphs.trianglesCapped]] at
    * cap 64: unlike [[trianglesOracle]] (orientation-agnostic — any
    * orientation enumerates the same triangle set), the CAPPED result
    * depends on the engine's exact degeneracy order, so the oracle
    * replays it verbatim — degrees, the packed (deg·2³² + id) key, the
    * per-edge orientation, the outdeg ≤ 64 source filter, the kb < kc
    * wedge pairing, and the full-edge-set close. */
  private def trianglesCappedOracle =
    """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
               FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey),
         deg AS (SELECT p, count(*) AS d
                 FROM (SELECT u AS p FROM e UNION ALL SELECT v AS p FROM e)
                 GROUP BY p),
         kk AS (SELECT p, d * 4294967296 + p AS k FROM deg),
         o AS (SELECT CASE WHEN du.k < dv.k THEN e.u ELSE e.v END AS src,
                      CASE WHEN du.k < dv.k THEN e.v ELSE e.u END AS dst,
                      CASE WHEN du.k < dv.k THEN dv.k ELSE du.k END AS kdst
               FROM e JOIN kk du ON du.p = e.u JOIN kk dv ON dv.p = e.v),
         kept AS (SELECT src FROM o GROUP BY src HAVING count(*) <= 64),
         ok AS (SELECT o.src, o.dst, o.kdst FROM o JOIN kept USING (src)),
         tri AS (SELECT w1.src AS a, w1.dst AS b, w2.dst AS c
                 FROM ok w1
                 JOIN ok w2 ON w2.src = w1.src AND w1.kdst < w2.kdst
                 JOIN o e3 ON e3.src = w1.dst AND e3.dst = w2.dst),
         corners AS (SELECT a AS p FROM tri
                     UNION ALL SELECT b FROM tri
                     UNION ALL SELECT c FROM tri)
         SELECT p AS part, CAST(count(*) AS BIGINT) AS n_tri
         FROM corners GROUP BY p
         ORDER BY n_tri DESC, part LIMIT 20"""
}
