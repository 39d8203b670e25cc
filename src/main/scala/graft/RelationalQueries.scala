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

    // Triangle counting over the part co-occurrence graph (parts sharing
    // an order) — market-basket cohesion; degree-ordered exactly-once
    // enumeration, per-part participation top-20.
    "q_triangles" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val edges = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .distinct()
      graft.operators.Graphs.trianglesPerNode(edges, k = 20)
        .withColumnRenamed("p", "part")
    })
  )

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

  val oracles: Map[String, String] = Map(
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

    // Triangle ground truth: the simple id-ordered triple join (the
    // count is orientation-independent, so the oracle can use the naive
    // formulation the degree-ordered operator avoids at scale).
    "q_triangles" ->
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
  )
}
