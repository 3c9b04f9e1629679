package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.queries.Num.{r => rnd}
import graft.operators.AsofJoin.asofJoin

/** Relational / dataflow operator coverage (SURVEY.md §2.3 R1–R15), each
  * expressed Spark-first over the driver's TPC-H-ish tables, each paired
  * with a DuckDB oracle in [[oracleSql]].
  *
  * Conventions for oracle hash-parity:
  *  - every computed double is `rnd(_, 2)` (sums) or `rnd(_, 4)` (avgs)
  *    on BOTH sides, so cross-engine float summation order can't flip a hash
  *    (SURVEY §7.4 item 5);
  *  - timestamps that pass through are CAST to microsecond TIMESTAMP in the
  *    oracle (events.ts is nanos parquet; values are micro-aligned);
  *  - all output columns are explicitly aliased identically on both sides.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // R15/R1: wide aggregation with map-side partial agg (TPC-H Q1 shape).
    "q1_agg" -> ((s, d) => {
      import s.implicits._
      lineitem(s, d)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          rnd(sum($"l_quantity"), 2).as("sum_qty"),
          rnd(sum($"l_extendedprice"), 2).as("sum_base_price"),
          rnd(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
          rnd(avg($"l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    // R1/R2: projection + filter; both reach the parquet scan
    // (PushedFilters + pruned ReadSchema — no arithmetic, exact parity).
    "q2_filter_project" -> ((s, d) => {
      import s.implicits._
      lineitem(s, d)
        .filter($"l_returnflag" === "R" && $"l_quantity" >= 30.0)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
    }),

    // R5: dimension enrichment via explicit broadcast hash joins
    // (customer ⋈ nation ⋈ region) — the atonlist.csv pattern
    // (ais_webSocketServer.py:186-193) at TPC-H shape.
    "q3_broadcast_join" -> ((s, d) => {
      import s.implicits._
      customer(s, d)
        .join(broadcast(nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(region(s, d)), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(count(lit(1)).as("n_cust"), rnd(sum($"c_acctbal"), 2).as("sum_bal"))
    }),

    // R17: large fact-fact equi-join (shuffle join) + aggregation.
    "q4_join_agg" -> ((s, d) => {
      import s.implicits._
      lineitem(s, d)
        .join(orders(s, d), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(
          rnd(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // R7: ordered window + lead — validity-interval construction
    // (ais_analysis.py:444-453: next ts per mmsi, fillna own ts).
    "q5_window_lead" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      events(s, d).select(
        $"user_id", $"event_id", $"ts",
        coalesce(lead($"ts", 1).over(w), $"ts").as("next_ts"))
    }),

    // R6: distinct / count-distinct (zone vessel counting shape,
    // ais_analysis.py:491-492).
    "q6_count_distinct" -> ((s, d) => {
      import s.implicits._
      events(s, d)
        .groupBy($"event_type")
        .agg(countDistinct($"user_id").as("n_users"), count(lit(1)).as("n_events"))
    }),

    // R3: as-of join — latest 'view' at or before each 'purchase', per user
    // (merge_asof semantics, ais_analysis.py:476). Union-window plan: one
    // shuffle, no range-join blowup.
    "q7_asof_join" -> ((s, d) => {
      import s.implicits._
      val ev = events(s, d)
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"event_id".as("p_event_id"))
      val views = ev.filter($"event_type" === "view")
        .select($"user_id", $"ts", $"ts".as("v_ts"))
      asofJoin(purchases, views, on = "ts", by = Seq("user_id"), rightCols = Seq("v_ts"))
        .select($"user_id", $"p_event_id", $"ts".as("p_ts"), $"v_ts")
    }),

    // R12: upsert / last-write-wins by key (IVEF Postgres upsert parity,
    // ais_ivef_lmt_client.py:279-316): latest event per user.
    "q8_last_by_key" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
      events(s, d)
        .withColumn("__rn", row_number().over(w))
        .filter($"__rn" === 1)
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
    }),

    // R17: anti join — customers that never ordered.
    "q9_anti_join" -> ((s, d) => {
      import s.implicits._
      customer(s, d)
        .join(orders(s, d), $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name", $"c_acctbal")
    }),

    // R17: semi join — orders by BUILDING-segment customers.
    "q10_semi_join" -> ((s, d) => {
      import s.implicits._
      orders(s, d)
        .join(
          customer(s, d).filter($"c_mktsegment" === "BUILDING"),
          $"o_custkey" === $"c_custkey", "left_semi")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderdate")
    }),

    // R16-adjacent: deterministic top-k (rounded measure + key tiebreak so
    // cross-engine float ordering can't flip the boundary).
    "q11_topk" -> ((s, d) => {
      import s.implicits._
      lineitem(s, d)
        .join(orders(s, d), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_custkey")
        .agg(rnd(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
        .orderBy($"revenue".desc, $"o_custkey".asc)
        .limit(10)
    }),

    // R10: union-schema alignment (ais_egressServerCH.py:176-191 pattern) —
    // suppliers and customers into one 'party' table.
    "q12_union_align" -> ((s, d) => {
      import s.implicits._
      val sup = supplier(s, d).select(
        $"s_name".as("name"), $"s_acctbal".as("acctbal"),
        $"s_nationkey".as("nationkey"), lit("supplier").as("kind"))
      val cus = customer(s, d).select(
        $"c_name".as("name"), $"c_acctbal".as("acctbal"),
        $"c_nationkey".as("nationkey"), lit("customer").as("kind"))
      sup.unionByName(cus)
    }),

    // R9: content-based routing (ais_egressServerCH.py:138-191) — one input,
    // per-route projections; here summarized as routed aggregates.
    "q13_routing" -> ((s, d) => {
      import s.implicits._
      events(s, d)
        .withColumn("route",
          when($"event_type".isin("click", "view"), "engagement")
            .when($"event_type" === "purchase", "txn")
            .otherwise("ops"))
        .groupBy($"route")
        .agg(count(lit(1)).as("n"), rnd(sum($"value"), 2).as("sum_value"))
    }),

    // q7 through the SQL table function (GraftExtensions.asof_join):
    // same inputs registered as temp views, same union-window plan —
    // the TVF builder delegates to the Scala helper — gated against
    // the SAME DuckDB ASOF JOIN oracle (shared by reference below), so
    // the SQL surface can never drift from the Scala one.
    "q111_asof_sql" -> ((s, d) => {
      import s.implicits._
      val ev = events(s, d)
      ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"event_id".as("p_event_id"))
        .createOrReplaceTempView("q111_purchases")
      ev.filter($"event_type" === "view")
        .select($"user_id", $"ts", $"ts".as("v_ts"))
        .createOrReplaceTempView("q111_views")
      s.sql(
        """SELECT user_id, p_event_id, ts AS p_ts, v_ts
           FROM asof_join('q111_purchases', 'q111_views',
                          'ts', 'user_id', 'v_ts')""")
    }),
  )

  /** The as-of oracle (DuckDB ASOF LEFT JOIN) — ONE string consumed by
    * both the q7 (Scala helper) and q111 (SQL table function) gates.
    */
  private val AsofOracle =
    """SELECT p.user_id, p.event_id AS p_event_id,
       CAST(p.ts AS TIMESTAMP) AS p_ts, CAST(v.ts AS TIMESTAMP) AS v_ts
       FROM (SELECT * FROM events WHERE event_type = 'purchase') p
       ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
       ON p.user_id = v.user_id AND p.ts >= v.ts"""

  val oracleSql: Map[String, String] = Map(
    "q111_asof_sql" -> AsofOracle,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         floor((sum(l_quantity)) * 100 + 0.5) / 100 AS sum_qty,
         floor((sum(l_extendedprice)) * 100 + 0.5) / 100 AS sum_base_price,
         floor((sum(l_extendedprice * (1.0 - l_discount))) * 100 + 0.5) / 100 AS sum_disc_price,
         floor((avg(l_quantity)) * 10000 + 0.5) / 10000 AS avg_qty,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM lineitem WHERE l_returnflag = 'R' AND l_quantity >= 30.0""",
    "q3_broadcast_join" ->
      """SELECT r_name, count(*) AS n_cust, floor((sum(c_acctbal)) * 100 + 0.5) / 100 AS sum_bal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name""",
    "q4_join_agg" ->
      """SELECT o_orderpriority,
         floor((sum(l_extendedprice * (1.0 - l_discount))) * 100 + 0.5) / 100 AS revenue,
         count(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority""",
    "q5_window_lead" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         CAST(coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)
              AS TIMESTAMP) AS next_ts
         FROM events""",
    "q6_count_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
         FROM events GROUP BY event_type""",
    "q7_asof_join" -> AsofOracle,
    "q8_last_by_key" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
         FROM events
         QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""",
    "q9_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "q10_semi_join" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate
         FROM orders
         WHERE EXISTS (SELECT 1 FROM customer
                       WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')""",
    "q11_topk" ->
      """SELECT o_custkey,
         floor((sum(l_extendedprice * (1.0 - l_discount))) * 100 + 0.5) / 100 AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_custkey
         ORDER BY revenue DESC, o_custkey ASC LIMIT 10""",
    "q12_union_align" ->
      """SELECT s_name AS name, s_acctbal AS acctbal, s_nationkey AS nationkey,
                'supplier' AS kind FROM supplier
         UNION ALL
         SELECT c_name, c_acctbal, c_nationkey, 'customer' FROM customer""",
    "q13_routing" ->
      """SELECT CASE WHEN event_type IN ('click','view') THEN 'engagement'
                     WHEN event_type = 'purchase' THEN 'txn'
                     ELSE 'ops' END AS route,
         count(*) AS n, floor((sum(value)) * 100 + 0.5) / 100 AS sum_value
         FROM events GROUP BY 1""",
  )
}
