package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Parity._

/** The relational surface (SURVEY.md §2.2): scans, filters, projections,
  * joins (broadcast / shuffle / semi / anti / outer), aggregations
  * (hash, distinct, rollup/cube), window functions, sorts/limits/top-k,
  * set ops, and the scalar-function zoo — all declared through the
  * DataFrame API so Catalyst plans them (pushdown, pruning, join
  * selection, whole-stage codegen).
  *
  * Scale notes embedded per query; the recurring ones:
  *  - dimension tables are `broadcast()`-hinted: at 100 TB the fact
  *    table never shuffles for a dim join;
  *  - aggregates are partial (map-side) by construction of groupBy.agg;
  *  - every filter/projection sits directly over the scan so it reaches
  *    the parquet reader (PushedFilters / ReadSchema).
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** TPC-H Q1 shape: full-scan partial aggregation, 6 aggregates over
    * 4 groups. At scale: map-side combine reduces 100 TB to ~KBs before
    * the (tiny) shuffle; decimal math keeps results shuffle-order-proof. */
  val q1PricingSummary: Q = Q(
    "q1_pricing_summary",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit(java.sql.Timestamp.valueOf("1998-09-01 00:00:00")))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum(decP($"l_quantity")).as("sum_qty"),
          dsum(decP($"l_extendedprice")).as("sum_base_price"),
          dsum(decP($"l_extendedprice") * (oneR - decR($"l_discount"))).as("sum_disc_price"),
          dsum(decP($"l_extendedprice") * (oneR - decR($"l_discount")) * (oneR + decR($"l_tax")))
            .as("sum_charge"),
          davg(decP($"l_quantity")).as("avg_qty"),
          davg(decP($"l_extendedprice")).as("avg_price"),
          davg(decR($"l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order")
        )
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4))) * (CAST(1 AS DECIMAL(6,4)) + CAST(l_tax AS DECIMAL(6,4)))) AS DOUBLE) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*) AS avg_price,
        CAST(SUM(CAST(l_discount AS DECIMAL(6,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """)
  )

  /** Filter + projection that must reach the parquet scan: `.explain`
    * shows PushedFilters on l_shipdate/l_discount and a 5-column
    * ReadSchema out of 11. */
  val q2FilterProject: Q = Q(
    "q2_filter_project",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter(
          $"l_shipdate" >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")) &&
            $"l_shipdate" < lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
            $"l_discount" >= 0.05 && $"l_quantity" < 24
        )
        .select(
          $"l_orderkey",
          $"l_linenumber",
          to_date($"l_shipdate").as("ship_date"),
          (decP($"l_extendedprice") * decR($"l_discount")).cast("double").as("disc_amount")
        )
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""
      SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date,
        CAST(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(l_discount AS DECIMAL(6,4)) AS DOUBLE) AS disc_amount
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
        AND l_discount >= 0.05 AND l_quantity < 24
      ORDER BY l_orderkey, l_linenumber
    """)
  )

  /** TPC-H Q3 shape: fact-fact shuffle join (orders ⋈ lineitem) plus a
    * broadcast dim filter (customer segment), then top-10. At scale the
    * orders⋈lineitem join co-partitions on orderkey (one shuffle each);
    * customer broadcasts. */
  val q3TopRevenue: Q = Q(
    "q3_top_revenue",
    (s, dir) => {
      import s.implicits._
      val cust = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      // AGGREGATE BEFORE THE JOIN (guide §2.3 "aggregate before you
      // shuffle", §3.1 "check the build side"): written join-first,
      // the planner's file-size estimate put the 600k-row lineitem
      // scan under the broadcast threshold and built the hash relation
      // over the FACT — a single-threaded 600k-row broadcast build —
      // in either join order (the orders⋈customer estimate is a join
      // output, which the planner prices higher than the visible scan).
      // Pre-aggregating per orderkey is value-identical (the decimal
      // revenue sum is exactly associative — the Parity discipline),
      // moves the exchange to 4×-fewer aggregated rows, deletes the
      // post-join groupBy exchange entirely, and leaves only
      // orderkey-sized sides for the planner to broadcast.
      val liAgg = li
        .groupBy($"l_orderkey")
        .agg(
          dsum(decP($"l_extendedprice") * (oneR - decR($"l_discount"))).as("revenue"),
          count(lit(1)).as("n_lines")
        )
      liAgg
        .join(ord.join(broadcast(cust), ord("o_custkey") === cust("c_custkey")),
          liAgg("l_orderkey") === ord("o_orderkey"))
        .select($"o_orderkey", $"revenue", $"n_lines")
        .orderBy($"revenue".desc, $"o_orderkey")
        .limit(10)
    },
    Some("""
      SELECT o_orderkey,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_lines
      FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
      GROUP BY o_orderkey
      ORDER BY revenue DESC, o_orderkey
      LIMIT 10
    """)
  )

  /** EXISTS as a left-semi join (no row multiplication, early-out probe):
    * orders having at least one heavy line item, counted per priority. */
  val q4SemiExists: Q = Q(
    "q4_semi_exists",
    (s, dir) => {
      import s.implicits._
      val ord = t(s, dir, "orders")
      val heavy = t(s, dir, "lineitem").filter($"l_quantity" > 45).select($"l_orderkey")
      ord
        .join(heavy, ord("o_orderkey") === heavy("l_orderkey"), "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy($"o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """)
  )

  /** TPC-H Q5 shape: five-way join. region→nation→customer broadcast
    * down the chain; the only real shuffle is orders⋈lineitem; supplier
    * nation-match filters after a broadcast. */
  val q5RegionRevenue: Q = Q(
    "q5_region_revenue",
    (s, dir) => {
      import s.implicits._
      val region = t(s, dir, "region").filter($"r_name" === "ASIA")
      val nation = t(s, dir, "nation")
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      ord
        .join(li, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(sup),
          li("l_suppkey") === sup("s_suppkey") && cust("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(nation), sup("s_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy($"n_name")
        .agg(dsum(decP($"l_extendedprice") * (oneR - decR($"l_discount"))).as("revenue"))
        .orderBy($"revenue".desc, $"n_name")
    },
    Some("""
      SELECT n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE) AS revenue
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                  JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name
    """)
  )

  /** TPC-H Q6 shape: single-row global aggregate after a tight scan
    * filter — the pushdown + map-side-combine stress test. */
  val q6Forecast: Q = Q(
    "q6_forecast",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter(
          $"l_shipdate" >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")) &&
            $"l_shipdate" < lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
            $"l_discount" >= 0.03 && $"l_discount" <= 0.07 && $"l_quantity" < 24
        )
        .agg(
          dsum(decP($"l_extendedprice") * decR($"l_discount")).as("revenue"),
          count(lit(1)).as("n_rows")
        )
    },
    Some("""
      SELECT
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(l_discount AS DECIMAL(6,4))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_rows
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
        AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
    """)
  )

  /** NOT EXISTS as a left-anti join: customers with no 'P'-status
    * order, by market segment. Anti join broadcasts the smaller
    * distinct key set. */
  val q7AntiJoin: Q = Q(
    "q7_anti_join",
    (s, dir) => {
      import s.implicits._
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders").filter($"o_orderstatus" === "P").select($"o_custkey")
      cust
        .join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy($"c_mktsegment")
    },
    Some("""
      SELECT c_mktsegment, COUNT(*) AS n_customers
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment
    """)
  )

  /** Ranking window: top-2 line items per supplier by extended price.
    * Single shuffle on the partition key; rank evaluated streaming
    * within each sorted partition. */
  val q8WindowRank: Q = Q(
    "q8_window_rank",
    (s, dir) => {
      import s.implicits._
      val w = Window
        .partitionBy($"l_suppkey")
        .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
      t(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 2)
        .select($"l_suppkey", $"rn", $"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .orderBy($"l_suppkey", $"rn")
    },
    Some("""
      SELECT l_suppkey, rn, l_orderkey, l_linenumber, l_extendedprice
      FROM (
        SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
               ROW_NUMBER() OVER (PARTITION BY l_suppkey
                 ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        FROM lineitem
      )
      WHERE rn <= 2
      ORDER BY l_suppkey, rn
    """)
  )

  /** Analytic window with a running frame: cumulative spend per customer
    * over order date. Decimal running sum keeps it order-proof. */
  val q9WindowRunning: Q = Q(
    "q9_window_running",
    (s, dir) => {
      import s.implicits._
      val w = Window
        .partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .withColumn("running_spend", sum(decP($"o_totalprice")).over(w).cast("double"))
        .select($"o_custkey", $"o_orderkey", $"running_spend")
        .orderBy($"o_custkey", $"o_orderkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      FROM orders
      ORDER BY o_custkey, o_orderkey
    """)
  )

  /** ROLLUP grouping sets; grouping keys coalesced to 'ALL' so both
    * engines sort the super-aggregate rows identically. */
  val q10Rollup: Q = Q(
    "q10_rollup",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(decP($"l_quantity")).as("qty"))
        .select(
          coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
          coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
          $"n", $"qty")
        .orderBy($"returnflag", $"linestatus")
    },
    Some("""
      SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
             COALESCE(l_linestatus, 'ALL') AS linestatus,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS qty
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY returnflag, linestatus
    """)
  )

  /** CUBE over order status × priority. */
  val q11Cube: Q = Q(
    "q11_cube",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(decP($"o_totalprice")).as("total"))
        .select(
          coalesce($"o_orderstatus", lit("ALL")).as("status"),
          coalesce($"o_orderpriority", lit("ALL")).as("priority"),
          $"n", $"total")
        .orderBy($"status", $"priority")
    },
    Some("""
      SELECT COALESCE(o_orderstatus, 'ALL') AS status,
             COALESCE(o_orderpriority, 'ALL') AS priority,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS total
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY status, priority
    """)
  )

  /** Set operations: customers active in open orders INTERSECT closed
    * orders, UNION'd with an EXCEPT branch. Distinct set semantics. */
  val q12SetOps: Q = Q(
    "q12_set_ops",
    (s, dir) => {
      import s.implicits._
      val ord = t(s, dir, "orders")
      val open = ord.filter($"o_orderstatus" === "O").select($"o_custkey")
      val closed = ord.filter($"o_orderstatus" === "F").select($"o_custkey")
      val both = open.intersect(closed).withColumn("kind", lit("both"))
      val openOnly = open.except(closed).withColumn("kind", lit("open_only"))
      both.union(openOnly).orderBy($"kind", $"o_custkey")
    },
    Some("""
      SELECT * FROM (
        SELECT o_custkey, 'both' AS kind FROM
          (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
           INTERSECT
           SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        UNION ALL
        SELECT o_custkey, 'open_only' AS kind FROM
          (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
           EXCEPT
           SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      )
      ORDER BY kind, o_custkey
    """)
  )

  /** Distinct aggregates: exact COUNT(DISTINCT) twice + SUM(DISTINCT)
    * on an integral column (exact in both engines). */
  val q13DistinctAgg: Q = Q(
    "q13_distinct_agg",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey").as("n_supps"),
          sum_distinct($"l_linenumber".cast("long")).as("sum_distinct_ln")
        )
        .orderBy($"l_returnflag")
    },
    Some("""
      SELECT l_returnflag,
             COUNT(DISTINCT l_partkey) AS n_parts,
             COUNT(DISTINCT l_suppkey) AS n_supps,
             CAST(SUM(DISTINCT CAST(l_linenumber AS BIGINT)) AS BIGINT) AS sum_distinct_ln
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """)
  )

  /** Scalar-function zoo: string, date-part, math and conditional
    * functions, all codegen'd built-ins (no UDFs). */
  val q14ScalarFns: Q = Q(
    "q14_scalar_fns",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "part")
        .select(
          $"p_partkey",
          lower($"p_name").as("lname"),
          upper($"p_brand").as("ubrand"),
          substring($"p_type", 1, 5).as("type5"),
          length($"p_name").as("name_len"),
          concat_ws("|", $"p_brand", $"p_type").as("brand_type"),
          regexp_replace($"p_name", " ", "_").as("name_u"),
          abs($"p_size" - lit(25)).as("size_dev"),
          (ceil(decP($"p_retailprice"))).cast("long").as("price_ceil"),
          (floor(decP($"p_retailprice"))).cast("long").as("price_floor"),
          when($"p_size" >= 25, lit("large")).otherwise(lit("small")).as("size_class")
        )
        .orderBy($"p_partkey")
    },
    Some("""
      SELECT p_partkey,
             LOWER(p_name) AS lname,
             UPPER(p_brand) AS ubrand,
             SUBSTRING(p_type, 1, 5) AS type5,
             LENGTH(p_name) AS name_len,
             CONCAT_WS('|', p_brand, p_type) AS brand_type,
             REGEXP_REPLACE(p_name, ' ', '_', 'g') AS name_u,
             ABS(p_size - 25) AS size_dev,
             CAST(CEIL(CAST(p_retailprice AS DECIMAL(12,4))) AS BIGINT) AS price_ceil,
             CAST(FLOOR(CAST(p_retailprice AS DECIMAL(12,4))) AS BIGINT) AS price_floor,
             CASE WHEN p_size >= 25 THEN 'large' ELSE 'small' END AS size_class
      FROM part
      ORDER BY p_partkey
    """)
  )

  /** Conditional aggregation + HAVING: per-nation supplier account
    * stats, keeping only nations with more than one supplier. */
  val q15ConditionalAgg: Q = Q(
    "q15_conditional_agg",
    (s, dir) => {
      import s.implicits._
      val sup = t(s, dir, "supplier")
      val nation = t(s, dir, "nation")
      sup
        .join(broadcast(nation), sup("s_nationkey") === nation("n_nationkey"))
        .groupBy($"n_name")
        .agg(
          count(lit(1)).as("n_suppliers"),
          dsum(when($"s_acctbal" > 0, decP($"s_acctbal")).otherwise(lit(0).cast("decimal(12,4)")))
            .as("pos_balance"),
          count(when($"s_acctbal" < 0, 1)).as("n_negative")
        )
        .filter($"n_suppliers" > 1)
        .orderBy($"n_name")
    },
    Some("""
      SELECT n_name, COUNT(*) AS n_suppliers,
             CAST(SUM(CASE WHEN s_acctbal > 0 THEN CAST(s_acctbal AS DECIMAL(12,4)) ELSE CAST(0 AS DECIMAL(12,4)) END) AS DOUBLE) AS pos_balance,
             COUNT(CASE WHEN s_acctbal < 0 THEN 1 END) AS n_negative
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name
      HAVING COUNT(*) > 1
      ORDER BY n_name
    """)
  )

  /** Left-outer join preserving unmatched customers (order count 0). */
  val q16OuterJoin: Q = Q(
    "q16_outer_join",
    (s, dir) => {
      import s.implicits._
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      cust
        .join(ord, cust("c_custkey") === ord("o_custkey"), "left_outer")
        .groupBy($"c_custkey", $"c_mktsegment")
        .agg(
          count($"o_orderkey").as("n_orders"),
          dsum(coalesce(decP($"o_totalprice"), lit(0).cast("decimal(12,4)"))).as("spend")
        )
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey, c_mktsegment, COUNT(o_orderkey) AS n_orders,
             CAST(SUM(COALESCE(CAST(o_totalprice AS DECIMAL(12,4)), CAST(0 AS DECIMAL(12,4)))) AS DOUBLE) AS spend
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_mktsegment
      ORDER BY c_custkey
    """)
  )

  /** Scalar subquery without driver-side collect: the average is
    * computed as a 1-row aggregate and cross-joined (broadcast) into the
    * probe — the distributed idiom for `WHERE x > (SELECT AVG ...)`. */
  val q17ScalarSubquery: Q = Q(
    "q17_scalar_subquery",
    (s, dir) => {
      import s.implicits._
      val ord = t(s, dir, "orders")
      val avgPrice = ord.agg(davg(decP($"o_totalprice")).as("avg_price"))
      ord
        .crossJoin(broadcast(avgPrice))
        .filter($"o_totalprice" > $"avg_price" * 1.5)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*) FROM orders) * 1.5
      ORDER BY o_orderkey
    """)
  )

  def queries: Seq[Q] = Seq(
    q1PricingSummary, q2FilterProject, q3TopRevenue, q4SemiExists,
    q5RegionRevenue, q6Forecast, q7AntiJoin, q8WindowRank, q9WindowRunning,
    q10Rollup, q11Cube, q12SetOps, q13DistinctAgg, q14ScalarFns,
    q15ConditionalAgg, q16OuterJoin, q17ScalarSubquery
  )
}
