package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Data-quality gates a production warehouse runs before anything else
  * trusts the tables: referential-integrity audits, column-constraint
  * audits, and event-stream attribution. The reference engine ships no
  * validation at all (it trusts the oplog wholesale —
  * reference: src/main/java/org/flinkmon/source/MongoDBOplogSource.java:86
  * drains whatever arrives); at 100 TB a corrupt partition upstream
  * silently poisons every downstream join, so these checks are
  * first-class operators with the same oracle discipline as the query
  * families they guard.
  */
object Quality {

  /** Referential-integrity audit across the warehouse's FK spine:
    * lineitem→{orders,part,supplier} and orders→customer, reported as
    * one row per constraint with checked/violation counts.
    *
    * Scale design: the three lineitem FK checks are FUSED into a single
    * pass — one scan of the fact table, part/supplier joined as
    * broadcast left joins (dimension-sized sides), orders as one
    * shuffle left join on the orderkey — then a single conditional
    * aggregate counts the null-matches per FK. A naive four-anti-join
    * formulation scans lineitem three times and shuffles each time; the
    * fused form pays ONE lineitem scan + ONE big shuffle regardless of
    * how many dimension FKs ride along. orders→customer is its own
    * (much smaller) pass with a broadcast dimension. */
  val dqReferential: Q = Q(
    "dq_referential",
    (s, dir) => {
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
        .select($"l_orderkey", $"l_partkey", $"l_suppkey")
      val ord = Tables.load(s, dir, "orders").select($"o_orderkey", $"o_custkey")
      val part = Tables.load(s, dir, "part").select($"p_partkey")
      val supp = Tables.load(s, dir, "supplier").select($"s_suppkey")
      val cust = Tables.load(s, dir, "customer").select($"c_custkey")
      val liRow = li
        .join(broadcast(part), $"l_partkey" === $"p_partkey", "left")
        .join(broadcast(supp), $"l_suppkey" === $"s_suppkey", "left")
        .join(ord.select($"o_orderkey"), $"l_orderkey" === $"o_orderkey", "left")
        .agg(
          count(lit(1)).as("li_checked"),
          sum(when($"o_orderkey".isNull, 1L).otherwise(0L)).as("v_ord"),
          sum(when($"p_partkey".isNull, 1L).otherwise(0L)).as("v_part"),
          sum(when($"s_suppkey".isNull, 1L).otherwise(0L)).as("v_supp"))
      val ordRow = ord
        .join(broadcast(cust), $"o_custkey" === $"c_custkey", "left")
        .agg(count(lit(1)).as("ord_checked"),
          sum(when($"c_custkey".isNull, 1L).otherwise(0L)).as("v_cust"))
      liRow.crossJoin(ordRow)
        .select(expr(
          """stack(4,
             'lineitem_fk_orders',   li_checked,  v_ord,
             'lineitem_fk_part',     li_checked,  v_part,
             'lineitem_fk_supplier', li_checked,  v_supp,
             'orders_fk_customer',   ord_checked, v_cust)
             AS (check_name, checked, violations)"""))
        .withColumn("ok", $"violations" === 0L)
        .orderBy($"check_name")
    },
    Some("""
      WITH li AS (
        SELECT COUNT(*) li_checked,
               SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) v_ord,
               SUM(CASE WHEN p.p_partkey  IS NULL THEN 1 ELSE 0 END) v_part,
               SUM(CASE WHEN s.s_suppkey  IS NULL THEN 1 ELSE 0 END) v_supp
        FROM lineitem l
        LEFT JOIN part p     ON l.l_partkey  = p.p_partkey
        LEFT JOIN supplier s ON l.l_suppkey  = s.s_suppkey
        LEFT JOIN orders o   ON l.l_orderkey = o.o_orderkey
      ),
      o AS (
        SELECT COUNT(*) ord_checked,
               SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) v_cust
        FROM orders ord LEFT JOIN customer c ON ord.o_custkey = c.c_custkey
      ),
      u AS (
        SELECT 'lineitem_fk_orders' check_name, li_checked checked, v_ord violations FROM li
        UNION ALL
        SELECT 'lineitem_fk_part', li_checked, v_part FROM li
        UNION ALL
        SELECT 'lineitem_fk_supplier', li_checked, v_supp FROM li
        UNION ALL
        SELECT 'orders_fk_customer', ord_checked, v_cust FROM o
      )
      SELECT check_name, CAST(checked AS BIGINT) checked,
             CAST(violations AS BIGINT) violations, violations = 0 AS ok
      FROM u ORDER BY check_name
    """)
  )

  /** Column-constraint audit on the fact table: NOT NULL, range, enum,
    * and key-uniqueness expectations, one row per constraint. The
    * fixture's (l_orderkey, l_linenumber) pair genuinely collides, so
    * the uniqueness row fires with a real violation count — the audit
    * demonstrably distinguishes passing from failing constraints.
    *
    * Scale design: every row-local constraint is ONE conditional
    * aggregate over ONE scan (a 100 TB audit adds columns, not passes);
    * uniqueness is the only keyed check and deliberately runs as a
    * two-level aggregate — groupBy(key).count then sum(n-1) — so the
    * plan carries a partial-agg map-side combine and no Expand, the
    * same no-Expand discipline as events_k_anonymity. Violations for
    * uniqueness = surplus rows beyond one per key. */
  val dqConstraints: Q = Q(
    "dq_constraints",
    (s, dir) => {
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
      def bad(c: org.apache.spark.sql.Column) = sum(when(c, 1L).otherwise(0L))
      val rowLocal = li.agg(
        count(lit(1)).as("checked"),
        bad($"l_orderkey".isNull || $"l_linenumber".isNull).as("v_key_null"),
        bad(!($"l_quantity" > 0.0)).as("v_qty_range"),
        bad(!($"l_discount" >= 0.0 && $"l_discount" <= 0.1)).as("v_disc_range"),
        bad(!($"l_tax" >= 0.0)).as("v_tax_range"),
        bad(!$"l_returnflag".isin("A", "N", "R")).as("v_rflag_enum"),
        bad(!$"l_linestatus".isin("O", "F")).as("v_lstatus_enum"))
      val uniq = li.groupBy($"l_orderkey", $"l_linenumber")
        .agg(count(lit(1)).as("n"))
        .agg(coalesce(sum($"n" - 1L), lit(0L)).as("v_uniq"))
      rowLocal.crossJoin(uniq)
        .select(expr(
          """stack(7,
             'key_not_null',        checked, v_key_null,
             'key_unique',          checked, v_uniq,
             'quantity_positive',   checked, v_qty_range,
             'discount_in_0_0.1',   checked, v_disc_range,
             'tax_non_negative',    checked, v_tax_range,
             'returnflag_in_ANR',   checked, v_rflag_enum,
             'linestatus_in_OF',    checked, v_lstatus_enum)
             AS (check_name, checked, violations)"""))
        .withColumn("ok", $"violations" === 0L)
        .orderBy($"check_name")
    },
    Some("""
      WITH r AS (
        SELECT COUNT(*) checked,
          SUM(CASE WHEN l_orderkey IS NULL OR l_linenumber IS NULL THEN 1 ELSE 0 END) v_key_null,
          SUM(CASE WHEN NOT (l_quantity > 0.0) THEN 1 ELSE 0 END) v_qty_range,
          SUM(CASE WHEN NOT (l_discount >= 0.0 AND l_discount <= 0.1) THEN 1 ELSE 0 END) v_disc_range,
          SUM(CASE WHEN NOT (l_tax >= 0.0) THEN 1 ELSE 0 END) v_tax_range,
          SUM(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) v_rflag_enum,
          SUM(CASE WHEN l_linestatus NOT IN ('O','F') THEN 1 ELSE 0 END) v_lstatus_enum
        FROM lineitem
      ),
      uq AS (
        SELECT COALESCE(SUM(n - 1), 0) v_uniq
        FROM (SELECT COUNT(*) n FROM lineitem GROUP BY l_orderkey, l_linenumber)
      ),
      u AS (
        SELECT 'key_not_null' check_name, checked, v_key_null violations FROM r
        UNION ALL SELECT 'key_unique', checked, v_uniq FROM r, uq
        UNION ALL SELECT 'quantity_positive', checked, v_qty_range FROM r
        UNION ALL SELECT 'discount_in_0_0.1', checked, v_disc_range FROM r
        UNION ALL SELECT 'tax_non_negative', checked, v_tax_range FROM r
        UNION ALL SELECT 'returnflag_in_ANR', checked, v_rflag_enum FROM r
        UNION ALL SELECT 'linestatus_in_OF', checked, v_lstatus_enum FROM r
      )
      SELECT check_name, CAST(checked AS BIGINT) checked,
             CAST(violations AS BIGINT) violations, violations = 0 AS ok
      FROM u ORDER BY check_name
    """)
  )

  /** Last-touch attribution: every purchase is credited to the user's
    * most recent view/click within the preceding 7 days, else to
    * 'direct' — the conversion-accounting query behind every marketing
    * events pipeline.
    *
    * Scale design: NO join at all. Touches and conversions ride one
    * user_id-partitioned window (the only exchange); the carried state
    * is last(touch_ts)/last(touch_type) with ignoreNulls over rows
    * UNBOUNDED PRECEDING..CURRENT — a streaming-friendly O(1)-per-row
    * frame, never a per-purchase lookback scan. Ties at equal ts order
    * deterministically by event_id. Money is exact integer cents
    * (round(value*100)) end to end — no float summation drift. */
  val eventsAttribution: Q = Q(
    "events_attribution",
    (s, dir) => {
      import s.implicits._
      val sevenDaysUs = 7L * 86400L * 1000000L
      val ev = Tables.load(s, dir, "events")
        .select($"user_id", $"ts", $"event_id", $"event_type",
          round($"value" * 100).cast("long").as("c"))
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val isTouch = $"event_type".isin("view", "click")
      val t = ev
        .withColumn("t_ts", last(when(isTouch, $"ts"), ignoreNulls = true).over(w))
        .withColumn("t_type", last(when(isTouch, $"event_type"), ignoreNulls = true).over(w))
      t.filter($"event_type" === "purchase")
        .withColumn("channel",
          when($"t_ts".isNotNull &&
            (unix_micros($"ts") - unix_micros($"t_ts") <= sevenDaysUs), $"t_type")
            .otherwise(lit("direct")))
        .groupBy($"channel")
        .agg(count(lit(1)).as("n_purchases"), sum($"c").as("value_cents"))
        .orderBy($"channel")
    },
    Some("""
      WITH ev AS (
        SELECT user_id, ts, event_id, event_type,
               CAST(ROUND(value * 100) AS BIGINT) c
        FROM events
      ),
      t AS (
        SELECT *,
          last_value(CASE WHEN event_type IN ('view','click') THEN ts END IGNORE NULLS)
            OVER w AS t_ts,
          last_value(CASE WHEN event_type IN ('view','click') THEN event_type END IGNORE NULLS)
            OVER w AS t_type
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      )
      SELECT CASE WHEN t_ts IS NOT NULL
                   AND epoch_us(ts) - epoch_us(t_ts) <= 604800000000
                  THEN t_type ELSE 'direct' END AS channel,
             CAST(COUNT(*) AS BIGINT) n_purchases,
             CAST(SUM(c) AS BIGINT) value_cents
      FROM t WHERE event_type = 'purchase'
      GROUP BY 1 ORDER BY 1
    """)
  )

  /** VOLUME-DRIFT GATE between corpus snapshot versions: per
    * (source, lang) stratum, compare the v1→v2 document counts (the
    * [[graft.operators.Pipeline]] snapshot-diff derivation of the two
    * versions) and flag any stratum whose volume moved more than 10%
    * — the "did the refresh silently drop a source" monitor a
    * versioned training pipeline runs BEFORE content-level checks
    * (text_jsd_drift) ever see the data: a crawler auth failure or a
    * bad partition filter shows up as volume drift first. Drift is
    * exact integer ppm (`(c2−c1)·10⁶ div c1`); strata appearing or
    * disappearing outright are their own statuses ('new' / 'gone', no
    * division), so the row set is hash-exact.
    *
    * Scale shape: two partial-aggregated counts over the stratum key
    * (map-side combined — counts, not rows, cross the exchange) and a
    * stratum-sized full-outer join; nothing corpus-sized moves. */
  val dqVolumeDrift: Q = Q(
    "dq_volume_drift",
    (s, dir) => {
      import s.implicits._
      val d = Tables.load(s, dir, "documents")
      val h = substring(md5($"doc_id".cast("string")), 1, 1)
      val c1 = d.filter(h =!= "f").groupBy($"source", $"lang")
        .agg(count(lit(1)).as("c1"))
      val c2 = d.filter(h =!= "0").groupBy($"source", $"lang")
        .agg(count(lit(1)).as("c2"))
      c1.join(c2, Seq("source", "lang"), "full_outer")
        .select($"source", $"lang",
          coalesce($"c1", lit(0L)).as("c1"), coalesce($"c2", lit(0L)).as("c2"))
        .withColumn("drift_ppm",
          when($"c1" > 0L && $"c2" > 0L, expr("((c2 - c1) * 1000000L) div c1")))
        .withColumn("status",
          when($"c1" === 0L, "new")
            .when($"c2" === 0L, "gone")
            .when(abs($"drift_ppm") > 100000L, "drift")
            .otherwise("ok"))
        .orderBy($"source", $"lang")
    },
    Some("""
      WITH v1 AS (
        SELECT source, lang, COUNT(*) c1 FROM documents
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> 'f'
        GROUP BY 1, 2
      ),
      v2 AS (
        SELECT source, lang, COUNT(*) c2 FROM documents
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> '0'
        GROUP BY 1, 2
      ),
      j AS (
        SELECT COALESCE(v1.source, v2.source) source,
               COALESCE(v1.lang, v2.lang) lang,
               COALESCE(c1, 0) c1, COALESCE(c2, 0) c2
        FROM v1 FULL OUTER JOIN v2
          ON v1.source = v2.source AND v1.lang = v2.lang
      ),
      dr AS (
        SELECT source, lang, CAST(c1 AS BIGINT) c1, CAST(c2 AS BIGINT) c2,
               CASE WHEN c1 > 0 AND c2 > 0
                    THEN CAST(((c2 - c1) * 1000000) // c1 AS BIGINT) END drift_ppm
        FROM j
      )
      SELECT source, lang, c1, c2, drift_ppm,
             CASE WHEN c1 = 0 THEN 'new'
                  WHEN c2 = 0 THEN 'gone'
                  WHEN abs(drift_ppm) > 100000 THEN 'drift'
                  ELSE 'ok' END AS status
      FROM dr
      ORDER BY source, lang
    """)
  )

  /** The shared touch×purchase frame for MULTI-TOUCH attribution: each
    * purchase LEFT-joined to every view/click of its user strictly
    * before it (by the batch rule's (ts, event_id) order) and within
    * the trailing 7 days, plus its per-purchase touch count `n` and
    * touch rank `rk` (1 = earliest). Purchases with no window touch
    * keep one null-touch row → the 'direct' channel.
    *
    * Scale shape: ONE equi-join keyed on user_id (the range and order
    * predicates ride along as join filters — no cartesian, no second
    * exchange: the per-purchase windows partition by (user_id, p_id),
    * a strict refinement of the join key, so rank and count reuse the
    * join's partitioning); per-user touch×purchase fan-out is bounded
    * by per-user activity in the 7-day window, the same bound the
    * streaming buffer state carries (streaming/AttributionStream). */
  private def touchFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.load(s, dir, "events")
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id", $"event_type",
        round($"value" * 100).cast("long").as("c"))
    val t = ev.filter($"event_type".isin("view", "click"))
      .select($"user_id".as("t_user"), $"us".as("t_us"), $"event_id".as("t_id"),
        $"event_type".as("t_type"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"us".as("p_us"), $"event_id".as("p_id"), $"c")
    val j = p.join(t,
      $"user_id" === $"t_user" &&
        ($"t_us" < $"p_us" || ($"t_us" === $"p_us" && $"t_id" < $"p_id")) &&
        $"p_us" - $"t_us" <= lit(7L * 86400L * 1000000L),
      "left")
      .select($"user_id", $"p_us", $"p_id", $"c", $"t_us", $"t_id", $"t_type")
    val per = Window.partitionBy($"user_id", $"p_id")
    j.withColumn("n", count($"t_id").over(per))
      .withColumn("rk", row_number().over(per.orderBy($"t_us".asc_nulls_first,
        $"t_id".asc_nulls_first)))
  }

  /** The same frame in DuckDB, ending in CTE
    * `f(user_id, p_us, p_id, c, t_us, t_id, t_type, n, rk)`. */
  private val touchFrameSql =
    """ev AS (
        SELECT user_id, epoch_us(ts) us, event_id, event_type,
               CAST(ROUND(value * 100) AS BIGINT) c
        FROM events
      ),
      t AS (SELECT user_id, us t_us, event_id t_id, event_type t_type
            FROM ev WHERE event_type IN ('view','click')),
      p AS (SELECT user_id, us p_us, event_id p_id, c
            FROM ev WHERE event_type = 'purchase'),
      f AS (
        SELECT p.user_id, p.p_us, p.p_id, p.c, t.t_us, t.t_id, t.t_type,
               COUNT(t.t_id) OVER w n,
               ROW_NUMBER() OVER (PARTITION BY p.user_id, p.p_id
                 ORDER BY t.t_us ASC NULLS FIRST, t.t_id ASC NULLS FIRST) rk
        FROM p LEFT JOIN t
          ON p.user_id = t.user_id
         AND (t.t_us < p.p_us OR (t.t_us = p.p_us AND t.t_id < p.p_id))
         AND p.p_us - t.t_us <= 604800000000
        WINDOW w AS (PARTITION BY p.user_id, p.p_id)
      )"""

  /** POSITION-BASED (U-shaped) multi-touch attribution: the credit
    * model marketing analytics reaches for right after last-touch
    * ([[eventsAttribution]]) — 40% of each purchase to the FIRST touch
    * in its 7-day window, 40% to the LAST, the remaining 20% split
    * evenly across the middle touches (collapsing to 100% / 50%+50%
    * when the window holds one / two touches; no touch → 'direct').
    * Credits are exact integer micro-units with the identical CASE
    * shape on both engines (the 20% split is `200000 div (n−2)` —
    * truncating division, deterministic), so per-channel sums are
    * hash-exact; `value_micro_cents` weights each purchase's cents by
    * its touches' credit shares.
    *
    * Scale shape: [[touchFrame]]'s one user-keyed join + its reused
    * partitioning, then ONE channel aggregation (map-side combined). */
  val eventsAttributionPosition: Q = Q(
    "events_attribution_position",
    (s, dir) => {
      import s.implicits._
      touchFrame(s, dir)
        .withColumn("credit_micro", expr("""
          CASE WHEN t_id IS NULL THEN 1000000L
               WHEN n = 1 THEN 1000000L
               WHEN n = 2 THEN 500000L
               WHEN rk = 1 OR rk = n THEN 400000L
               ELSE 200000L div (n - 2)
          END"""))
        .withColumn("channel", coalesce($"t_type", lit("direct")))
        .groupBy($"channel")
        .agg(count(lit(1)).as("n_credits"),
          sum($"credit_micro").as("credit_micro_sum"),
          sum($"c" * $"credit_micro").as("value_micro_cents"))
        .orderBy($"channel")
    },
    Some(s"""
      WITH $touchFrameSql
      SELECT COALESCE(t_type, 'direct') AS channel,
             CAST(COUNT(*) AS BIGINT) n_credits,
             CAST(SUM(CASE WHEN t_id IS NULL THEN 1000000
                           WHEN n = 1 THEN 1000000
                           WHEN n = 2 THEN 500000
                           WHEN rk = 1 OR rk = n THEN 400000
                           ELSE 200000 // (n - 2) END) AS BIGINT) credit_micro_sum,
             CAST(SUM(c * (CASE WHEN t_id IS NULL THEN 1000000
                           WHEN n = 1 THEN 1000000
                           WHEN n = 2 THEN 500000
                           WHEN rk = 1 OR rk = n THEN 400000
                           ELSE 200000 // (n - 2) END)) AS BIGINT) value_micro_cents
      FROM f
      GROUP BY 1 ORDER BY 1
    """)
  )

  /** TIME-DECAY multi-touch attribution: each touch in a purchase's
    * 7-day window earns weight 2^(6−age_days) (integer halving per
    * elapsed day — ages 0..6 map to weights 64..1), and the purchase's
    * credit splits proportionally: `credit = (10⁶·w) div Σw`. All
    * integer (shift arithmetic + truncating division with identical
    * shape on both engines), so the oracle is hash-exact; a purchase
    * with no window touch credits 'direct' wholesale.
    *
    * Scale shape: identical to [[eventsAttributionPosition]] — the
    * per-purchase weight sum is one more window over the SAME
    * (user_id, p_id) partitioning, then one channel aggregation. */
  val eventsAttributionTimeDecay: Q = Q(
    "events_attribution_timedecay",
    (s, dir) => {
      import s.implicits._
      val per = Window.partitionBy($"user_id", $"p_id")
      touchFrame(s, dir)
        .withColumn("w", expr(
          "CASE WHEN t_id IS NULL THEN 0L ELSE shiftleft(1L, 6 - CAST(least((p_us - t_us) div 86400000000L, 6L) AS INT)) END"))
        .withColumn("sw", sum($"w").over(per))
        .withColumn("credit_micro", expr(
          "CASE WHEN t_id IS NULL THEN 1000000L ELSE (1000000L * w) div sw END"))
        .withColumn("channel", coalesce($"t_type", lit("direct")))
        .groupBy($"channel")
        .agg(count(lit(1)).as("n_credits"),
          sum($"credit_micro").as("credit_micro_sum"),
          sum($"c" * $"credit_micro").as("value_micro_cents"))
        .orderBy($"channel")
    },
    Some(s"""
      WITH $touchFrameSql,
      wts AS (
        SELECT *,
               CASE WHEN t_id IS NULL THEN 0
                    ELSE (1::BIGINT << (6 - LEAST((p_us - t_us) // 86400000000, 6))) END AS w
        FROM f
      ),
      sw AS (
        SELECT *, SUM(w) OVER (PARTITION BY user_id, p_id) sw FROM wts
      )
      SELECT COALESCE(t_type, 'direct') AS channel,
             CAST(COUNT(*) AS BIGINT) n_credits,
             CAST(SUM(CASE WHEN t_id IS NULL THEN 1000000
                           ELSE (1000000 * w) // sw END) AS BIGINT) credit_micro_sum,
             CAST(SUM(c * (CASE WHEN t_id IS NULL THEN 1000000
                           ELSE (1000000 * w) // sw END)) AS BIGINT) value_micro_cents
      FROM sw
      GROUP BY 1 ORDER BY 1
    """)
  )

  /** ACTIVE-USER CURVES: exact DAU and trailing-7-day WAU per observed
    * day — the engagement staple every product warehouse serves. Days
    * are TZ-free epoch-day integers (`unix_micros div 86.4e9`, the
    * [[graft.operators.Pipeline]] retention discipline). WAU is EXACT:
    * the distinct (user, day) frame fans out to the 7 trailing report
    * days (a bounded ×7 explode of an already-deduplicated frame —
    * far smaller than the event log) and re-deduplicates per report
    * day; the approximate path at planet scale swaps the distinct for
    * the mergeable HLL sketch (`hll_distinct`'s machinery), documented
    * not needed while (users × days) fits an exchange.
    *
    * Scale shape: one (user, day) distinct agg (map-side combined),
    * the ×7 generate, then one day-keyed distinct count; report days
    * are calendar-bounded, so the final frame is tiny. */
  val eventsActiveUsers: Q = Q(
    "events_active_users",
    (s, dir) => {
      import s.implicits._
      val ud = Tables.load(s, dir, "events")
        .select($"user_id",
          expr("unix_micros(ts) div 86400000000L").as("d"))
        .distinct()
      val days = ud.select($"d").distinct()
      val dau = ud.groupBy($"d").agg(count(lit(1)).as("dau"))
      val wau = ud
        .select($"user_id", explode(expr("sequence(0L, 6L)")).as("off"), $"d")
        .select($"user_id", ($"d" + $"off").as("d"))
        .join(days, "d")   // only observed report days
        .groupBy($"d").agg(count_distinct($"user_id").as("wau"))
      dau.join(wau, "d")
        .select($"d".as("epoch_day"), $"dau", $"wau")
        .orderBy($"epoch_day")
    },
    Some("""
      WITH ud AS (
        SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d
        FROM events
      ),
      days AS (SELECT DISTINCT d FROM ud),
      dau AS (SELECT d, COUNT(*) dau FROM ud GROUP BY 1),
      w AS (
        SELECT ud.user_id, ud.d + o.k AS d
        FROM ud, (SELECT unnest(range(0, 7)) k) o
      ),
      wau AS (
        SELECT w.d, COUNT(DISTINCT w.user_id) wau
        FROM w JOIN days ON w.d = days.d
        GROUP BY 1
      )
      SELECT dau.d AS epoch_day, CAST(dau AS BIGINT) dau, CAST(wau AS BIGINT) wau
      FROM dau JOIN wau ON dau.d = wau.d
      ORDER BY epoch_day
    """)
  )

  /** The MERGEABLE-SKETCH twin of [[eventsActiveUsers]]' WAU — the
    * promised scale path shipping, hash-gated like every other
    * family's production twin: the trailing-week distinct-user count
    * per day via the deterministic md5-HLL
    * ([[graft.operators.Advanced]] `md5HllEst`, 256 registers),
    * reported beside the exact count so the error is visible in the
    * row. Sketch registers are O(256) per report day and MERGE
    * associatively — at planet scale each day's register vector is
    * built once and the 7-day union is a register-wise max, never a
    * re-scan; here the fan-out feeds the same estimator, which is
    * value-identical because max-merge commutes with the fan-out.
    * Deterministic md5 keeps the whole row SQL-expressible, so unlike
    * native approx_count_distinct this sketch is fully oracled. */
  val eventsActiveUsersHll: Q = Q(
    "events_active_users_hll",
    (s, dir) => {
      import s.implicits._
      val ud = Tables.load(s, dir, "events")
        .select($"user_id",
          expr("unix_micros(ts) div 86400000000L").as("d"))
        .distinct()
      val days = ud.select($"d").distinct()
      val fanned = ud
        .select($"user_id", explode(expr("sequence(0L, 6L)")).as("off"), $"d")
        .select($"user_id", ($"d" + $"off").as("d"))
        .join(days, "d")
      val est = Advanced.md5HllEst(
        fanned.select($"d".as("grp"), md5($"user_id".cast("string")).as("hx")))
      val exact = fanned.groupBy($"d".as("grp"))
        .agg(count_distinct($"user_id").as("wau_exact"))
      est.join(exact, "grp")
        .selectExpr("grp AS epoch_day",
          "CAST(present AS INT) AS registers_present",
          """CAST(ROUND(CASE WHEN e_raw <= 640.0 AND present < 256
            |  THEN 256.0 * ln(256.0 / (256.0 - present))
            |  ELSE e_raw END) AS BIGINT) AS wau_hll""".stripMargin,
          "wau_exact")
        .orderBy($"epoch_day")
    },
    Some("""
      WITH ud AS (
        SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d
        FROM events
      ),
      days AS (SELECT DISTINCT d FROM ud),
      fanned AS (
        SELECT w.user_id, w.d
        FROM (SELECT ud.user_id, ud.d + o.k AS d
              FROM ud, (SELECT unnest(range(0, 7)) k) o) w
        JOIN days ON w.d = days.d
      ),
      h AS (SELECT d AS grp, md5(CAST(user_id AS VARCHAR)) AS hx FROM fanned),
      b AS (
        SELECT grp,
               CAST((strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 16
                    + (strpos('0123456789abcdef', substring(hx, 2, 1)) - 1) AS INT) AS idx,
               substring(hx, 3, 14) AS suffix
        FROM h
      ),
      zb AS (
        SELECT grp, idx,
               CAST(length(regexp_extract(suffix, '^0*')) AS INT) AS z, suffix
        FROM b
      ),
      nb AS (
        SELECT grp, idx, z,
               (strpos('0123456789abcdef', substring(suffix, z + 1, 1)) - 1) AS nv
        FROM zb
      ),
      r AS (
        SELECT grp, idx,
               CASE WHEN z >= 14 THEN 57
                    ELSE CAST(z * 4 + (CASE WHEN nv >= 8 THEN 0 WHEN nv >= 4 THEN 1
                                            WHEN nv >= 2 THEN 2 ELSE 3 END) + 1 AS INT)
               END AS rho
        FROM nb
      ),
      m AS (SELECT grp, idx, MAX(rho) AS mr FROM r GROUP BY grp, idx),
      agg AS (
        SELECT grp, COUNT(*) AS present, SUM(pow(2.0, -mr)) AS sum_present
        FROM m GROUP BY grp
      ),
      est AS (
        SELECT grp, present,
               (CAST(0.7213 AS DOUBLE) / (1.0 + CAST(1.079 AS DOUBLE) / 256.0)) * 65536.0
                 / (sum_present + (256.0 - present)) AS e_raw
        FROM agg
      ),
      ex AS (SELECT d AS grp, COUNT(DISTINCT user_id) AS wau_exact
             FROM fanned GROUP BY 1)
      SELECT est.grp AS epoch_day,
             CAST(present AS INT) AS registers_present,
             CAST(ROUND(CASE WHEN e_raw <= 640.0 AND present < 256
                             THEN 256.0 * ln(256.0 / (256.0 - present))
                             ELSE e_raw END) AS BIGINT) AS wau_hll,
             wau_exact
      FROM est JOIN ex ON est.grp = ex.grp
      ORDER BY epoch_day
    """)
  )

  /** A/B experiment readout: users assigned to variants by the
    * content-addressed md5 bucket (the `split_assign` discipline — no
    * RNG, no seed coordination, reproducible across engines and
    * cluster sizes), conversion = total purchase value above $600,
    * reported as one row with exact integer counts/rates plus a
    * two-proportion z-test. The z statistic is the ONE float in the
    * row and is micro-rounded once from [[zSql]] — the SAME SQL text
    * evaluated by both engines (division and sqrt are correctly-
    * rounded IEEE ops, so identical inputs give identical doubles);
    * the degenerate all-convert/none-convert pool reads z = 0 on both
    * sides instead of NaN.
    *
    * Scale design: one user_id exchange (the per-user conversion agg),
    * then a stateless variant projection and ONE conditional aggregate
    * to a single row — adding metrics adds columns, not passes. */
  private val zSql =
    """cast(round(1e6 * (case
      |  when conv_a + conv_b = 0 or conv_a + conv_b = n_a + n_b then 0.0
      |  else (cast(conv_a as double) / cast(n_a as double)
      |          - cast(conv_b as double) / cast(n_b as double))
      |       / sqrt((cast(conv_a + conv_b as double) / cast(n_a + n_b as double))
      |              * (1.0 - cast(conv_a + conv_b as double) / cast(n_a + n_b as double))
      |              * (1.0 / cast(n_a as double) + 1.0 / cast(n_b as double)))
      |  end)) as bigint)""".stripMargin

  val eventsAbTest: Q = Q(
    "events_ab_test",
    (s, dir) => {
      import s.implicits._
      val u = Tables.load(s, dir, "events")
        .groupBy($"user_id")
        .agg((sum(when($"event_type" === "purchase",
          round($"value" * 100).cast("long")).otherwise(0L)) > 60000L)
          .cast("long").as("conv"))
        .withColumn("variant",
          when(substring(md5($"user_id".cast("string")), 1, 2) < "80", "A")
            .otherwise("B"))
      u.agg(
        sum(when($"variant" === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when($"variant" === "A", $"conv").otherwise(0L)).as("conv_a"),
        sum(when($"variant" === "B", 1L).otherwise(0L)).as("n_b"),
        sum(when($"variant" === "B", $"conv").otherwise(0L)).as("conv_b"))
        .selectExpr(
          "n_a", "conv_a", "(1000000 * conv_a) div n_a as rate_a_micro",
          "n_b", "conv_b", "(1000000 * conv_b) div n_b as rate_b_micro",
          "(1000000 * conv_a) div n_a - (1000000 * conv_b) div n_b as diff_micro",
          s"$zSql as z_micro")
        .withColumn("significant", abs($"z_micro") >= 1960000L)
    },
    Some(s"""
      WITH u AS (
        SELECT user_id,
               CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                             THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) > 60000
                    THEN 1 ELSE 0 END conv
        FROM events GROUP BY user_id
      ),
      v AS (
        SELECT conv,
               CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 2) < '80'
                    THEN 'A' ELSE 'B' END variant
        FROM u
      ),
      agg AS (
        SELECT SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) n_a,
               SUM(CASE WHEN variant = 'A' THEN conv ELSE 0 END) conv_a,
               SUM(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) n_b,
               SUM(CASE WHEN variant = 'B' THEN conv ELSE 0 END) conv_b
        FROM v
      )
      SELECT CAST(n_a AS BIGINT) n_a, CAST(conv_a AS BIGINT) conv_a,
             CAST((1000000 * conv_a) // n_a AS BIGINT) rate_a_micro,
             CAST(n_b AS BIGINT) n_b, CAST(conv_b AS BIGINT) conv_b,
             CAST((1000000 * conv_b) // n_b AS BIGINT) rate_b_micro,
             CAST((1000000 * conv_a) // n_a - (1000000 * conv_b) // n_b AS BIGINT) diff_micro,
             $zSql z_micro,
             abs($zSql) >= 1960000 AS significant
      FROM agg
    """)
  )

  /** Time-series RESAMPLING with gap fill: each user's event stream
    * regularized onto an hourly grid spanning their first→last event —
    * empty hours materialize as zero rows and the running total
    * carries through them — the time-regularization every
    * forecasting/feature pipeline needs before a model sees the data.
    * No calendar table: the grid is a per-user `sequence()` explode.
    *
    * Scale design: one user_id exchange for the span aggregate, a
    * stateless per-user grid explode (bounded by the user's own time
    * range, not the global one), an equi-join back to the hourly
    * aggregates on (user, hour), and the running sum rides a
    * user-partitioned window — every term is per-user-bounded. Money
    * is exact integer cents throughout. */
  val eventsResample: Q = Q(
    "events_resample",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .select($"user_id", $"ts", round($"value" * 100).cast("long").as("c"))
      val hourly = ev
        .groupBy($"user_id", date_trunc("hour", $"ts").as("hour_ts"))
        .agg(count(lit(1)).as("n_events"), sum($"c").as("cents"))
      val grid = ev.groupBy($"user_id")
        .agg(date_trunc("hour", min($"ts")).as("h0"),
          date_trunc("hour", max($"ts")).as("h1"))
        .select($"user_id",
          explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour_ts"))
      val w = Window.partitionBy($"user_id").orderBy($"hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("user_id", "hour_ts"), "left")
        .select($"user_id", $"hour_ts",
          coalesce($"n_events", lit(0L)).as("n_events"),
          coalesce($"cents", lit(0L)).as("cents"))
        .withColumn("cum_cents", sum($"cents").over(w))
        .orderBy($"user_id", $"hour_ts")
    },
    Some("""
      WITH ev AS (
        SELECT user_id, ts, CAST(ROUND(value * 100) AS BIGINT) c FROM events
      ),
      hourly AS (
        SELECT user_id, date_trunc('hour', ts) hour_ts,
               COUNT(*) n_events, SUM(c) cents
        FROM ev GROUP BY 1, 2
      ),
      grid AS (
        SELECT user_id,
               unnest(generate_series(date_trunc('hour', MIN(ts)),
                                      date_trunc('hour', MAX(ts)),
                                      INTERVAL 1 HOUR)) hour_ts
        FROM ev GROUP BY user_id
      )
      SELECT g.user_id, g.hour_ts,
             CAST(COALESCE(h.n_events, 0) AS BIGINT) n_events,
             CAST(COALESCE(h.cents, 0) AS BIGINT) cents,
             CAST(SUM(COALESCE(h.cents, 0)) OVER (
               PARTITION BY g.user_id ORDER BY g.hour_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) cum_cents
      FROM grid g
      LEFT JOIN hourly h ON h.user_id = g.user_id AND h.hour_ts = g.hour_ts
      ORDER BY g.user_id, g.hour_ts
    """)
  )

  /** COHORT LTV CURVES: per signup cohort (the user's first signup
    * day, TZ-free epoch-day integers — the [[graft.operators.Pipeline]]
    * retention discipline) and post-signup age in days, the cohort's
    * event revenue, its running cumulative revenue, and the cumulative
    * LTV per cohort user in exact micro-cents — the
    * lifetime-value staple every growth warehouse serves beside
    * [[graft.operators.Pipeline]]'s retention triangle. Pre-signup
    * events (age < 0) are excluded — they are acquisition-channel
    * activity, not lifetime value. All integer: cents, epoch days,
    * truncating micro division.
    *
    * Scale shape: one user-keyed agg builds the cohort frame (map-side
    * combined), one user-keyed join carries the cohort day onto the
    * log, then everything collapses to the (cohort, age) key space —
    * bounded by the day span squared, never user- or event-sized; the
    * cumulative window runs per cohort over that day-sized frame, and
    * the cohort-size join broadcasts. */
  val eventsCohortLtv: Q = Q(
    "events_cohort_ltv",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .select($"user_id", expr("unix_micros(ts) div 86400000000L").as("d"),
          $"event_type", round($"value" * 100).cast("long").as("c"))
      val cohort = ev.filter($"event_type" === "signup")
        .groupBy($"user_id").agg(min($"d").as("cohort_day"))
        .persist()   // joined onto the log AND aggregated for sizes
      val sizes = cohort.groupBy($"cohort_day").agg(count(lit(1)).as("n_users"))
      val byAge = ev.join(cohort, "user_id")
        .select($"cohort_day", ($"d" - $"cohort_day").as("age"), $"c")
        .filter($"age" >= 0L)
        .groupBy($"cohort_day", $"age")
        .agg(count(lit(1)).as("n_events"), sum($"c").as("rev_cents"))
      byAge
        .withColumn("cum_rev_cents", sum($"rev_cents").over(
          Window.partitionBy($"cohort_day").orderBy($"age")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .join(broadcast(sizes), "cohort_day")
        .select($"cohort_day", $"age", $"n_users", $"n_events", $"rev_cents",
          $"cum_rev_cents",
          expr("(cum_rev_cents * 1000000L) div n_users").as("ltv_micro_cents"))
        .orderBy($"cohort_day", $"age")
    },
    Some("""
      WITH ev AS (
        SELECT user_id, epoch_us(ts) // 86400000000 AS d, event_type,
               CAST(ROUND(value * 100) AS BIGINT) c
        FROM events
      ),
      cohort AS (
        SELECT user_id, MIN(d) AS cohort_day
        FROM ev WHERE event_type = 'signup' GROUP BY 1
      ),
      sizes AS (SELECT cohort_day, COUNT(*) n_users FROM cohort GROUP BY 1),
      byage AS (
        SELECT cohort_day, d - cohort_day AS age,
               COUNT(*) n_events, SUM(c) rev_cents
        FROM ev JOIN cohort USING (user_id)
        WHERE d - cohort_day >= 0
        GROUP BY 1, 2
      ),
      cum AS (
        SELECT cohort_day, age, n_events, rev_cents,
               SUM(rev_cents) OVER (PARTITION BY cohort_day ORDER BY age
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum_rev_cents
        FROM byage
      )
      SELECT cohort_day, age, CAST(n_users AS BIGINT) n_users,
             CAST(n_events AS BIGINT) n_events,
             CAST(rev_cents AS BIGINT) rev_cents,
             CAST(cum_rev_cents AS BIGINT) cum_rev_cents,
             CAST((cum_rev_cents * 1000000) // n_users AS BIGINT) ltv_micro_cents
      FROM cum JOIN sizes USING (cohort_day)
      ORDER BY cohort_day, age
    """)
  )

  def queries: Seq[Q] =
    Seq(dqReferential, dqConstraints, dqVolumeDrift, eventsAttribution,
      eventsAttributionPosition, eventsAttributionTimeDecay,
      eventsAbTest, eventsResample, eventsActiveUsers, eventsActiveUsersHll,
      eventsCohortLtv)
}
