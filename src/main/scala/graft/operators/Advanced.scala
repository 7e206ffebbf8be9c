package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Parity._

/** Second-tier relational coverage: JSON payload introspection (the
  * reference's opaque `o` payload pattern, SURVEY.md §1.4), event-time
  * tumbling windows (the batch analog of streaming windowed aggs),
  * array aggregation, gap-based sessionization, and the as-of join.
  */
object Advanced {

  private def ev(s: SparkSession, dir: String) = Tables.load(s, dir, "events")

  /** JSON payload introspection on demand — the `o`/`o2` opaque-payload
    * model: extract a field from the JSON string, type it, aggregate.
    * No schema explosion; the extraction is a codegen'd path expression. */
  val jsonPayload: Q = Q(
    "q18_json_payload",
    (s, dir) => {
      import s.implicits._
      ev(s, dir)
        .withColumn("k", get_json_object($"props", "$.k").cast("long"))
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n"),
          count($"k").as("n_with_k"),
          sum($"k").as("sum_k"),
          max($"k").as("max_k"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type, COUNT(*) AS n,
             COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
             CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      FROM events
      GROUP BY event_type
      ORDER BY event_type
    """)
  )

  /** Tumbling 6-hour event-time windows — the bounded analog of the
    * streaming `groupBy(window(ts, ...))` aggregation (which
    * StreamingWindowSpec drives with a watermark on MemoryStream). */
  val timeWindow: Q = Q(
    "q19_time_window",
    (s, dir) => {
      import s.implicits._
      ev(s, dir)
        .groupBy(window($"ts", "6 hours").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"), dsum(decP($"value")).as("total_value"))
        .select(unix_micros($"w.start").as("bucket_us"), $"event_type", $"n", $"total_value")
        .orderBy($"bucket_us", $"event_type")
    },
    Some("""
      SELECT epoch_us(time_bucket(INTERVAL '6 hours', make_timestamp(epoch_us(ts)))) AS bucket_us,
             event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS total_value
      FROM events
      GROUP BY 1, 2
      ORDER BY bucket_us, event_type
    """)
  )

  /** Array aggregation: sorted distinct set per group, surfaced as a
    * joined string so both engines serialize identically. */
  val arrayAgg: Q = Q(
    "q20_array_agg",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          concat_ws(",", sort_array(collect_set($"l_linestatus"))).as("statuses"),
          countDistinct($"l_linestatus").as("n_statuses"))
        .orderBy($"l_returnflag")
    },
    Some("""
      SELECT l_returnflag,
             array_to_string(list_sort(list_distinct(list(l_linestatus))), ',') AS statuses,
             COUNT(DISTINCT l_linestatus) AS n_statuses
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """)
  )

  /** Gap-based sessionization (30-minute inactivity): the window-
    * function form of streaming session windows. One shuffle on
    * user_id; the lag/cumsum pass is streaming within each sorted
    * partition. */
  val sessionize: Q = Q(
    "q21_sessionize",
    (s, dir) => {
      import s.implicits._
      val gapUs = 30L * 60 * 1000000
      val byTime = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
      ev(s, dir)
        .select($"user_id", $"event_id", unix_micros($"ts").as("t"))
        .withColumn("prev", lag($"t", 1).over(byTime))
        .withColumn("new_sess",
          when($"prev".isNull || $"t" - $"prev" > gapUs, 1).otherwise(0))
        .withColumn("sess", sum($"new_sess").over(
          byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"sess")
        .agg(count(lit(1)).as("n_events"), min($"t").as("start_us"), max($"t").as("end_us"))
        .orderBy($"user_id", $"sess")
    },
    Some("""
      WITH t AS (
        SELECT user_id, event_id, epoch_us(ts) AS t,
               LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
        FROM events
      ), flagged AS (
        SELECT user_id, event_id, t,
               CASE WHEN prev IS NULL OR t - prev > 1800000000 THEN 1 ELSE 0 END AS new_sess
        FROM t
      ), numbered AS (
        SELECT user_id, t,
               CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess
        FROM flagged
      )
      SELECT user_id, sess, COUNT(*) AS n_events,
             MIN(t) AS start_us, MAX(t) AS end_us
      FROM numbered
      GROUP BY user_id, sess
      ORDER BY user_id, sess
    """)
  )

  /** As-of join: each event enriched with the same user's most recent
    * order at-or-before the event time (see [[AsOfJoin]]). */
  val asOf: Q = Q(
    "q22_asof_join",
    (s, dir) => {
      import s.implicits._
      val orders = Tables.load(s, dir, "orders")
      val events = ev(s, dir)
      AsOfJoin(
        probe = events, probeKey = $"user_id",
        probeTime = unix_micros($"ts"), probeId = $"event_id",
        quote = orders, quoteKey = $"o_custkey",
        // o_orderdate is TIMESTAMP_NTZ in parquet; session TZ is UTC so
        // the cast is wall-clock-identical (and matches DuckDB epoch_us)
        quoteTime = unix_micros($"o_orderdate".cast("timestamp")), quoteId = $"o_orderkey")
        .filter($"asof_qid".isNotNull)
        .select($"pid".as("event_id"), $"k".as("user_id"),
          $"t".as("event_ts_us"), $"asof_qid".as("asof_orderkey"))
        .orderBy($"event_id")
    },
    Some("""
      WITH u AS (
        SELECT o_custkey AS k, epoch_us(o_orderdate) AS t, 0 AS side,
               o_orderkey AS qid, CAST(NULL AS BIGINT) AS pid
        FROM orders
        UNION ALL
        SELECT user_id AS k, epoch_us(ts) AS t, 1 AS side,
               CAST(NULL AS BIGINT) AS qid, event_id AS pid
        FROM events
      ), m AS (
        SELECT k, t, side, pid,
               LAST_VALUE(qid IGNORE NULLS) OVER (PARTITION BY k
                 ORDER BY t, side, COALESCE(qid, pid)
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_qid
        FROM u
      )
      SELECT pid AS event_id, k AS user_id, t AS event_ts_us, asof_qid AS asof_orderkey
      FROM m
      WHERE side = 1 AND asof_qid IS NOT NULL
      ORDER BY event_id
    """)
  )

  /** Sketch-based approximate distinct (HyperLogLog++): the constant-
    * memory path for cardinality at 100 TB, where exact COUNT(DISTINCT)
    * needs a full shuffle of the key set. HLL implementations differ
    * across engines → no SQL oracle; SkewJoinSpec ("approx distinct
    * stays within the declared error bound") asserts every group's
    * estimate is within 10% of the exact COUNT(DISTINCT). */
  val approxDistinct: Q = Q(
    "q23_approx_distinct",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          approx_count_distinct($"l_partkey", 0.02).as("approx_parts"),
          count(lit(1)).as("n_rows"))
        .orderBy($"l_returnflag")
    },
    None
  )

  /** Distributed HyperLogLog with a DETERMINISTIC md5-based sketch
    * (p=8, m=256 registers): register index = the hash's top byte,
    * rank = leading-zero count of the remaining 56 bits + 1, extracted
    * from the md5 hex by exact integer/string ops — so unlike the
    * engine-private `approx_count_distinct` sketch ([[approxDistinct]],
    * spec-gated), this estimator is reproducible in SQL and carries a
    * full DuckDB oracle. The estimate is the standard HLL formula
    * (alpha_m·m²/Σ2^−M, linear-counting correction below 2.5m) rounded
    * to a whole count (a micro-unit encoding would overflow int64 right
    * in the trillion-key regime HLL exists for; whole-count rounding
    * keeps the same sub-ulp cross-engine safety margin); exact
    * COUNT(DISTINCT) rides along so the sketch error is visible in the
    * output.
    *
    * Scale shape — the reason HLL exists: registers partial-aggregate
    * (max per (group, idx)) map-side, so each partition contributes at
    * most m=256 rows per group to the shuffle regardless of row count,
    * and sketches merge associatively (register-wise max) — the
    * mergeable-sketch property that lets 1000 executors sketch 100 TB
    * and combine in O(m) per group. */
  /** The deterministic md5-HLL estimator over a (grp, hx) frame —
    * hx = md5 hex of the counted value. 256 registers from the first
    * two nibbles, rho from the 56-bit suffix, bias-corrected harmonic
    * estimate with the small-range linear-counting branch. Returns
    * (grp, present, e_raw); shared by [[hllDistinct]] and the
    * active-user sketch twin (operators/Quality.scala). */
  private[operators] def md5HllEst(withHx: DataFrame): DataFrame = {
    val hexdig = "'0123456789abcdef'"
    val base = withHx
      .selectExpr("grp",
        s"CAST((instr($hexdig, substring(hx, 1, 1)) - 1) * 16 " +
          s"+ (instr($hexdig, substring(hx, 2, 1)) - 1) AS INT) AS idx",
        "substring(hx, 3, 14) AS suffix")
      // z = leading zero NIBBLES of the 56-bit suffix; nv = value of
      // the first non-zero nibble (computed once, reused below)
      .selectExpr("grp", "idx",
        "CAST(length(regexp_extract(suffix, '^0*', 0)) AS INT) AS z",
        "suffix")
      .selectExpr("grp", "idx", "z",
        s"(instr($hexdig, substring(suffix, z + 1, 1)) - 1) AS nv")
      .selectExpr("grp", "idx",
        """CASE WHEN z >= 14 THEN 57
          |ELSE CAST(z * 4 + (CASE WHEN nv >= 8 THEN 0 WHEN nv >= 4 THEN 1
          |                        WHEN nv >= 2 THEN 2 ELSE 3 END) + 1 AS INT)
          |END AS rho""".stripMargin)
    val regs = base.groupBy(col("grp"), col("idx"))
      .agg(max(col("rho")).as("mr"))
    regs.groupBy(col("grp")).agg(
        count(lit(1)).as("present"),
        sum(expr("pow(2.0, -mr)")).as("sum_present"))
      .selectExpr("grp", "present",
        "(CAST(0.7213 AS DOUBLE) / (1.0 + CAST(1.079 AS DOUBLE) / 256.0)) * 65536.0" +
          " / (sum_present + (256.0 - present)) AS e_raw")
  }

  val hllDistinct: Q = Q(
    "hll_distinct",
    (s, dir) => {
      import s.implicits._
      val est = md5HllEst(
        Tables.load(s, dir, "lineitem")
          .select($"l_returnflag".as("grp"),
            md5($"l_partkey".cast("string")).as("hx")))
      val exact = Tables.load(s, dir, "lineitem")
        .groupBy($"l_returnflag".as("grp"))
        .agg(countDistinct($"l_partkey").as("exact_distinct"))
      est.join(broadcast(exact), "grp")
        .selectExpr("grp AS l_returnflag",
          "CAST(present AS INT) AS registers_present",
          """CAST(ROUND(CASE WHEN e_raw <= 640.0 AND present < 256
            |  THEN 256.0 * ln(256.0 / (256.0 - present))
            |  ELSE e_raw END) AS BIGINT) AS hll_est""".stripMargin,
          "exact_distinct")
        .orderBy($"l_returnflag")
    },
    Some("""
      WITH h AS (
        SELECT l_returnflag AS grp, md5(CAST(l_partkey AS VARCHAR)) AS hx
        FROM lineitem
      ),
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
      ex AS (SELECT l_returnflag AS grp, COUNT(DISTINCT l_partkey) AS exact_distinct
             FROM lineitem GROUP BY 1)
      SELECT est.grp AS l_returnflag,
             CAST(present AS INT) AS registers_present,
             CAST(ROUND(CASE WHEN e_raw <= 640.0 AND present < 256
                             THEN 256.0 * ln(256.0 / (256.0 - present))
                             ELSE e_raw END) AS BIGINT) AS hll_est,
             exact_distinct
      FROM est JOIN ex ON est.grp = ex.grp
      ORDER BY l_returnflag
    """)
  )

  /** Interval/range join, distributed form: for each error event, the
    * number of events by the same user in the following hour. A naive
    * range join is a per-key nested loop; here both sides bucketize
    * time to the range width, the error side probes its bucket and the
    * next (any (t, t+1h] window spans ≤ 2 buckets), the join is a plain
    * equi-join on (user, bucket), and the exact range predicate filters
    * the residue — the standard way a time-range join survives 100 TB. */
  val intervalJoin: Q = Q(
    "q24_interval_join",
    (s, dir) => {
      import s.implicits._
      val hourUs = 3600L * 1000000
      val base = ev(s, dir).select($"user_id", $"event_id",
        unix_micros($"ts").as("t"), $"event_type")
      val errors = base.filter($"event_type" === "error")
        .select($"user_id", $"event_id".as("err_id"), $"t".as("t0"),
          explode(array(($"t" / hourUs).cast("long"),
            ($"t" / hourUs).cast("long") + 1)).as("bucket"))
      val others = base
        .select($"user_id", $"event_id".as("other_id"), $"t".as("t1"),
          ($"t" / hourUs).cast("long").as("bucket"))
      errors.join(others, Seq("user_id", "bucket"))
        .filter($"t1" > $"t0" && $"t1" <= $"t0" + hourUs && $"other_id" =!= $"err_id")
        .select($"err_id", $"other_id").distinct()   // bucket overlap dedup
        .groupBy($"err_id")
        .agg(count(lit(1)).as("n_following"))
        .orderBy($"err_id")
    },
    Some("""
      SELECT a.event_id AS err_id, COUNT(*) AS n_following
      FROM events a JOIN events b
        ON a.user_id = b.user_id
       AND epoch_us(b.ts) >  epoch_us(a.ts)
       AND epoch_us(b.ts) <= epoch_us(a.ts) + 3600000000
       AND b.event_id <> a.event_id
      WHERE a.event_type = 'error'
      GROUP BY a.event_id
      ORDER BY err_id
    """)
  )

  /** Sliding event-time windows (12h width, 6h slide): each event lands
    * in two windows; the streaming form is `window(ts, "12 hours",
    * "6 hours")` identically. Oracle enumerates both window starts per
    * event. */
  val slidingWindow: Q = Q(
    "q25_sliding_window",
    (s, dir) => {
      import s.implicits._
      ev(s, dir)
        .groupBy(window($"ts", "12 hours", "6 hours").as("w"))
        .agg(count(lit(1)).as("n"), dsum(decP($"value")).as("total_value"))
        .select(unix_micros($"w.start").as("bucket_us"), $"n", $"total_value")
        .orderBy($"bucket_us")
    },
    Some("""
      WITH starts AS (
        SELECT unnest([
                 time_bucket(INTERVAL '6 hours', make_timestamp(epoch_us(ts))),
                 time_bucket(INTERVAL '6 hours', make_timestamp(epoch_us(ts))) - INTERVAL '6 hours'
               ]) AS ws,
               value
        FROM events
      )
      SELECT epoch_us(ws) AS bucket_us, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS total_value
      FROM starts
      GROUP BY 1
      ORDER BY bucket_us
    """)
  )

  /** GROUPING SETS beyond rollup/cube (q10/q11): two independent
    * single-column groupings plus the grand total in ONE pass over the
    * fact table — Spark expands the sets and partial-aggregates each
    * before the shuffle, so the scan cost is paid once however many
    * report axes ride on it. Group keys are coalesced to 'ALL' so the
    * compare never sorts a nullable key (Spark NULLS FIRST vs DuckDB
    * NULLS LAST). */
  val groupingSets: Q = Q(
    "q26_grouping_sets",
    (s, dir) => {
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem_gs")
      s.sql("""
        SELECT COALESCE(l_returnflag, 'ALL') AS ret_flag,
               COALESCE(l_linestatus, 'ALL') AS line_status,
               CAST(GROUPING(l_returnflag) AS INT) AS g_ret,
               CAST(GROUPING(l_linestatus) AS INT) AS g_line,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY g_ret, g_line, ret_flag, line_status
      """)
    },
    Some("""
      SELECT COALESCE(l_returnflag, 'ALL') AS ret_flag,
             COALESCE(l_linestatus, 'ALL') AS line_status,
             CAST(GROUPING(l_returnflag) AS INT) AS g_ret,
             CAST(GROUPING(l_linestatus) AS INT) AS g_line,
             COUNT(*) AS n_rows,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY g_ret, g_line, ret_flag, line_status
    """)
  )

  /** Pivot (wide reshape): per return-flag row, one column per line
    * status. Spark plans this as ONE conditional aggregation pass (no
    * per-column scans), which is also exactly how the oracle states it
    * — at 100 TB a pivot with a bounded value list costs the same as
    * the underlying groupBy. Decimal sums for order-proof doubles. */
  val pivot: Q = Q(
    "q27_pivot",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(dsum(decP($"l_quantity")))
        .select($"l_returnflag",
          coalesce($"F", lit(0.0)).as("qty_f"),
          coalesce($"O", lit(0.0)).as("qty_o"))
        .orderBy($"l_returnflag")
    },
    Some("""
      SELECT l_returnflag,
             COALESCE(CAST(SUM(CASE WHEN l_linestatus = 'F'
               THEN CAST(l_quantity AS DECIMAL(12,4)) END) AS DOUBLE), 0.0) AS qty_f,
             COALESCE(CAST(SUM(CASE WHEN l_linestatus = 'O'
               THEN CAST(l_quantity AS DECIMAL(12,4)) END) AS DOUBLE), 0.0) AS qty_o
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """)
  )

  /** Native session windows — the same gaps-and-islands semantics as
    * [[sessionize]] but through Spark's `session_window` operator, the
    * form that ALSO runs under Structured Streaming with a watermark
    * (StreamingWindowSpec proves stream ≡ batch on this query). One
    * boundary subtlety pinned by the oracle: `session_window` SPLITS
    * when the inter-event gap is exactly the gap duration (an event
    * merges only while its start is strictly inside the previous
    * session's [last + gap) extension), so the oracle's island split is
    * `>=` where q21's manual rendition uses `>`. Window end is
    * last-event + gap by definition; outputs compare in epoch micros.
    * Scale shape: one shuffle keyed on user_id (session assembly is a
    * merge within the key), identical to the manual form. */
  val sessionWindow: Q = Q(
    "q28_session_window",
    (s, dir) => {
      import s.implicits._
      ev(s, dir)
        .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select($"user_id",
          unix_micros($"w.start").as("start_us"),
          unix_micros($"w.end").as("end_us"),
          $"n_events")
        .orderBy($"user_id", $"start_us")
    },
    Some("""
      WITH t AS (
        SELECT user_id, event_id, epoch_us(ts) AS t,
               LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
        FROM events
      ), flagged AS (
        SELECT user_id, event_id, t,
               CASE WHEN prev IS NULL OR t - prev >= 1800000000 THEN 1 ELSE 0 END AS new_sess
        FROM t
      ), numbered AS (
        SELECT user_id, t,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        FROM flagged
      )
      SELECT user_id, MIN(t) AS start_us, MAX(t) + 1800000000 AS end_us,
             COUNT(*) AS n_events
      FROM numbered
      GROUP BY user_id, sess
      ORDER BY user_id, start_us
    """)
  )

  /** Unpivot (melt) — the inverse of the q27 pivot: the four lineitem
    * measures become (measure, value) rows via `stack`, then aggregate
    * per (returnflag, measure). Values go through ROUND(value·100) cents
    * before summation — the doubles carry 2-decimal data, so rounding
    * the scaled value is exact and the aggregate is pure BIGINT (no
    * float-sum ordering hazard in the oracle compare). `stack` is a
    * generator projection: melt adds NO shuffle of its own; the only
    * exchange is the (tiny-keyed) final aggregation. */
  val unpivot: Q = Q(
    "q29_unpivot",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .selectExpr("l_returnflag",
          """stack(4,
               'discount', l_discount,
               'extendedprice', l_extendedprice,
               'quantity', l_quantity,
               'tax', l_tax) AS (measure, val)""")
        .select($"l_returnflag", $"measure",
          expr("CAST(ROUND(val * 100) AS BIGINT)").as("cents"))
        .groupBy($"l_returnflag", $"measure")
        .agg(count(lit(1)).as("n"), sum($"cents").as("sum_cents"))
        .orderBy($"l_returnflag", $"measure")
    },
    Some("""
      WITH m AS (
        SELECT l_returnflag, measure, CAST(ROUND(val * 100) AS BIGINT) AS cents
        FROM (
          SELECT l_returnflag, l_discount AS discount, l_extendedprice AS extendedprice,
                 l_quantity AS quantity, l_tax AS tax
          FROM lineitem
        ) UNPIVOT INCLUDE NULLS (val FOR measure IN (discount, extendedprice, quantity, tax))
      )
      SELECT l_returnflag, measure, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents
      FROM m
      GROUP BY l_returnflag, measure
      ORDER BY l_returnflag, measure
    """)
  )

  /** Time-RANGE window frame — the one frame flavor the catalog's other
    * windows don't cover (q9 is ROWS-unbounded running, q25 is
    * tumbling-window sliding): per event, the count and cents-sum of
    * the SAME USER's events in the trailing 10 minutes, expressed as
    * `rangeBetween(-600, 0)` over epoch seconds. RANGE frames include
    * all order-value peers in both engines, so second-collapsed ties
    * are deterministic. Value is scaled to cents BEFORE the frame sum
    * (pure BIGINT — no float-sum ordering hazard), and the DuckDB sum
    * is cast back from HUGEINT.
    *
    * 100 TB shape: one shuffle on user_id + a per-user sort; the frame
    * evaluator is a sliding two-pointer over each partition (O(events
    * per user)), state bounded by the 10-minute horizon. Hot users are
    * a data-skew concern, not an operator concern — the same AQE
    * skew-split story as q21_sessionize applies. */
  val rangeFrame: Q = Q(
    "q30_range_frame",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"epoch_s")
        .rangeBetween(-600, 0)
      ev(s, dir)
        .select($"event_id", $"user_id",
          unix_timestamp($"ts").as("epoch_s"),
          expr("CAST(ROUND(value * 100) AS BIGINT)").as("cents"))
        .withColumn("n_10m", count(lit(1)).over(w))
        .withColumn("sum_cents_10m", sum($"cents").over(w))
        .select($"event_id", $"user_id", $"epoch_s", $"n_10m", $"sum_cents_10m")
        .orderBy($"event_id")
    },
    Some("""
      WITH e AS (
        SELECT event_id, user_id,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch_s,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
      )
      SELECT event_id, user_id, epoch_s,
             CAST(COUNT(*) OVER w AS BIGINT) AS n_10m,
             CAST(SUM(cents) OVER w AS BIGINT) AS sum_cents_10m
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
                   RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
      ORDER BY event_id
    """)
  )

  /** Market-basket pair mining (frequent co-occurrence): parts ordered
    * together, support-counted, thresholded, top-k — the
    * association-rule primitive (and, over token/shingle baskets, the
    * co-occurrence statistic corpus analysis uses).
    *
    * Scale shape: the basket-aggregation form, NOT the naive self-join.
    * `lineitem ⋈ lineitem` on the order key would shuffle the fact
    * TWICE and rely on the join to bound the blow-up; instead ONE
    * shuffle builds each order's distinct sorted basket
    * (`collect_set`, partially aggregated map-side), and the pair
    * explosion is a per-row codegen'd higher-order function bounded by
    * basket size b (b≤7 in TPC-H ⇒ ≤21 pairs; retail-scale b~100 ⇒
    * ~5k — still a per-row constant, never corpus-quadratic). Pair
    * supports then hash-aggregate with map-side combine (pair space is
    * sparse: only co-ordered pairs exist), and the thresholded top-k
    * plans as TakeOrderedAndProject — O(k·partitions) result traffic.
    * Sorting each basket once makes p1 < p2 structural, halving the
    * pair stream vs. emitting both orientations. */
  val marketBasket: Q = Q(
    "market_basket_pairs",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .groupBy($"l_orderkey")
        .agg(sort_array(collect_set($"l_partkey")).as("parts"))
        .select(explode(expr(
          """flatten(transform(parts, (x, i) ->
             transform(slice(parts, i + 2, size(parts)), y ->
               struct(x AS p1, y AS p2))))""")).as("pr"))
        .groupBy($"pr.p1".as("p1"), $"pr.p2".as("p2"))
        .agg(count(lit(1)).as("support"))
        .filter($"support" >= 2)
        .orderBy($"support".desc, $"p1", $"p2")
        .limit(100)
    },
    Some("""
      WITH pr AS (
        SELECT DISTINCT a.l_orderkey, a.l_partkey AS p1, b.l_partkey AS p2
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      ),
      sup AS (SELECT p1, p2, COUNT(*) AS support FROM pr GROUP BY p1, p2)
      SELECT p1, p2, support FROM sup WHERE support >= 2
      ORDER BY support DESC, p1, p2 LIMIT 100
    """)
  )

  /** RUNNING DISTINCT COUNT over a window — the "unique users so far"
    * curve per event type, a frame Spark's window aggregates cannot
    * express directly (no `count_distinct` OVER). The standard exact
    * rewrite: flag each (type, user)'s FIRST event with a keyed
    * row_number, then a running SUM of flags over the event-time order
    * — two windows, both keyed, both map-side prunable, no distinct
    * state anywhere. The oracle runs the SAME construction, so the
    * technique itself is what's gated.
    *
    * Scale shape: window one partitions by (type, user) — high
    * cardinality, small partitions; window two partitions by type with
    * a deterministic (ts, event_id) order. At 100 TB the per-type
    * running sum is the [[graft.operators.Relational]] two-phase
    * running-window discipline (per-day partial sums + broadcast
    * day-prefix offsets) if a single type's history outgrows one
    * partition. */
  val runningDistinct: Q = Q(
    "q31_running_distinct",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.load(s, dir, "events")
        .select($"event_id", $"event_type", $"user_id",
          unix_micros($"ts").as("t"))
      val wFirst = Window.partitionBy($"event_type", $"user_id")
        .orderBy($"t", $"event_id")
      val wRun = Window.partitionBy($"event_type").orderBy($"t", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("first_flag",
          when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
        .withColumn("distinct_users", sum($"first_flag").over(wRun))
        .select($"event_id", $"event_type", $"distinct_users")
        .orderBy($"event_id")
    },
    Some("""
      WITH ev AS (
        SELECT event_id, event_type, user_id, epoch_us(ts) AS t FROM events
      ),
      f AS (
        SELECT event_id, event_type, t,
               CASE WHEN ROW_NUMBER() OVER (PARTITION BY event_type, user_id
                                            ORDER BY t, event_id) = 1
                    THEN 1 ELSE 0 END AS first_flag
        FROM ev
      )
      SELECT event_id, event_type,
             CAST(SUM(first_flag) OVER (PARTITION BY event_type ORDER BY t, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS distinct_users
      FROM f
      ORDER BY event_id
    """)
  )

  def queries: Seq[Q] = Seq(jsonPayload, timeWindow, arrayAgg, sessionize, asOf, groupingSets, pivot,
    approxDistinct, hllDistinct, intervalJoin, slidingWindow, sessionWindow, unpivot, rangeFrame,
    marketBasket, runningDistinct)
}
