package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFns

/** Training-data-pipeline operators beyond the dedup/vector families:
  * deterministic dataset splitting, metadata-filtered (hybrid) vector
  * search, and corpus statistics — the glue a 100 TB data-curation job
  * needs around the heavy operators.
  */
object Pipeline {

  /** Deterministic train/val/test split (~80/10/10): bucket on the
    * first md5 byte of the key. Content-addressed, so the assignment is
    * reproducible across engines, runs, and cluster sizes — no RNG, no
    * seed coordination, and a pure per-row projection (no shuffle; at
    * 100 TB this is a free column). Hex-string thresholds are compared
    * identically by Spark and the oracle: 'cd' = 205/256 ≈ 80.1%,
    * 'e6' = 230/256 ≈ 9.8% more, rest test. */
  val splitAssign: Q = Q(
    "split_assign",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id",
          substring(md5($"doc_id".cast("string")), 1, 2).as("bucket"))
        .withColumn("split",
          when($"bucket" < "cd", "train")
            .when($"bucket" < "e6", "val")
            .otherwise("test"))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id, bucket,
             CASE WHEN bucket < 'cd' THEN 'train'
                  WHEN bucket < 'e6' THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT doc_id, substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
            FROM documents)
      ORDER BY doc_id
    """)
  )

  /** Metadata-filtered (hybrid) vector search: top-10 cosine per query
    * among ONLY the vectors whose label passes the predicate — the
    * "filter + ANN" shape every retrieval pipeline needs. The filter is
    * applied BEFORE scoring (pre-filter), so the scan term shrinks with
    * predicate selectivity; composed with the IVF/LSH bucket paths the
    * same filter rides on the candidate side. Exact form → full DuckDB
    * oracle. */
  val filteredTopK: Q = Q(
    "vector_filtered_topk",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.graftexpr.VectorFunctions.dot_product
      val k = 10
      // two scans, each with its predicate PUSHED TO THE PARQUET READER
      // (vec_id<8 for queries, label IN (1,2,3) for candidates) — at
      // 100 TB row-group pruning on the filter beats caching the corpus
      val q = VectorSearch.withNorms(
        Tables.load(s, dir, "embeddings").filter($"vec_id" < 8)
          .select($"vec_id", $"embedding"))
        .select($"vec_id".as("qid"), $"v".as("qv"), $"nrm".as("qnrm"))
      val cand = VectorSearch.withNorms(
        Tables.load(s, dir, "embeddings").filter($"label".isin(1, 2, 3))
          .repartition($"vec_id")   // single-file fixture → spread the scoring (UNPINNED on purpose: tiny vector frames — 32 pinned partitions taxed every downstream stage ~1.3-2x, measured round 19)
          .select($"vec_id", $"embedding"))
      val scored = cand.join(broadcast(q), $"vec_id" =!= $"qid")
        .select($"qid", $"vec_id",
          (dot_product($"qv", $"v") / ($"qnrm" * $"nrm")).as("cos"))
      VectorSearch.rankTopK(s, scored, k)
    },
    Some("""
      WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
                 FROM embeddings),
      n AS (SELECT vec_id, label, v,
              sqrt(list_reduce(list_transform(list_zip(v, v), s -> s[1]*s[2]), (a, b) -> a + b)) nrm
            FROM e),
      qs AS (SELECT vec_id qid, v qv, nrm qnrm FROM n WHERE vec_id < 8),
      p AS (SELECT qid, vec_id,
              list_reduce(list_transform(list_zip(qv, v), s -> s[1]*s[2]), (x, y) -> x + y)
                / (qnrm * nrm) AS cos
            FROM qs, n WHERE vec_id <> qid AND label IN (1, 2, 3)),
      r AS (SELECT qid, vec_id, cos,
              ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) rn
            FROM p)
      SELECT qid, rn, vec_id, cos FROM r WHERE rn <= 10 ORDER BY qid, rn
    """)
  )

  /** Per-language token-count distribution: exact interpolated
    * percentiles (p50/p90/p99) of per-doc token counts. Percentiles are
    * emitted as micro-units (×1e6, rounded to BIGINT) so the oracle
    * compare is immune to last-ulp interpolation differences between
    * engines. One partial-aggregated shuffle on `lang`. */
  val tokenPercentiles: Q = Q(
    "token_percentiles",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"lang", size(TextFns.tokens($"text")).as("n_tokens"))
        .groupBy($"lang")
        .agg(
          count(lit(1)).as("n_docs"),
          expr("percentile(n_tokens, array(0.5D, 0.9D, 0.99D))").as("q"))
        .select($"lang", $"n_docs",
          round(element_at($"q", 1) * 1e6).cast("long").as("p50_micro"),
          round(element_at($"q", 2) * 1e6).cast("long").as("p90_micro"),
          round(element_at($"q", 3) * 1e6).cast("long").as("p99_micro"))
        .orderBy($"lang")
    },
    Some("""
      WITH t AS (
        SELECT lang,
               len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
        FROM documents
      )
      SELECT lang, COUNT(*) AS n_docs,
             CAST(ROUND(quantile_cont(n_tokens, 0.5)  * 1e6) AS BIGINT) AS p50_micro,
             CAST(ROUND(quantile_cont(n_tokens, 0.9)  * 1e6) AS BIGINT) AS p90_micro,
             CAST(ROUND(quantile_cont(n_tokens, 0.99) * 1e6) AS BIGINT) AS p99_micro
      FROM t
      GROUP BY lang
      ORDER BY lang
    """)
  )

  /** Binned (histogram) percentiles — the MERGEABLE scale path for
    * [[tokenPercentiles]]: exact `percentile()` buffers every value of
    * a group in executor memory (O(group) state — the term that breaks
    * first at 100 TB), while a fixed-width histogram is a two-level
    * partial aggregation with O(bins) state per group, mergeable across
    * partitions, executors, and days. The price is resolution: each
    * percentile comes back as its bin's inclusive upper bound (width 16
    * here). Everything is INTEGER arithmetic — bin = n div 16, and the
    * rank test `cum ≥ ceil(q·n)` is evaluated as `100·cum ≥ q%·n` (exact
    * for integer cum) — so the oracle compare is hash-exact with no
    * interpolation-rule hazard (which quantile_cont vs percentile would
    * otherwise introduce). Same family discipline as HLL↔q13 and
    * IVF↔flat: the exact twin stays in the catalog, this is the form
    * you run when groups are huge. */
  val tokenPercentilesBinned: Q = Q(
    "token_percentiles_binned",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = 16
      val binned = Tables.load(s, dir, "documents")
        .select($"lang",
          expr(s"CAST(size(filter(split(text, ' '), x -> x != '')) AS BIGINT) div $w").as("bin"))
        .groupBy($"lang", $"bin").agg(count(lit(1)).as("cnt"))
      val byBin = Window.partitionBy($"lang").orderBy($"bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val whole = Window.partitionBy($"lang")
      val cum = binned
        .withColumn("cum", sum($"cnt").over(byBin))
        .withColumn("n", sum($"cnt").over(whole))
      def pick(pct: Int) =
        min(when($"cum" * 100 >= $"n" * pct, $"bin" * w + (w - 1))).as(s"p${pct}_hi")
      cum.groupBy($"lang")
        .agg(max($"n").as("n_docs"), pick(50), pick(90), pick(99))
        .orderBy($"lang")
    },
    Some("""
      WITH t AS (
        SELECT lang,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) // 16 AS bin
        FROM documents
      ),
      b AS (SELECT lang, bin, COUNT(*) AS cnt FROM t GROUP BY lang, bin),
      c AS (SELECT lang, bin, cnt,
              CAST(SUM(cnt) OVER (PARTITION BY lang ORDER BY bin
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
              CAST(SUM(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
            FROM b)
      SELECT lang, MAX(n) AS n_docs,
             MIN(CASE WHEN cum * 100 >= n * 50 THEN bin * 16 + 15 END) AS p50_hi,
             MIN(CASE WHEN cum * 100 >= n * 90 THEN bin * 16 + 15 END) AS p90_hi,
             MIN(CASE WHEN cum * 100 >= n * 99 THEN bin * 16 + 15 END) AS p99_hi
      FROM c
      GROUP BY lang
      ORDER BY lang
    """)
  )

  /** Deterministic WEIGHTED sample without replacement
    * (Efraimidis–Spirakis A-Res): top-200 documents by the key
    * ln(u)/w, where w = the document's token count (longer docs
    * proportionally likelier — the "sample by content mass" draw a
    * token-budgeted corpus build wants) and u ∈ (0,1] is
    * content-addressed (md5 32-bit prefix, the [[splitAssign]]
    * discipline — no RNG, no seed coordination, reproducible across
    * engines/runs/cluster sizes). u = (v+1)/2³² is an EXACT double
    * (integer over a power of two) and ln/÷ are evaluated with the
    * identical expression shape on both engines, nano-rounded ONCE
    * per doc (the [[graft.operators.TextAnalysis]] bm25/jsd parity
    * discipline), so rank and tie-break (key desc, doc_id) are
    * hash-exact.
    *
    * Scale shape: one stateless projection computes every key
    * map-side; top-200 is TakeOrderedAndProject (per-partition heaps +
    * a k-row driver merge) — no shuffle grows with the corpus,
    * exactly [[sampleStratifiedThreshold]]'s scan-bound economics with
    * weights instead of strata. */
  val sampleWeighted: Q = Q(
    "sample_weighted",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id", $"lang",
          size(TextFns.tokens($"text")).cast("long").as("w"),
          expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)")
            .as("v"))
        .filter($"w" >= 1L)
        .withColumn("key_nano",
          expr("CAST(ROUND(1e9 * ln((v + 1) / 4294967296.0D) / CAST(w AS DOUBLE)) AS BIGINT)"))
        .orderBy($"key_nano".desc, $"doc_id")
        .limit(200)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy($"key_nano".desc, $"doc_id")))
        .select($"rk", $"doc_id", $"lang", $"w", $"key_nano")
        .orderBy($"rk")
    },
    Some("""
      WITH d AS (
        SELECT doc_id, lang,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) w,
               CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) v
        FROM documents
      ),
      k AS (
        SELECT doc_id, lang, w,
               CAST(ROUND(1e9 * ln((v + 1) / 4294967296.0) / CAST(w AS DOUBLE)) AS BIGINT)
                 AS key_nano
        FROM d WHERE w >= 1
      ),
      r AS (
        SELECT doc_id, lang, w, key_nano,
               CAST(ROW_NUMBER() OVER (ORDER BY key_nano DESC, doc_id) AS INT) rk
        FROM k
      )
      SELECT rk, doc_id, lang, w, key_nano FROM r WHERE rk <= 200 ORDER BY rk
    """)
  )

  /** Deterministic BALANCED stratified sample: every language stratum
    * contributes exactly `target` documents, where target = the smallest
    * stratum's size — the "equalize strata" downsampling a multilingual
    * training mix needs. Selection within a stratum is rank-by-md5
    * (content-addressed order, tie-broken by doc_id), so the sample is
    * exact, reproducible across engines/runs/cluster sizes, and
    * float-free — no RNG, no Bernoulli approximation of the target size.
    *
    * Scale shape: one partial-aggregated count per stratum (tiny,
    * broadcast back), then a per-stratum rank. The rank is a window =
    * one shuffle keyed on the stratum; strata are few and can be huge,
    * so at 100 TB the window partition is the skew risk — the cheap
    * relaxation is threshold sampling (keep md5 < target/count scaled
    * hex bound, per-row, shuffle-free, like [[splitAssign]]) at the cost
    * of a binomially-approximate stratum size; this operator is the
    * exact-size variant. */
  val sampleStratified: Q = Q(
    "sample_stratified",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val d = Tables.load(s, dir, "documents")
      val target = d.groupBy($"lang").agg(count(lit(1)).as("n"))
        .agg(min($"n").as("target"))
      val w = Window.partitionBy($"lang")
        .orderBy(md5($"doc_id".cast("string")), $"doc_id")
      d.select($"doc_id", $"lang")
        .withColumn("rk", row_number().over(w))
        .crossJoin(broadcast(target))
        .filter($"rk" <= $"target")
        .select($"doc_id", $"lang", $"rk")
        .orderBy($"doc_id")
    },
    Some("""
      WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
      t AS (SELECT MIN(n) AS target FROM c),
      r AS (SELECT doc_id, lang,
              ROW_NUMBER() OVER (PARTITION BY lang
                                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
            FROM documents)
      SELECT doc_id, lang, rk FROM r, t WHERE rk <= target ORDER BY doc_id
    """)
  )

  /** Per-domain document cap (the pretraining-mix "no source may
    * contribute more than N docs" rule): keep at most 10 documents per
    * `source`, chosen by content-addressed md5 rank (reproducible
    * across engines/runs/cluster sizes, no RNG). One shuffle keyed on
    * the domain; at 100 TB a hub domain makes that window partition the
    * skew term, and the standard relaxation is a two-phase cap — cap
    * per (source, salt) then re-cap per source — which preserves
    * determinism; this is the single-phase form. */
  val sourceCap: Q = Q(
    "doc_source_cap",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"source")
        .orderBy(md5($"doc_id".cast("string")), $"doc_id")
      Tables.load(s, dir, "documents")
        .select($"doc_id", $"source")
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 10)
        .orderBy($"doc_id")
    },
    Some("""
      WITH r AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents
      )
      SELECT doc_id, source, rk FROM r WHERE rk <= 10 ORDER BY doc_id
    """)
  )

  /** Every decimal(38,0) intermediate of the outlier z-test is bounded
    * by 4·cmax²·n³ (|c·n−S| ≤ 2·cmax·n, so lhs ≤ 4·cmax²·n²·(n−1) and
    * rhs ≤ 4·cmax²·n³). The exact-128-bit contract holds iff that bound
    * stays under 10³⁸ for every event type; past it, non-ANSI Spark
    * would overflow to NULL and SILENTLY DROP outliers where DuckDB's
    * HUGEINT errors loudly — so [[eventOutliers]] refuses to run
    * instead (same fence discipline as
    * [[Dedup.EmbeddingBruteForceMaxRows]]). At cent values ≤ $10k
    * (cmax=1e6) the safe per-type count is ~2.9e8 events; larger
    * corpora should pre-aggregate per (type, day) or switch the test to
    * doubles with an explicit tolerance. */
  private[operators] def outlierBoundOk(n: Long, cmaxCents: Long): Boolean =
    BigInt(4) * BigInt(cmaxCents).pow(2) * BigInt(n).pow(3) < BigInt(10).pow(38)

  /** Statistical outlier detection over the event stream: events whose
    * value is more than 2 SAMPLE standard deviations from their
    * event-type mean. The z-test is evaluated ENTIRELY in integer
    * arithmetic — values become exact cents, and |c−μ| > 2σ is squared
    * into (c·n−S)²·(n−1) > 4·n·(n·ΣC²−S²) over exact 128-bit integers
    * (decimal(38,0) here, HUGEINT in the oracle) — so the oracle
    * compare has zero floating-point hazard and no engine-specific
    * variance algorithm (Welford vs sum-of-squares) can drift the
    * boundary. The 128-bit headroom is GUARDED, not assumed: the tiny
    * per-type stats row carries max|c|, and [[outlierBoundOk]] refuses
    * any type whose 4·cmax²·n³ could overflow decimal(38,0).
    *
    * Scale shape: per-type {n, S, ΣC²} is a tiny partially-aggregated
    * frame (one row per event type) collected once — the collect IS the
    * overflow fence — and re-broadcast as a local relation over the
    * stream; the filter is then per-row. Nothing shuffles with event
    * count, and the stream is scanned once per pass (stats pass +
    * filter pass), same as the unguarded form. */
  /** an events frame → (event_id, event_type, value, c) with exact
    * cents — the projection both the stats pass and the flag pass (and
    * the STREAMING flag form) share. Works on batch and streaming
    * frames (stateless). */
  private[graft] def outlierCents(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    ev.select($"event_id", $"event_type", $"value",
      round($"value" * 100).cast("long").as("c"))
  }

  /** the guarded per-type stats side: {n, Σc, Σc²} per event type as a
    * broadcastable local relation. The collect IS the decimal(38,0)
    * overflow fence — every type's 4·cmax²·n³ bound is checked before
    * any row is flagged. In a streaming deployment this is the static
    * side, recomputed per stats snapshot. */
  private[graft] def outlierStatsFrame(s: SparkSession, ev: DataFrame): DataFrame = {
    import s.implicits._
    val dec = "decimal(38,0)"
    // sums in decimal(38,0): a long Σc² overflows past ~9e6 events/type
    // at $10k values — the "exact 128-bit" contract must hold end-to-end
    val statRows = ev.groupBy($"event_type").agg(
      count(lit(1)).as("n"), sum($"c".cast(dec)).as("sm"),
      sum($"c".cast(dec) * $"c".cast(dec)).as("ss"),
      max(abs($"c")).as("cmax")).collect()
    statRows.foreach { r =>
      val (t, n, cmax) = (r.getString(0), r.getLong(1), r.getLong(4))
      require(outlierBoundOk(n, cmax),
        s"events_outliers: type '$t' (n=$n, max|cents|=$cmax) exceeds the " +
          "decimal(38,0) bound 4*cmax^2*n^3 < 1e38; pre-aggregate or use doubles")
    }
    s.createDataFrame(
      java.util.Arrays.asList(statRows.map(r => org.apache.spark.sql.Row(
        r.get(0), r.get(1), r.get(2), r.get(3))): _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("sm",
          org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)),
        org.apache.spark.sql.types.StructField("ss",
          org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)))))
  }

  /** the stateless flag pass: cents frame × broadcast stats → rows
    * beyond 2 sample σ of their type mean, in exact 128-bit integer
    * arithmetic. `ev` may be a STREAMING frame — the join is
    * stream-static, the filter per-row, so this is the production
    * anomaly monitor shape (EventOutlierStreamSpec proves stream ≡
    * batch). */
  private[graft] def outlierFlag(ev: DataFrame, st: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    val dec = "decimal(38,0)"
    val dev = ($"c".cast(dec) * $"n".cast(dec)) - $"sm".cast(dec)
    val lhs = dev * dev * ($"n" - 1).cast(dec)
    val rhs = lit(4).cast(dec) * $"n".cast(dec) *
      ($"n".cast(dec) * $"ss".cast(dec) - $"sm".cast(dec) * $"sm".cast(dec))
    ev.join(broadcast(st), "event_type")
      .filter(lhs > rhs)
      .select($"event_id", $"event_type", $"value")
  }

  val eventOutliers: Q = Q(
    "events_outliers",
    (s, dir) => {
      import s.implicits._
      val ev = outlierCents(Tables.load(s, dir, "events"))
      val st = outlierStatsFrame(s, ev)
      outlierFlag(ev, st).orderBy($"event_id")
    },
    Some("""
      WITH ev AS (
        SELECT event_id, event_type, value,
               CAST(ROUND(value * 100) AS BIGINT) c
        FROM events
      ),
      st AS (
        SELECT event_type, COUNT(*) n, SUM(CAST(c AS HUGEINT)) sm,
               SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) ss
        FROM ev GROUP BY event_type
      )
      SELECT event_id, event_type, value
      FROM ev JOIN st USING (event_type)
      WHERE (CAST(c AS HUGEINT) * CAST(n AS HUGEINT) - CAST(sm AS HUGEINT))
              * (CAST(c AS HUGEINT) * CAST(n AS HUGEINT) - CAST(sm AS HUGEINT))
              * CAST(n - 1 AS HUGEINT)
          > CAST(4 AS HUGEINT) * CAST(n AS HUGEINT)
              * (CAST(n AS HUGEINT) * CAST(ss AS HUGEINT)
                 - CAST(sm AS HUGEINT) * CAST(sm AS HUGEINT))
      ORDER BY event_id
    """)
  )

  /** Ordered funnel analysis (view → click → purchase) per user: the
    * first view, the first click strictly after it, the first purchase
    * strictly after that, and the furthest stage reached. Timestamps
    * compare at epoch-µs on both engines (the events table's parity
    * convention).
    *
    * Scale shape: every step is a partial-aggregated min keyed on
    * user_id — the SAME key throughout, so a production N-step funnel
    * co-partitions on user once and the whole chain is one shuffle's
    * worth of movement (Spark reuses the exchange; the step joins are
    * then local). Nothing is ever per-(user, event) wide: each step
    * reduces to one row per surviving user before the next join. */
  val funnel: Q = Q(
    "events_funnel",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .select($"user_id", $"event_type", unix_micros($"ts").as("t"))
      val v = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"t").as("t_view"))
      val c = ev.filter($"event_type" === "click").join(v, "user_id")
        .filter($"t" > $"t_view")
        .groupBy($"user_id").agg(min($"t").as("t_click"))
      val p = ev.filter($"event_type" === "purchase").join(c, "user_id")
        .filter($"t" > $"t_click")
        .groupBy($"user_id").agg(min($"t").as("t_purchase"))
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .withColumn("stage",
          when($"t_purchase".isNotNull, 3)
            .when($"t_click".isNotNull, 2)
            .otherwise(1))
        .orderBy($"user_id")
    },
    Some("""
      WITH ev AS (SELECT user_id, event_type, epoch_us(ts) t FROM events),
      v AS (SELECT user_id, MIN(t) t_view FROM ev
            WHERE event_type = 'view' GROUP BY user_id),
      c AS (SELECT ev.user_id, MIN(t) t_click FROM ev JOIN v USING (user_id)
            WHERE event_type = 'click' AND t > t_view GROUP BY ev.user_id),
      p AS (SELECT ev.user_id, MIN(t) t_purchase FROM ev JOIN c USING (user_id)
            WHERE event_type = 'purchase' AND t > t_click GROUP BY ev.user_id)
      SELECT v.user_id, t_view, t_click, t_purchase,
             CAST(CASE WHEN t_purchase IS NOT NULL THEN 3
                       WHEN t_click IS NOT NULL THEN 2 ELSE 1 END AS INT) AS stage
      FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
      ORDER BY v.user_id
    """)
  )

  /** The bin columns from (tok_offset, n_tokens) — ONE closed form
    * shared by every packing variant so single-level and sharded bins
    * can never drift. */
  private def withBinColumns(df: DataFrame, seqLen: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col => c}
    df.withColumn("bin_first", floor(c("tok_offset") / seqLen).cast("long"))
      // a zero-token doc occupies no window: pin bin_last to bin_first
      // (the n-1 form would yield bin_first-1 at a window boundary)
      .withColumn("bin_last", greatest(c("bin_first"),
        floor((c("tok_offset") + c("n_tokens") - 1) / seqLen).cast("long")))
  }

  /** The packing layout over any (doc_id, lang, n_tokens) frame —
    * factored from [[packSequences]] so PackPropertySpec can drive it
    * with generated corpora (zero-token docs, single-doc langs, bin-
    * boundary sizes) beyond what the fixture contains. */
  private[operators] def packLayout(
      df: DataFrame, seqLen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col => c}
    val w = Window.partitionBy(c("lang"))
      .orderBy(md5(c("doc_id").cast("string")), c("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    withBinColumns(
      df.withColumn("tok_offset", coalesce(sum(c("n_tokens")).over(w), lit(0L))),
      seqLen)
  }

  /** GPT-style sequence packing: concatenate documents in a
    * deterministic content-addressed order and cut fixed 512-token
    * training windows, reporting each document's token offset and the
    * first/last window it lands in — the layout a training dataloader
    * consumes. Packing is PER LANGUAGE (the partition key a real mix
    * packs within), ordered by (md5(doc_id), doc_id) so the layout is
    * reproducible across engines, runs, and cluster sizes with no RNG.
    * All arithmetic is integral (token counts, exclusive running sum,
    * floor-div) — zero floating-point hazard in the oracle compare.
    *
    * Scale shape: one window-sum shuffle keyed on the pack partition.
    * Languages are few and can be huge, so at 100 TB the pack key must
    * be finer — [[packSequencesSharded]] is that production form. This
    * is the single-level form over the small fixture. */
  val packSequences: Q = Q(
    "pack_sequences",
    (s, dir) => {
      import s.implicits._
      packLayout(
        Tables.load(s, dir, "documents")
          .select($"doc_id", $"lang",
            size(TextFns.tokens($"text")).cast("long").as("n_tokens")),
        512)
        .orderBy($"doc_id")
    },
    Some("""
      WITH t AS (
        SELECT doc_id, lang,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
        FROM documents
      ),
      o AS (
        SELECT doc_id, lang, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (
                 PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
        FROM t
      )
      SELECT doc_id, lang, n_tokens, tok_offset,
             CAST(FLOOR(tok_offset / 512.0) AS BIGINT) AS bin_first,
             GREATEST(CAST(FLOOR(tok_offset / 512.0) AS BIGINT),
                      CAST(FLOOR((tok_offset + n_tokens - 1) / 512.0) AS BIGINT)) AS bin_last
      FROM o
      ORDER BY doc_id
    """)
  )

  /** PACKING EFFICIENCY report over [[packSequences]]' layout: per
    * language stream — total tokens, bin count (= ceil(total/512),
    * the non-empty bins of the contiguous layout — NOT max(bin_last)+1,
    * which would count an empty trailing bin when a zero-token doc's
    * offset lands on a 512 multiple), overall fill (total / (bins·512)
    * in exact ppm: only the final bin can be partial in the contiguous
    * layout, so fill quantifies exactly the
    * padding a trainer would burn per stream), and how many documents
    * SPAN a bin boundary (the attention-mask / document-severing cost
    * of contiguous packing vs first-fit). The metric every packing
    * strategy is judged by, as one oracled query.
    *
    * Scale shape: one per-(lang) aggregation over the layout columns —
    * the layout itself is [[packSequences]]' one lang-keyed window;
    * the report adds a partial-aggregated exchange on the handful of
    * langs. */
  val packEfficiency: Q = Q(
    "pack_efficiency",
    (s, dir) => {
      import s.implicits._
      packLayout(
        Tables.load(s, dir, "documents")
          .select($"doc_id", $"lang",
            size(TextFns.tokens($"text")).cast("long").as("n_tokens")),
        512)
        .groupBy($"lang")
        .agg(sum($"n_tokens").as("total_tokens"),
          sum(when($"bin_first" =!= $"bin_last", 1L).otherwise(0L))
            .as("docs_spanning"))
        // n_bins = ceil(total/512), NOT max(bin_last)+1: a zero-token
        // document whose offset lands on a 512 multiple at stream end
        // would otherwise count one empty trailing bin and deflate
        // fill_ppm (round-10 ADVICE); ceil counts exactly the
        // non-empty bins of the contiguous layout
        .select($"lang", $"total_tokens",
          expr("greatest((total_tokens + 511L) div 512L, 1L)").as("n_bins"),
          $"docs_spanning")
        .select($"lang", $"total_tokens", $"n_bins",
          expr("(total_tokens * 1000000L) div (n_bins * 512L)").as("fill_ppm"),
          $"docs_spanning")
        .orderBy($"lang")
    },
    Some("""
      WITH t AS (
        SELECT doc_id, lang,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
        FROM documents
      ),
      o AS (
        SELECT doc_id, lang, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (
                 PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
        FROM t
      ),
      lay AS (
        SELECT lang, n_tokens,
               CAST(FLOOR(tok_offset / 512.0) AS BIGINT) AS bin_first,
               GREATEST(CAST(FLOOR(tok_offset / 512.0) AS BIGINT),
                        CAST(FLOOR((tok_offset + n_tokens - 1) / 512.0) AS BIGINT)) AS bin_last
        FROM o
      )
      SELECT lang, CAST(SUM(n_tokens) AS BIGINT) total_tokens,
             CAST(GREATEST((SUM(n_tokens) + 511) // 512, 1) AS BIGINT) n_bins,
             CAST((SUM(n_tokens) * 1000000)
                  // (GREATEST((SUM(n_tokens) + 511) // 512, 1) * 512) AS BIGINT) fill_ppm,
             CAST(SUM(CASE WHEN bin_first <> bin_last THEN 1 ELSE 0 END) AS BIGINT) docs_spanning
      FROM lay
      GROUP BY lang
      ORDER BY lang
    """)
  )

  /** Pure first-fit kernel: bin count after placing `sizes` (each in
    * 1..cap, already in first-fit order — callers sort (size desc,
    * doc_id)) into cap-sized bins, each item into the LOWEST-indexed
    * bin with room, else a fresh bin. O(n·bins); per-group sequential
    * by nature — the oracle's recursive CTE replays it step-for-step. */
  /** ONE first-fit placement against open-bin remainders `rem`
    * (mutated in place; a fresh bin is appended when nothing fits).
    * Shared verbatim by the batch fold below and the streaming form
    * ([[graft.streaming.FfdPackStream]]) — stream ≡ batch is
    * structural, not re-implemented. */
  private[graft] def ffdPlace(
      rem: scala.collection.mutable.ArrayBuffer[Long], sz: Long, cap: Long): Int = {
    val i = rem.indexWhere(_ >= sz)
    if (i < 0) { rem += cap - sz; rem.length - 1 } else { rem(i) -= sz; i }
  }

  /** first-fit core returning (bin index per item in input order,
    * remaining capacity per bin in creation order). */
  private[operators] def ffdPack(sizes: Seq[Long], cap: Long): (Seq[Int], Seq[Long]) = {
    val rem = scala.collection.mutable.ArrayBuffer.empty[Long]
    val bins = sizes.map(sz => ffdPlace(rem, sz, cap))
    (bins, rem.toSeq)
  }

  private[operators] def ffdRemainders(sizes: Seq[Long], cap: Long): Seq[Long] =
    ffdPack(sizes, cap)._2

  private[operators] def ffdBinCount(sizes: Seq[Long], cap: Long): Long =
    ffdRemainders(sizes, cap).length.toLong

  /** FIRST-FIT-DECREASING packing twin — the comparison
    * [[packEfficiency]] exists to make. Per language stream, both
    * layouts of the SAME corpus side by side: the contiguous layout's
    * bin count / severed-document count (every doc straddling a
    * 512-boundary pays an attention-mask or truncation cost at train
    * time) against a first-fit-decreasing assignment ((n_tokens DESC,
    * doc_id) order, each doc whole into the first bin with room) where
    * NO in-cap document is ever severed — the fill delta is the price
    * of that, and on natural corpora (docs ≪ 512 tokens) it is zero.
    * Oversized docs (> 512 tokens) are excluded from the fit and
    * accounted as dedicated ceil(n/512)-bin runs, severed in both
    * layouts — FFD packs documents, it cannot shrink them.
    *
    * Scale shape: the contiguous side is [[packLayout]]'s one
    * lang-keyed window; the FFD side sorts each language's in-cap docs
    * once and folds them sequentially per group (`mapGroups`) — the
    * fold is inherently serial PER STREAM (the oracle replays it as a
    * recursive CTE), so at 100 TB the pack key is the
    * [[packSequencesSharded]] (lang, shard) key and each shard-stream
    * folds independently; fold state is just the open bins' remaining
    * capacities (≤ stream bins, bounded by stream tokens/512). */
  val packFfd: Q = Q(
    "pack_ffd",
    (s, dir) => {
      import s.implicits._
      val cap = 512L
      val t = Tables.load(s, dir, "documents")
        .select($"doc_id", $"lang",
          size(TextFns.tokens($"text")).cast("long").as("n_tokens"))
        .persist()   // three consumers: contiguous layout, fit, big-doc agg
      val contig = packLayout(t, 512)
        .groupBy($"lang")
        .agg(sum($"n_tokens").as("total_tokens"),
          sum(when($"bin_first" =!= $"bin_last", 1L).otherwise(0L))
            .as("spanning_contig"))
        .select($"lang", $"total_tokens",
          expr("greatest((total_tokens + 511L) div 512L, 1L)").as("n_bins_contig"),
          $"spanning_contig")
      val ffdSmall = t.filter($"n_tokens" >= 1L && $"n_tokens" <= cap)
        .select($"lang", $"doc_id", $"n_tokens").as[(String, Long, Long)]
        .groupByKey(_._1)
        .mapGroups { (lang, it) =>
          val sizes = it.toArray.sortBy(d => (-d._3, d._2)).map(_._3)
          (lang, ffdBinCount(scala.collection.immutable.ArraySeq.unsafeWrapArray(sizes), cap))
        }
        .toDF("lang", "bins_small")
      val big = t.filter($"n_tokens" > cap)
        .groupBy($"lang")
        .agg(sum(expr("(n_tokens + 511L) div 512L")).as("bins_big"),
          count(lit(1)).as("spanning_ffd"))
      contig.join(broadcast(ffdSmall), Seq("lang"), "left")
        .join(broadcast(big), Seq("lang"), "left")
        .na.fill(0L, Seq("bins_small", "bins_big", "spanning_ffd"))
        .select($"lang", $"total_tokens", $"n_bins_contig",
          ($"bins_small" + $"bins_big").as("n_bins_ffd"),
          $"spanning_contig", $"spanning_ffd",
          expr("(total_tokens * 1000000L) div (n_bins_contig * 512L)")
            .as("fill_contig_ppm"),
          expr("CASE WHEN bins_small + bins_big = 0 THEN 0L ELSE (total_tokens * 1000000L) div ((bins_small + bins_big) * 512L) END")
            .as("fill_ffd_ppm"))
        .orderBy($"lang")
    },
    Some("""
      WITH RECURSIVE t AS (
        SELECT doc_id, lang,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
        FROM documents
      ),
      o AS (
        SELECT doc_id, lang, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (
                 PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
        FROM t
      ),
      lay AS (
        SELECT lang, n_tokens,
               CAST(FLOOR(tok_offset / 512.0) AS BIGINT) AS bin_first,
               GREATEST(CAST(FLOOR(tok_offset / 512.0) AS BIGINT),
                        CAST(FLOOR((tok_offset + n_tokens - 1) / 512.0) AS BIGINT)) AS bin_last
        FROM o
      ),
      contig AS (SELECT lang, SUM(n_tokens) total_tokens,
                   GREATEST((SUM(n_tokens) + 511) // 512, 1) n_bins_contig,
                   SUM(CASE WHEN bin_first <> bin_last THEN 1 ELSE 0 END) spanning_contig
                 FROM lay GROUP BY 1),
      small AS (SELECT lang, doc_id, n_tokens,
                  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_tokens DESC, doc_id) rn
                FROM t WHERE n_tokens BETWEEN 1 AND 512),
      nsm AS (SELECT lang, COUNT(*) n FROM small GROUP BY 1),
      ffd AS (
        SELECT lang, CAST(0 AS BIGINT) i, CAST([] AS BIGINT[]) rem FROM nsm
        UNION ALL
        SELECT lang, i + 1,
               CASE WHEN idx IS NULL OR idx = 0 THEN list_append(rem, 512 - sz)
                    ELSE list_concat(list_concat(rem[1:CAST(idx AS INT) - 1],
                                                 [rem[CAST(idx AS INT)] - sz]),
                                     rem[CAST(idx AS INT) + 1:CAST(len(rem) AS INT)])
               END
        FROM (
          SELECT f.lang, f.i, f.rem, s.n_tokens sz,
                 list_position(list_transform(f.rem, r -> r >= s.n_tokens), true) idx
          FROM ffd f JOIN small s ON s.lang = f.lang AND s.rn = f.i + 1
        )
      ),
      done AS (SELECT f.lang, CAST(len(rem) AS BIGINT) bins_small
               FROM ffd f JOIN nsm ON nsm.lang = f.lang AND f.i = nsm.n),
      big AS (SELECT lang, SUM((n_tokens + 511) // 512) bins_big, COUNT(*) n_spanning
              FROM t WHERE n_tokens > 512 GROUP BY 1)
      SELECT c.lang, CAST(total_tokens AS BIGINT) total_tokens,
             CAST(n_bins_contig AS BIGINT) n_bins_contig,
             CAST(COALESCE(bins_small, 0) + COALESCE(bins_big, 0) AS BIGINT) n_bins_ffd,
             CAST(spanning_contig AS BIGINT) spanning_contig,
             CAST(COALESCE(n_spanning, 0) AS BIGINT) spanning_ffd,
             CAST((total_tokens * 1000000) // (n_bins_contig * 512) AS BIGINT) fill_contig_ppm,
             CAST(CASE WHEN COALESCE(bins_small, 0) + COALESCE(bins_big, 0) = 0 THEN 0
                  ELSE (total_tokens * 1000000)
                       // ((COALESCE(bins_small, 0) + COALESCE(bins_big, 0)) * 512) END AS BIGINT) fill_ffd_ppm
      FROM contig c LEFT JOIN done USING (lang) LEFT JOIN big USING (lang)
      ORDER BY lang
    """)
  )

  /** The PER-DOCUMENT first-fit-decreasing layout — the assignment
    * table [[packFfd]]'s summary measures, in dataloader-consumable
    * form (the FFD counterpart of [[packSequences]]): each in-cap doc's
    * one bin (`bin_first == bin_last` — FFD never severs what fits),
    * bins numbered in creation order per language; oversized docs
    * (> 512) follow as dedicated ceil(n/512)-bin runs in
    * (tokens DESC, doc_id) order; zero-token docs carry no training
    * content and are absent (the contiguous layout keeps them only to
    * preserve offsets).
    *
    * Scale shape: the same per-stream `mapGroups` fold as [[packFfd]] —
    * one pass now also EMITS the assignment instead of just counting
    * bins (the oracle's recursive CTE carries the chosen bin through
    * each step); the oversized tail is a per-lang window over the
    * rare > cap docs only, and the small-bin base offsets join back
    * broadcast. At 100 TB the fold key is the sharded
    * [[packSequencesSharded]] (lang, shard) key, exactly as there. */
  val packFfdLayout: Q = Q(
    "pack_ffd_layout",
    (s, dir) =>
      packFfdLayoutFrom(
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"))),
    packFfdLayoutOracle
  )

  /** the layout body over a prepared (doc_id, lang, n_tokens) frame —
    * split out so the composed ingest→serve chain
    * ([[graft.streaming.PipelineE2E]]) can replay the batch layout over
    * the ADMITTED manifest, not just the full documents table. */
  private[graft] def packFfdLayoutFrom(t0: DataFrame): DataFrame = {
    val s = t0.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val cap = 512L
    val t = t0.localCheckpoint()   // two consumers: small fold + big tail
    val smallAsg = t.filter($"n_tokens" >= 1L && $"n_tokens" <= cap)
        .select($"lang", $"doc_id", $"n_tokens").as[(String, Long, Long)]
        .groupByKey(_._1)
        .flatMapGroups { (lang, it) =>
          val docs = it.toArray.sortBy(d => (-d._3, d._2))
          val bins = ffdPack(scala.collection.immutable.ArraySeq.unsafeWrapArray(
            docs.map(_._3)), cap)._1
          docs.iterator.zip(bins.iterator).map { case ((_, id, n), b) =>
            (id, lang, n, b.toLong, b.toLong)
          }
        }
        .toDF("doc_id", "lang", "n_tokens", "bin_first", "bin_last")
      val bs = smallAsg.groupBy($"lang").agg((max($"bin_first") + 1L).as("bins_small"))
      val wBig = Window.partitionBy($"lang").orderBy($"n_tokens".desc, $"doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val big = t.filter($"n_tokens" > cap)
        .withColumn("runs", expr("(n_tokens + 511L) div 512L"))
        .withColumn("cum_prev", coalesce(sum($"runs").over(wBig), lit(0L)))
        .join(broadcast(bs), Seq("lang"), "left")
        .na.fill(0L, Seq("bins_small"))
        .select($"doc_id", $"lang", $"n_tokens",
          ($"bins_small" + $"cum_prev").as("bin_first"),
          ($"bins_small" + $"cum_prev" + $"runs" - 1L).as("bin_last"))
    smallAsg.union(big).orderBy($"doc_id")
  }

  // def, not val: referenced by packFfdLayout ABOVE its own definition
  // point — a val here would still be null during object init
  private def packFfdLayoutOracle: Option[String] =
    Some("""
      WITH RECURSIVE t AS (
        SELECT doc_id, lang,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
        FROM documents
      ),
      small AS (SELECT lang, doc_id, n_tokens,
                  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_tokens DESC, doc_id) rn
                FROM t WHERE n_tokens BETWEEN 1 AND 512),
      nsm AS (SELECT lang, COUNT(*) n FROM small GROUP BY 1),
      ffd AS (
        SELECT lang, CAST(0 AS BIGINT) i, CAST([] AS BIGINT[]) rem,
               CAST(NULL AS BIGINT) doc_id, CAST(NULL AS BIGINT) n_tokens,
               CAST(NULL AS BIGINT) bin
        FROM nsm
        UNION ALL
        SELECT lang, i + 1,
               CASE WHEN idx IS NULL OR idx = 0 THEN list_append(rem, 512 - sz)
                    ELSE list_concat(list_concat(rem[1:CAST(idx AS INT) - 1],
                                                 [rem[CAST(idx AS INT)] - sz]),
                                     rem[CAST(idx AS INT) + 1:CAST(len(rem) AS INT)])
               END,
               did, sz,
               CAST(CASE WHEN idx IS NULL OR idx = 0 THEN len(rem)
                    ELSE idx - 1 END AS BIGINT)
        FROM (
          SELECT f.lang, f.i, f.rem, s.n_tokens sz, s.doc_id did,
                 list_position(list_transform(f.rem, r -> r >= s.n_tokens), true) idx
          FROM ffd f JOIN small s ON s.lang = f.lang AND s.rn = f.i + 1
        )
      ),
      asgn AS (SELECT lang, doc_id, n_tokens, bin FROM ffd WHERE doc_id IS NOT NULL),
      bs AS (SELECT lang, MAX(bin) + 1 AS bins_small FROM asgn GROUP BY 1),
      big0 AS (SELECT lang, doc_id, n_tokens, (n_tokens + 511) // 512 runs,
                 COALESCE(SUM((n_tokens + 511) // 512) OVER (PARTITION BY lang
                   ORDER BY n_tokens DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cum_prev
               FROM t WHERE n_tokens > 512)
      SELECT doc_id, lang, n_tokens,
             CAST(bin AS BIGINT) bin_first, CAST(bin AS BIGINT) bin_last
      FROM asgn
      UNION ALL
      SELECT b.doc_id, b.lang, b.n_tokens,
             CAST(COALESCE(bs.bins_small, 0) + cum_prev AS BIGINT),
             CAST(COALESCE(bs.bins_small, 0) + cum_prev + runs - 1 AS BIGINT)
      FROM big0 b LEFT JOIN bs USING (lang)
      ORDER BY doc_id
    """)

  /** Mixture-weight downsampling (the pretraining "data mixing" step):
    * each source keeps a configured fraction of its documents —
    * full src0-src4, half src5-src9, a quarter of the rest — selected
    * by a content-addressed hex threshold: keep iff the first 4 md5
    * hex chars of doc_id ≤ the source's threshold ('ffff' = all,
    * '7fff' = exactly 32768/65536, '3fff' = exactly 1/4). No RNG, no
    * Bernoulli drift: the kept set is a pure function of content, so
    * reruns, engines, and cluster sizes agree row-for-row, and the
    * realized fraction is exact in expectation over the uniform md5.
    *
    * Scale shape: the rate table is configuration (dozens of rows) —
    * broadcast; the corpus side is one scan with a per-row projection
    * and filter, shuffle-free like [[splitAssign]]. At 100 TB this is
    * a free column plus a predicate. */
  val mixSample: Q = Q(
    "mix_sample",
    (s, dir) => {
      import s.implicits._
      val rates = ((0 to 4).map(i => (s"src$i", "ffff")) ++
        (5 to 9).map(i => (s"src$i", "7fff")) ++
        (10 to 19).map(i => (s"src$i", "3fff")))
        .toDF("source", "thr")
      // LEFT join + default: a source absent from the rate table gets
      // the quarter rate (the documented "rest" band) instead of being
      // silently dropped by an inner join
      Tables.load(s, dir, "documents")
        .select($"doc_id", $"source",
          substring(md5($"doc_id".cast("string")), 1, 4).as("bucket"))
        .join(broadcast(rates), Seq("source"), "left")
        .filter($"bucket" <= coalesce($"thr", lit("3fff")))
        .select($"doc_id", $"source", $"bucket")
        .orderBy($"doc_id")
    },
    Some("""
      WITH rates(source, thr) AS (
        VALUES ('src0','ffff'),('src1','ffff'),('src2','ffff'),('src3','ffff'),
               ('src4','ffff'),('src5','7fff'),('src6','7fff'),('src7','7fff'),
               ('src8','7fff'),('src9','7fff'),('src10','3fff'),('src11','3fff'),
               ('src12','3fff'),('src13','3fff'),('src14','3fff'),('src15','3fff'),
               ('src16','3fff'),('src17','3fff'),('src18','3fff'),('src19','3fff')
      )
      SELECT doc_id, source, bucket
      FROM (SELECT doc_id, source,
                   substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS bucket
            FROM documents) d
      LEFT JOIN rates USING (source)
      WHERE bucket <= COALESCE(thr, '3fff')
      ORDER BY doc_id
    """)
  )

  /** Epoch-weighted upsampling — the repetition counterpart of
    * [[mixSample]]: high-value sources appear MORE than once per epoch
    * (Llama/DoReMi-style mixture weights > 1). A broadcast weight table
    * gives each source an integer base copy count plus a fractional
    * tail expressed as a content-addressed md5-bucket threshold (so
    * weight 2.5 = 2 full copies + the half of documents whose bucket
    * clears the threshold gets a third); sources absent from the table
    * default to exactly one copy. Emits one row per (document, copy).
    *
    * Scale shape: broadcast left join + `explode(sequence(...))` — a
    * pure per-row projection with NO shuffle of the corpus, and the
    * output is written partition-local. Deterministic (content-
    * addressed buckets, no RNG), so fully oracled. */
  val mixUpsample: Q = Q(
    "mix_upsample",
    (s, dir) => {
      import s.implicits._
      val weights = ((0 to 4).map(i => (s"src$i", 2L, "7fff")) ++
        (5 to 9).map(i => (s"src$i", 1L, "3fff")))
        .toDF("source", "base", "thr")
      Tables.load(s, dir, "documents")
        .select($"doc_id", $"source",
          substring(md5($"doc_id".cast("string")), 1, 4).as("bucket"))
        .join(broadcast(weights), Seq("source"), "left")
        .withColumn("n_copies",
          coalesce($"base", lit(1L)) +
            when($"bucket" <= $"thr", 1L).otherwise(0L)) // null thr → +0
        .select($"doc_id", $"source",
          explode(sequence(lit(1L), $"n_copies")).as("copy_idx"))
        .orderBy($"doc_id", $"copy_idx")
    },
    Some("""
      WITH w(source, base, thr) AS (
        VALUES ('src0',2,'7fff'),('src1',2,'7fff'),('src2',2,'7fff'),
               ('src3',2,'7fff'),('src4',2,'7fff'),('src5',1,'3fff'),
               ('src6',1,'3fff'),('src7',1,'3fff'),('src8',1,'3fff'),
               ('src9',1,'3fff')
      ),
      e AS (
        SELECT doc_id, source,
               COALESCE(base, 1)
                 + CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) <= thr
                        THEN 1 ELSE 0 END AS n_copies
        FROM documents LEFT JOIN w USING (source)
      )
      SELECT doc_id, source,
             unnest(generate_series(1, CAST(n_copies AS BIGINT))) AS copy_idx
      FROM e
      ORDER BY doc_id, copy_idx
    """)
  )

  /** The composed curation pass — the flagship "what a user actually
    * runs": quality gate (≥ 20 tokens) → exact content dedup (min
    * doc_id survives per canonical fingerprint) → per-source cap
    * (≤ 10, content-addressed rank) → train/val/test split, emitting
    * the final curated manifest in one plan. Every stage is an
    * already-oracled operator's logic ([[TextFns.fingerprint]],
    * [[sourceCap]], [[splitAssign]]); composing them end-to-end proves
    * the stages stay exact UNDER each other, not just in isolation.
    *
    * Scale shape: one scan; dedup and cap are each one keyed window
    * (fingerprint, then source) — the same two shuffles the standalone
    * operators pay — and the quality gate runs FIRST so both windows
    * see only surviving rows. Nothing here is per-pair or iterative;
    * at 100 TB this is two partial-aggregated exchanges over a
    * filtered corpus. */
  val curationE2e: Q = Q(
    "curation_e2e",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val base = Tables.load(s, dir, "documents")
        .select($"doc_id", $"source", $"lang",
          size(TextFns.tokens($"text")).cast("long").as("n_tokens"),
          TextFns.fingerprint($"text").as("fp"),
          md5($"doc_id".cast("string")).as("mh"))   // one md5, reused 3×
        .filter($"n_tokens" >= 20)
      val wDedup = Window.partitionBy($"fp").orderBy($"doc_id")
      val wCap = Window.partitionBy($"source").orderBy($"mh", $"doc_id")
      base
        .withColumn("dup_rk", row_number().over(wDedup))
        .filter($"dup_rk" === 1)
        .withColumn("cap_rk", row_number().over(wCap))
        .filter($"cap_rk" <= 10)
        .withColumn("split",
          when(substring($"mh", 1, 2) < "cd", "train")
            .when(substring($"mh", 1, 2) < "e6", "val")
            .otherwise("test"))
        .select($"doc_id", $"source", $"lang", $"n_tokens", $"split")
        .orderBy($"doc_id")
    },
    Some("""
      WITH base AS (
        SELECT doc_id, source, lang,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
               md5(array_to_string(list_sort(list_distinct(
                 list_filter(string_split(text, ' '), x -> x <> ''))), ' ')) AS fp
        FROM documents
      ),
      q AS (SELECT * FROM base WHERE n_tokens >= 20),
      d AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS dup_rk
            FROM q),
      c AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS cap_rk
            FROM d WHERE dup_rk = 1)
      SELECT doc_id, source, lang, n_tokens,
             CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
                  WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                  ELSE 'test' END AS split
      FROM c WHERE cap_rk <= 10
      ORDER BY doc_id
    """)
  )

  /** The PRODUCTION form of [[packSequences]]: two-level packing that
    * bounds window skew. Documents are sliced into 16 deterministic
    * shards per language (first md5 hex char of doc_id); each shard
    * packs independently (window keyed on (lang, shard) — fan-out ×16
    * over the single-level form, so no window partition exceeds
    * ~1/16th of a language), and each shard's documents are then
    * offset by the running total of all PRIOR shards' tokens — a
    * per-(lang, shard) one-row frame, cumsum'd and joined back
    * broadcast-size. Global offsets differ from the single-level form
    * (shard-major order instead of global md5 order) but the packing
    * contract is identical: within a lang, offsets are dense, disjoint
    * and total exactly the token count — asserted by the spec against
    * [[packSequences]]'s totals. At 100 TB the shard count is the skew
    * dial (256 or 4096 slices, same code). */
  val packSequencesSharded: Q = Q(
    "pack_sequences_sharded",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val seqLen = 512
      val t = Tables.load(s, dir, "documents")
        .select($"doc_id", $"lang",
          size(TextFns.tokens($"text")).cast("long").as("n_tokens"),
          md5($"doc_id".cast("string")).as("mh"))
        .withColumn("shard", substring($"mh", 1, 1))
      // local (within-shard) exclusive running sum — the skew-bounded window
      val wLocal = Window.partitionBy($"lang", $"shard")
        .orderBy($"mh", $"doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      // per-shard totals, cumsum'd over prior shards within the lang:
      // 16 rows per lang — broadcast-size whatever the corpus is
      val wBase = Window.partitionBy($"lang").orderBy($"shard")
        .rowsBetween(Window.unboundedPreceding, -1)
      val bases = t.groupBy($"lang", $"shard")
        .agg(sum($"n_tokens").as("shard_tokens"))
        .withColumn("shard_base",
          coalesce(sum($"shard_tokens").over(wBase), lit(0L)))
        .select($"lang", $"shard", $"shard_base")
      withBinColumns(
        t.withColumn("local_offset", coalesce(sum($"n_tokens").over(wLocal), lit(0L)))
          .join(broadcast(bases), Seq("lang", "shard"))
          .withColumn("tok_offset", $"shard_base" + $"local_offset"),
        seqLen)
        .select($"doc_id", $"lang", $"shard", $"n_tokens", $"tok_offset",
          $"bin_first", $"bin_last")
        .orderBy($"doc_id")
    },
    Some("""
      WITH t AS (
        SELECT doc_id, lang,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
               md5(CAST(doc_id AS VARCHAR)) AS mh,
               substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard
        FROM documents
      ),
      l AS (
        SELECT doc_id, lang, shard, n_tokens, mh,
               CAST(COALESCE(SUM(n_tokens) OVER (
                 PARTITION BY lang, shard ORDER BY mh, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS local_offset
        FROM t
      ),
      b AS (
        SELECT lang, shard,
               CAST(COALESCE(SUM(shard_tokens) OVER (
                 PARTITION BY lang ORDER BY shard
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS shard_base
        FROM (SELECT lang, shard, SUM(n_tokens) AS shard_tokens
              FROM t GROUP BY lang, shard)
      ),
      o AS (
        SELECT l.doc_id, l.lang, l.shard, l.n_tokens,
               CAST(b.shard_base + l.local_offset AS BIGINT) AS tok_offset
        FROM l JOIN b USING (lang, shard)
      )
      SELECT doc_id, lang, shard, n_tokens, tok_offset,
             CAST(FLOOR(tok_offset / 512.0) AS BIGINT) AS bin_first,
             GREATEST(CAST(FLOOR(tok_offset / 512.0) AS BIGINT),
                      CAST(FLOOR((tok_offset + n_tokens - 1) / 512.0) AS BIGINT)) AS bin_last
      FROM o
      ORDER BY doc_id
    """)
  )

  /** Two-phase per-source cap — the production (skew-bounded) form of
    * [[sourceCap]], same output, gated against the SAME single-window
    * oracle SQL (so the rewrite is PROVEN value-equal, the same
    * discipline as [[packSequencesSharded]]). Phase 1 ranks within
    * (source, shard) where shard = first md5 hex char: 16 shards bound
    * any hub domain's window partition to ~1/16 of its rows, and any
    * doc with local rank > cap is provably outside the global top-cap
    * (its ≥cap same-shard predecessors are global predecessors too), so
    * phase 1 also PRUNES: at most 16·cap rows per source reach phase 2.
    * Phase 2 re-ranks the ≤160 survivors per source — a window over a
    * vanishing row count at any corpus size. Survivor rank == global
    * rank for every kept doc: a global top-cap doc's full predecessor
    * set survives phase 1 (each predecessor has < cap same-shard
    * predecessors, else the doc itself would rank > cap). */
  val sourceCapTwoPhase: Q = Q(
    "doc_source_cap_2phase",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val cap = 10
      val t = Tables.load(s, dir, "documents")
        .select($"doc_id", $"source", md5($"doc_id".cast("string")).as("mh"))
        .withColumn("shard", substring($"mh", 1, 1))
      val wLocal = Window.partitionBy($"source", $"shard")
        .orderBy($"mh", $"doc_id")
      val wGlobal = Window.partitionBy($"source").orderBy($"mh", $"doc_id")
      t.withColumn("lrk", row_number().over(wLocal))
        .filter($"lrk" <= cap)                       // ≤ 16·cap rows/source survive
        .withColumn("rk", row_number().over(wGlobal)) // tiny window over survivors
        .filter($"rk" <= cap)
        .select($"doc_id", $"source", $"rk")
        .orderBy($"doc_id")
    },
    Some("""
      WITH r AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents
      )
      SELECT doc_id, source, rk FROM r WHERE rk <= 10 ORDER BY doc_id
    """)
  )

  /** Threshold-form stratified sample — the shuffle-FREE relaxation of
    * [[sampleStratified]] (that operator's scaladoc names this as the
    * 100 TB escape hatch; this ships it). Per-stratum keep fraction
    * target/n becomes an 8-hex-digit md5-prefix bound computed in PURE
    * INTEGER arithmetic (target·2³² div n, capped at 2³²−1, rendered
    * lpad(hex)) — keep iff the doc's first 8 md5 hex digits compare
    * below it. No window, no rank, no RNG: per-row projection against a
    * broadcast 5-row threshold table, reproducible across engines and
    * cluster sizes. The trade documented on the exact form: stratum
    * sizes are binomially approximate (±√n), and the full-keep stratum
    * drops only the 2⁻³² prefix 'ffffffff'. */
  /** Shared scaffold for the md5-prefix threshold samplers: per-lang
    * counts, the global min broadcast alongside as `nmin`, a per-lang
    * 8-hex-digit bound from `thrLong` (a Long column over `nmin`/`n`,
    * capped at 2³²−1), then the shuffle-free per-row keep filter.
    * Centralized so a threshold-formula fix can never drift between
    * the samplers ([[sampleStratifiedThreshold]], [[mixTemperature]]). */
  private def thresholdSample(s: SparkSession, dir: String, thrLong: Column): DataFrame = {
    import s.implicits._
    val d = Tables.load(s, dir, "documents")
    val counts = d.groupBy($"lang").agg(count(lit(1)).as("n"))
    val thr = counts
      .crossJoin(broadcast(counts.agg(min($"n").as("nmin"))))
      .withColumn("thr_hex",
        lpad(lower(hex(least(thrLong, lit(4294967295L)))), 8, "0"))
      .select($"lang", $"thr_hex")
    d.select($"doc_id", $"lang",
        substring(md5($"doc_id".cast("string")), 1, 8).as("pfx"))
      .join(broadcast(thr), Seq("lang"))
      .filter($"pfx" < $"thr_hex")
      .select($"doc_id", $"lang")
      .orderBy($"doc_id")
  }

  /** DuckDB rendition of [[thresholdSample]]: `thrSql` may reference
    * `n` (the stratum count) and `(SELECT MIN(n) FROM c)` (nmin). */
  private def thresholdSampleSql(thrSql: String): String = s"""
      WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
      t AS (SELECT lang,
              lpad(lower(hex(LEAST($thrSql, 4294967295))), 8, '0') AS thr_hex
            FROM c)
      SELECT d.doc_id, d.lang
      FROM documents d JOIN t ON d.lang = t.lang
      WHERE substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < t.thr_hex
      ORDER BY d.doc_id
    """

  /** nmin·2³² div n WITHOUT Long overflow: nmin can exceed 2³¹ at the
    * corpus sizes this operator exists for, and with ANSI off Spark's
    * bare `nmin * 4294967296` would WRAP NEGATIVE and silently turn the
    * stratum into keep-everything (lpad truncating hex(negative) to
    * 'ffffffff'). The product is computed in decimal(38,0) — exact to
    * 10³⁸ — and `div` (IntegralDivide accepts decimals) returns the
    * exact bigint quotient; the DuckDB side widens to HUGEINT for the
    * same exactness. PipelineSpec pins the over-2³¹ case. */
  private[operators] val stratifiedThrCol: Column =
    expr("CAST(nmin AS DECIMAL(38,0)) * 4294967296 div n")
  private[operators] val stratifiedThrSql: String =
    "CAST(CAST((SELECT MIN(n) FROM c) AS HUGEINT) * 4294967296 // n AS BIGINT)"

  val sampleStratifiedThreshold: Q = Q(
    "sample_stratified_threshold",
    (s, dir) => thresholdSample(s, dir, stratifiedThrCol),
    Some(thresholdSampleSql(stratifiedThrSql))
  )

  /** Temperature-smoothed language mixing (the multilingual-pretraining
    * α-sampling rule, α = 0.5): per-document keep rate
    * r_l = (n_min/n_l)^(1−α) = sqrt(n_min/n_l) — between full
    * equalization (α=0, [[sampleStratifiedThreshold]]'s rate) and no
    * resampling (α=1), boosting low-resource languages without
    * flattening the mix. Selection is the same content-addressed
    * md5-prefix threshold, and the float path is ORACLE-SAFE BY IEEE
    * 754: binary64 divide, sqrt, and multiply are all
    * correctly-rounded-required operations, so Spark (Math.sqrt) and
    * DuckDB (libm) produce bit-identical thresholds — no approximate
    * tolerance needed. Shuffle-free: tiny per-lang count agg broadcast
    * back, then a per-row filter. */
  /** sqrt(nmin/n)·2³² as a Long — overflow-free by construction (the
    * double is ≤ 2³² before the cast) and bit-stable across engines
    * (IEEE correctly-rounded divide/sqrt/multiply). */
  private[operators] val temperatureThrCol: Column =
    floor(lit(4294967296.0) * sqrt(col("nmin").cast("double") / col("n").cast("double"))).cast("long")
  private[operators] val temperatureThrSql: String =
    """CAST(FLOOR(4294967296.0 *
         sqrt(CAST((SELECT MIN(n) FROM c) AS DOUBLE) / CAST(n AS DOUBLE))) AS BIGINT)"""

  val mixTemperature: Q = Q(
    "mix_temperature",
    (s, dir) => thresholdSample(s, dir, temperatureThrCol),
    Some(thresholdSampleSql(temperatureThrSql))
  )

  /** Rebalance the corpus to a TARGET language mix (the "data recipe"
    * step of pretraining-corpus assembly): given integer target
    * weights w_l, emit the largest corpus achievable by pure
    * downsampling whose expected composition matches w — keep C·w_l
    * documents of language l where C = min_l ⌊n_l/w_l⌋, so the
    * binding stratum is kept (nearly) whole and every other language
    * thins to proportion. Selection is the same content-addressed
    * md5-prefix threshold as [[thresholdSample]], with the keep rate
    * C·w_l/n_l rendered as an EXACT integer threshold
    * (C·w_l·2³² div n_l in decimal(38,0)/HUGEINT — the
    * [[stratifiedThrCol]] overflow rule), so both engines agree
    * bit-for-bit at any corpus size. Languages absent from the recipe
    * are dropped by the inner join — a recipe IS a whitelist
    * (contrast [[mixSample]]'s left-join default, where the table is
    * a per-source rate override).
    *
    * Scale shape: per-lang count agg (tiny, map-side partial) +
    * broadcast threshold table + one shuffle-free filtered scan —
    * identical to [[mixTemperature]]. */
  val mixToTarget: Q = Q(
    "mix_to_target",
    (s, dir) => {
      import s.implicits._
      val target = Seq(("en", 10L), ("es", 30L), ("de", 30L),
        ("fr", 20L), ("zh", 10L)).toDF("lang", "w")
      val d = Tables.load(s, dir, "documents")
      val counts = d.groupBy($"lang").agg(count(lit(1)).as("n"))
        .join(broadcast(target), Seq("lang"))
      val c = counts.agg(min(expr("n div w")).as("c"))
      val thr = counts.crossJoin(broadcast(c))
        .withColumn("thr_hex",
          lpad(lower(hex(least(
            expr("CAST(c AS DECIMAL(38,0)) * w * 4294967296 div n"),
            lit(4294967295L)))), 8, "0"))
        .select($"lang", $"thr_hex")
      d.select($"doc_id", $"lang",
          substring(md5($"doc_id".cast("string")), 1, 8).as("pfx"))
        .join(broadcast(thr), Seq("lang"))
        .filter($"pfx" < $"thr_hex")
        .select($"doc_id", $"lang")
        .orderBy($"doc_id")
    },
    Some("""
      WITH tgt(lang, w) AS (
        VALUES ('en',10),('es',30),('de',30),('fr',20),('zh',10)
      ),
      c AS (SELECT d.lang, COUNT(*) AS n, ANY_VALUE(w) AS w
            FROM documents d JOIN tgt USING (lang) GROUP BY d.lang),
      t AS (SELECT lang,
              lpad(lower(hex(LEAST(
                CAST(CAST((SELECT MIN(n // w) FROM c) AS HUGEINT)
                     * w * 4294967296 // n AS BIGINT),
                4294967295))), 8, '0') AS thr_hex
            FROM c)
      SELECT d.doc_id, d.lang
      FROM documents d JOIN t ON d.lang = t.lang
      WHERE substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < t.thr_hex
      ORDER BY d.doc_id
    """)
  )

  /** COHORT RETENTION matrix: users grouped by the week of their first
    * event (the cohort), then for each later week the count of cohort
    * members still active — the activation/retention readout every
    * product-analytics stack computes, and the engagement-weighting
    * signal a behavioral-data training pipeline uses.
    *
    * Week index is INTEGER division of epoch-µs (`div` / `//`), so
    * bucketing is exact in both engines — no timestamp truncation
    * semantics to match. One shuffle on `user_id` feeds the per-user
    * first-week window (no join: the cohort rides the same exchange),
    * then the (cohort, offset) count-distinct aggregates with map-side
    * partials. Users >> weeks, so the second key-space is tiny and
    * skew-free at any scale. */
  val retention: Q = Q(
    "events_retention",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val wk = Tables.load(s, dir, "events")
        .select($"user_id", expr("unix_micros(ts) div 604800000000").as("wk"))
      val cohort = wk.withColumn("cohort_wk",
        min($"wk").over(Window.partitionBy($"user_id")))
      cohort
        .groupBy($"cohort_wk", ($"wk" - $"cohort_wk").as("week_offset"))
        .agg(count_distinct($"user_id").as("n_users"))
        .orderBy($"cohort_wk", $"week_offset")
    },
    Some("""
      WITH e AS (
        SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events
      ), c AS (
        SELECT user_id, wk, MIN(wk) OVER (PARTITION BY user_id) AS cohort_wk
        FROM e
      )
      SELECT cohort_wk, wk - cohort_wk AS week_offset,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM c
      GROUP BY 1, 2
      ORDER BY 1, 2
    """)
  )

  /** RAG SERVING SHAPE: exact cosine top-5 per query over the
    * embedding store, then the winners fetch their payload from the
    * document store (`vec_id = doc_id` — document embeddings). This is
    * the retrieval half of every RAG pipeline: rank in vector space,
    * hydrate from the row store.
    *
    * Scale shape: the ranked result is O(k·queries) rows regardless of
    * corpus size, so it is BROADCAST into the payload join — the
    * document store is hash-probed locally, never shuffled, and only
    * the projected payload columns are read (column pruning reaches
    * the parquet scan). Swap [[VectorSearch.rankTopK]]'s exact scorer
    * for the LSH/IVF candidate paths and the payload join is
    * unchanged — the composition, not the scorer, is the operator. */
  val ragRetrieve: Q = Q(
    "vector_rag_retrieve",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.graftexpr.VectorFunctions.dot_product
      val k = 5
      val e = VectorSearch.withNorms(
        Tables.load(s, dir, "embeddings")
          .repartition($"vec_id")   // single-file fixture → spread the scoring (UNPINNED on purpose: tiny vector frames — 32 pinned partitions taxed every downstream stage ~1.3-2x, measured round 19)
          .select($"vec_id", $"embedding"))
        .localCheckpoint()          // referenced as both query and corpus side
      val q = e.filter($"vec_id" < 4)
        .select($"vec_id".as("qid"), $"v".as("qv"), $"nrm".as("qnrm"))
      val scored = e.join(broadcast(q), $"vec_id" =!= $"qid")
        .select($"qid", $"vec_id",
          (dot_product($"qv", $"v") / ($"qnrm" * $"nrm")).as("cos"))
      val top = VectorSearch.rankTopK(s, scored, k)
      Tables.load(s, dir, "documents")
        .join(broadcast(top), $"doc_id" === $"vec_id")
        .select($"qid", $"rn", $"doc_id", $"lang", $"source", $"n_chars", $"cos")
        .orderBy($"qid", $"rn")
    },
    Some("""
      WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
      n AS (SELECT vec_id, v,
              sqrt(list_reduce(list_transform(list_zip(v, v), s -> s[1]*s[2]), (a, b) -> a + b)) nrm
            FROM e),
      qs AS (SELECT vec_id qid, v qv, nrm qnrm FROM n WHERE vec_id < 4),
      p AS (SELECT qid, vec_id,
              list_reduce(list_transform(list_zip(qv, v), s -> s[1]*s[2]), (x, y) -> x + y)
                / (qnrm * nrm) AS cos
            FROM qs, n WHERE vec_id <> qid),
      r AS (SELECT qid, vec_id, cos,
              ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) rn
            FROM p)
      SELECT r.qid, CAST(r.rn AS INT) AS rn, d.doc_id, d.lang, d.source, d.n_chars, r.cos
      FROM r JOIN documents d ON d.doc_id = r.vec_id
      WHERE r.rn <= 5
      ORDER BY r.qid, r.rn
    """)
  )

  /** Deterministic CORPUS SHUFFLE: the training-order assignment every
    * pretraining run needs — each document gets a shard (which output
    * file group it lands in) and a position within that shard, from a
    * salted content address (`md5("epoch0:" || doc_id)`). Change the
    * epoch salt and the whole corpus reshuffles; keep it and the order
    * is bit-reproducible across engines, runs, and cluster sizes — no
    * RNG state to coordinate.
    *
    * Scale shape: ONE hash shuffle on `shard` (the window's partition
    * key), then a per-shard sort — shard count is chosen so a shard
    * fits an executor (the [[packSequencesSharded]] discipline), and at
    * 100 TB the same plan writes straight out via
    * `repartition($"shard").sortWithinPartitions($"skey")` with `pos`
    * implicit in file order; the windowed rank here materializes it so
    * the assignment is exactly oracle-able. */
  val corpusShuffle: Q = Q(
    "corpus_shuffle",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val sh = Tables.load(s, dir, "documents")
        .select($"doc_id",
          md5(concat(lit("epoch0:"), $"doc_id".cast("string"))).as("skey"))
        .withColumn("shard",
          ((expr("instr('0123456789abcdef', substring(skey, 1, 1))") - 1) % 8)
            .cast("int"))
      val w = Window.partitionBy($"shard").orderBy($"skey", $"doc_id")
      sh.withColumn("pos", row_number().over(w))
        .select($"doc_id", $"shard", $"pos")
        .orderBy($"shard", $"pos")
    },
    Some("""
      WITH s AS (
        SELECT doc_id, md5('epoch0:' || CAST(doc_id AS VARCHAR)) skey
        FROM documents
      ), h AS (
        SELECT doc_id, skey,
               CAST((strpos('0123456789abcdef', substring(skey, 1, 1)) - 1) % 8 AS INT) shard
        FROM s
      )
      SELECT doc_id, shard,
             CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY skey, doc_id) AS INT) pos
      FROM h
      ORDER BY shard, pos
    """)
  )

  /** Snapshot diff — the dataset-versioning primitive behind a daily
    * crawl refresh: which documents were ADDED, REMOVED, or CHANGED
    * between corpus versions (unchanged docs are not a diff's business
    * and are not emitted). The two versions are derived content-
    * addressed from the shared fixture (first md5 hex of doc_id: 'f'
    * absent from v1 → added; '0' absent from v2 → removed; '1'/'2'
    * revised in v2 → changed), so both engines construct identical
    * snapshots and the diff is fully oracled.
    *
    * Scale shape: each side reduces to (doc_id, md5(text)) AT THE SCAN
    * — the 16-byte content hash crosses the wire, the text never does,
    * so diffing two 100 TB snapshots shuffles ~2 × 24 B/doc. One
    * doc_id-keyed full-outer join; with both snapshots stored bucketed
    * by doc_id (the natural layout for versioned corpora, and what
    * [[graft.GraftSession]] bucketed tables provide) even that
    * exchange disappears. Status is a null-pattern projection on the
    * join output. */
  val snapshotDiff: Q = Q(
    "corpus_snapshot_diff",
    (s, dir) => {
      import s.implicits._
      val d = Tables.load(s, dir, "documents")
      val h = substring(md5($"doc_id".cast("string")), 1, 1)
      // NULL text hashes to the sentinel (md5 output is 32 hex chars, so
      // no collision): a NULL-text doc present in both versions must
      // compare EQUAL, not pattern-match the absent-side null branches
      val v1 = d.filter(h =!= "f")
        .select($"doc_id", coalesce(md5($"text"), lit("NULL")).as("h1"))
      val v2 = d.filter(h =!= "0").select($"doc_id",
        coalesce(md5(when(h.isin("1", "2"), concat($"text", lit(" rev2")))
          .otherwise($"text")), lit("NULL")).as("h2"))
      v1.join(v2, Seq("doc_id"), "full_outer")
        .select($"doc_id",
          when($"h1".isNull, "added")
            .when($"h2".isNull, "removed")
            .when($"h1" =!= $"h2", "changed")
            .otherwise("unchanged").as("status"))
        .filter($"status" =!= "unchanged")
        .orderBy($"doc_id")
    },
    Some("""
      WITH v1 AS (
        SELECT doc_id, COALESCE(md5(text), 'NULL') AS h1 FROM documents
        WHERE SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> 'f'
      ),
      v2 AS (
        SELECT doc_id,
               COALESCE(md5(CASE WHEN SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('1', '2')
                             THEN text || ' rev2' ELSE text END), 'NULL') AS h2
        FROM documents
        WHERE SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> '0'
      )
      SELECT doc_id,
             CASE WHEN h1 IS NULL THEN 'added'
                  WHEN h2 IS NULL THEN 'removed'
                  WHEN h1 <> h2 THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM v1 FULL OUTER JOIN v2 USING (doc_id)
      WHERE CASE WHEN h1 IS NULL THEN 'added'
                 WHEN h2 IS NULL THEN 'removed'
                 WHEN h1 <> h2 THEN 'changed'
                 ELSE 'unchanged' END <> 'unchanged'
      ORDER BY doc_id
    """)
  )

  /** Event log → BEHAVIOR-SEQUENCE corpus: per user, the time-ordered
    * event-type token string — how clickstream/action logs become a
    * trainable sequence corpus (behavioral LM pretraining, next-action
    * prediction). Ordering inside each user is total and deterministic:
    * (epoch µs, event_id) — Spark gets it from `sort_array` over
    * structs whose FIELD ORDER is the sort key (lexicographic struct
    * comparison ≡ ORDER BY t, event_id; event_id is unique so the
    * trailing type field never decides), DuckDB from an ordered
    * `string_agg`, so the strings hash-match byte-exact.
    *
    * Scale shape: one user_id exchange (partial collect upstream), the
    * per-user sort is O(k log k) in group size only. Skewed power
    * users at corpus scale take the same two-phase cap discipline as
    * [[sourceCapTwoPhase]] (bound k before the agg); the fixture's
    * groups are small enough that the single-phase form IS the 100 TB
    * plan per partition. */
  val eventsSequences: Q = Q(
    "events_sequences",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .select($"user_id",
          struct(unix_micros($"ts").as("t"), $"event_id", $"event_type").as("e"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"),
          array_join(
            transform(sort_array(collect_list($"e")), x => x.getField("event_type")),
            " ").as("seq"))
        .orderBy($"user_id")
    },
    Some("""
      SELECT user_id, COUNT(*) AS n_events,
             string_agg(event_type, ' ' ORDER BY epoch_us(ts), event_id) AS seq
      FROM events
      GROUP BY user_id
      ORDER BY user_id
    """)
  )

  /** Behavior-LM TRANSITION STATS: the event-type Markov matrix over
    * every user's time-ordered stream — (prev → next) counts and row-
    * normalized probabilities, the summary statistics a next-action
    * model (and [[eventsSequences]]'s corpus) is trained against, and
    * the drift monitor a deployed one is checked against.
    *
    * Scale shape: one user_id exchange for the LAG window (same
    * exchange [[retention]] and q28 ride), then a partial-aggregated
    * count on the narrow (prev, next) pair stream — the pair key space
    * is |event types|², vanishingly small, so the final agg and the
    * row-normalizing window are effectively free. p is an exact-long
    * division performed identically on both engines. */
  val eventsMarkov: Q = Q(
    "events_markov",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"), $"event_id")
      val wPrev = Window.partitionBy($"prev_type")
      Tables.load(s, dir, "events")
        .withColumn("prev_type", lag($"event_type", 1).over(w))
        .filter($"prev_type".isNotNull)
        .groupBy($"prev_type", $"event_type")
        .agg(count(lit(1)).as("n"))
        .withColumn("p", $"n".cast("double") / sum($"n").over(wPrev).cast("double"))
        .orderBy($"prev_type", $"event_type")
    },
    Some("""
      WITH seq AS (
        SELECT event_type,
               LAG(event_type, 1) OVER (PARTITION BY user_id
                                        ORDER BY epoch_us(ts), event_id) AS prev_type
        FROM events
      ),
      pairs AS (
        SELECT prev_type, event_type, COUNT(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
      )
      SELECT prev_type, event_type, n,
             CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
      FROM pairs
      ORDER BY prev_type, event_type
    """)
  )

  /** TOKEN-BUDGET corpus selection: per language, take documents in
    * quality order until the language's token budget is exhausted —
    * "build the best corpus that fits N tokens per language", the
    * final sizing step of a curation run. Quality rank is float-free
    * (scaled integer division of the distinct-token count by the token
    * count — lexical diversity), so ordering is bit-identical across
    * engines; the budget check is an INCLUSIVE running sum ≤ budget,
    * the standard greedy prefix rule.
    *
    * Scale shape: the running sum is a window PARTITIONED BY lang —
    * the skew dial. For a mono-lingual 100 TB corpus the same code
    * takes the [[packSequencesSharded]] two-phase treatment (shard by
    * content hash, per-shard prefix sums + broadcast shard offsets);
    * the fixture's per-lang groups make the single-exchange form the
    * right plan here. */
  /** the single-window (reference) form of the greedy budget selection
    * over a prepared (doc_id, lang, n_tokens, rank_key) frame — split
    * out so BudgetPropertySpec can drive BOTH selection plans over
    * arbitrary generated corpora, not just the fixture. */
  private[graft] def budgetSelectGlobal(base: DataFrame, budget: Long): DataFrame = {
    val s = base.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"lang")
      .orderBy($"rank_key".desc, $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("cum_tokens", sum($"n_tokens").over(w))
      .filter($"cum_tokens" <= budget)
      .select($"doc_id", $"lang", $"n_tokens", $"rank_key", $"cum_tokens")
      .orderBy($"doc_id")
  }

  /** phase 3 of the histogram-cut form over a prepared frame (phases
    * 1–2 are [[budgetHistCuts]]). */
  private[graft] def budgetSelect2Phase(base: DataFrame, budget: Long): DataFrame = {
    val s = base.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val (hist, cuts) = budgetHistCuts(base, budget)
    val wCut = Window.partitionBy($"lang", $"rank_key")
      .orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = base.join(broadcast(cuts), Seq("lang"))
    val above = joined.filter($"rank_key" > $"cut_key")
      .withColumn("cum_in_group", sum($"n_tokens").over(wCut))
    val boundary = joined.filter($"rank_key" === $"cut_key")
      .withColumn("cum_in_group", sum($"n_tokens").over(wCut))
      .filter($"cum_in_group" <= $"residual")
    val histKeyed = hist.select($"lang", $"rank_key", $"before")
    above.unionByName(boundary)
      .join(broadcast(histKeyed), Seq("lang", "rank_key"))
      .select($"doc_id", $"lang", $"n_tokens", $"rank_key",
        ($"before" + $"cum_in_group").as("cum_tokens"))
      .orderBy($"doc_id")
  }

  val tokenBudget: Q = Q(
    "corpus_token_budget",
    (s, dir) => budgetSelectGlobal(budgetBase(s, dir), 2000L),
    Some("""
      WITH base AS (
        SELECT doc_id, lang,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS n_distinct
        FROM documents
      ),
      ranked AS (
        SELECT doc_id, lang, n_tokens,
               (n_distinct * 1000000) // n_tokens AS rank_key
        FROM base WHERE n_tokens > 0
      ),
      cum AS (
        SELECT doc_id, lang, n_tokens, rank_key,
               SUM(n_tokens) OVER (PARTITION BY lang
                                   ORDER BY rank_key DESC, doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
        FROM ranked
      )
      SELECT doc_id, lang, n_tokens, rank_key,
             CAST(cum_tokens AS BIGINT) AS cum_tokens
      FROM cum WHERE cum_tokens <= 2000
      ORDER BY doc_id
    """)
  )

  /** The PRODUCTION form of [[tokenBudget]] — the answer to "does the
    * per-lang global window survive a mono-lingual 100 TB corpus":
    * selection WITHOUT any corpus-ordered window. Key observation: the
    * quality rank is a SCALED INTEGER with a bounded key space
    * (≤ 10⁶ distinct values however large the corpus), so the global
    * prefix cut can be found on a per-(lang, rank_key) HISTOGRAM:
    *
    *  1. aggregate corpus → (lang, rank_key, group_tokens) — one
    *     partial-aggregated exchange over a ≤10⁶-row-per-lang frame;
    *  2. window the tiny histogram (rank_key desc) → exclusive prefix
    *     totals → per lang the CUT key where the budget crosses, and
    *     the residual budget inside that cut group;
    *  3. broadcast the one-row-per-lang cut table back: rank_key
    *     above the cut keeps wholesale (a per-row filter, no order
    *     needed); ONLY the cut group — one rank_key's worth of docs —
    *     pays a doc_id-ordered window for the residual prefix.
    *
    * The corpus is never globally sorted; the only corpus-wide window
    * is confined to the single boundary group. Output is hash-gated
    * EQUAL to [[tokenBudget]] (same oracle): the global rule orders by
    * (rank_key desc, doc_id), so groups above the cut are prefix-whole,
    * groups below never fit, and the boundary group's residual prefix
    * in doc_id order is exactly the global selection's tail. */
  /** The quality-ranked corpus spine both budget forms select from:
    * (doc_id, lang, n_tokens, rank_key) with the float-free scaled-
    * integer lexical-diversity rank. Stateless projection — also the
    * per-arrival projection of the STREAMING admission form
    * ([[graft.streaming.TokenBudgetStream]]). */
  private[graft] def budgetBase(s: SparkSession, dir: String): DataFrame =
    budgetBaseFrom(Tables.load(s, dir, "documents"))

  /** the same spine over any (doc_id, lang, text) frame — the composed
    * ingest→serve chain ([[graft.streaming.PipelineE2E]]) builds its
    * admission histogram from the CURATED corpus, not the full table. */
  private[graft] def budgetBaseFrom(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val toks = TextFns.tokens($"text")
    docs
      .select($"doc_id", $"lang",
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"))
      .filter($"n_tokens" > 0)
      .withColumn("rank_key", expr("(n_distinct * 1000000L) div n_tokens"))
      .drop("n_distinct")
  }

  /** Phase 1+2 of the histogram-cut selection, shared by the batch
    * 2-phase form and the streaming admission's broadcast static side:
    * the bounded per-(lang, rank_key) token histogram with exclusive
    * prefix totals (`before`), and the one-row-per-lang cut table —
    * the highest rank_key whose exclusive prefix still leaves budget,
    * with the residual budget available inside that boundary group. */
  private[graft] def budgetHistCuts(base: DataFrame, budget: Long): (DataFrame, DataFrame) = {
    val s = base.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val wHist = Window.partitionBy($"lang").orderBy($"rank_key".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val hist = base.groupBy($"lang", $"rank_key")
      .agg(sum($"n_tokens").as("group_tokens"))
      .withColumn("before", coalesce(sum($"group_tokens").over(wHist), lit(0L)))
    // cut row per lang: the highest rank_key whose exclusive prefix
    // still leaves budget (groups fully above it fit wholesale iff
    // before+group ≤ budget; the cut group gets the residual)
    val cuts = hist.filter($"before" < budget)
      .groupBy($"lang").agg(min($"rank_key").as("cut_key"))
      .join(hist.select($"lang", $"rank_key".as("cut_key"), $"before"),
        Seq("lang", "cut_key"))
      .withColumn("residual", lit(budget) - $"before")
      .select($"lang", $"cut_key", $"residual")
    (hist, cuts)
  }

  val tokenBudget2Phase: Q = Q(
    "corpus_token_budget_2phase",
    (s, dir) =>
      // base localCheckpoint: scanned by the histogram AND the final filter
      budgetSelect2Phase(budgetBase(s, dir).localCheckpoint(), 2000L),
    // SAME oracle as the single-window form — the two plans must agree
    // bit-for-bit on the selected set AND the cumulative positions
    tokenBudget.oracle
  )

  /** UPDATE-AWARE cap/budget semantics — the dedup-at-curation
    * variant: over a VERSIONED corpus (documents arrive, then some are
    * UPDATED — here a deterministic synthetic update wave: every
    * doc_id ≡ 0 (mod 7) gets a ver-2 revision with its text doubled),
    * an updated document consumes the per-source cap and the token
    * budget exactly ONCE, at its NEWEST version — never once per
    * surviving version. The composition is LWW → cap → budget:
    *
    *  1. LWW collapse: one `max_by(ver)` per doc_id — the newest
    *     (lang, source, text) wins; one keyed exchange, the same
    *     newest-wins rule the chain's serve path applies by `ver`.
    *  2. per-source cap: the [[sourceCap]] rule (content-addressed
    *     md5 rank, ≤ 10 per source) over the COLLAPSED corpus — a
    *     doc's update cannot eat a second cap slot, and its rank is
    *     content-addressed by doc_id so an update never reshuffles
    *     the survivor set.
    *  3. token budget: [[budgetSelectGlobal]]'s greedy per-lang prefix
    *     over the capped LWW corpus — the updated text's n_tokens is
    *     what the budget pays, once.
    *
    * Contrast, stated where it binds: the CHAIN's live admission is
    * the SEGMENT model (append-only manifest, every admitted version
    * serves until compaction — `admitSchemaE` scaladoc), where an
    * updated doc legitimately holds one manifest row per admitted
    * version; THIS operator is the compaction-time accounting those
    * segments seal into, and the streaming twin
    * ([[graft.streaming.TokenBudgetStream.admitLww]]) enforces the
    * same once-per-doc charge live via a refund-or-restore ledger.
    *
    * Scale shape: the LWW collapse is one exchange keyed on doc_id
    * (versions of a doc are a handful — no skew term); cap and budget
    * are the audited shapes of their parent operators. */
  val budgetUpdateLww: Q = Q(
    "corpus_budget_update_lww",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.load(s, dir, "documents")
        .select($"doc_id", $"lang", $"source", $"text")
      val versioned = docs.withColumn("ver", lit(1L))
        .unionByName(docs.filter($"doc_id" % 7 === 0)
          .select($"doc_id", $"lang", $"source",
            concat($"text", lit(" "), $"text").as("text"), lit(2L).as("ver")))
      val lww = versioned.groupBy($"doc_id")
        .agg(max_by(struct($"lang", $"source", $"text"), $"ver").as("b"))
        .select($"doc_id", $"b.lang".as("lang"), $"b.source".as("source"),
          $"b.text".as("text"))
      val wCap = Window.partitionBy($"source")
        .orderBy(md5($"doc_id".cast("string")), $"doc_id")
      val capped = lww
        .withColumn("rk", row_number().over(wCap))
        .filter($"rk" <= 10)
        .select($"doc_id", $"lang", $"text")
      budgetSelectGlobal(budgetBaseFrom(capped), 2000L)
    },
    Some("""
      WITH versioned AS (
        SELECT doc_id, lang, source, text, 1 AS ver FROM documents
        UNION ALL
        SELECT doc_id, lang, source, text || ' ' || text AS text, 2 AS ver
        FROM documents WHERE doc_id % 7 = 0
      ),
      lww AS (
        SELECT doc_id,
               arg_max(lang, ver) AS lang,
               arg_max(source, ver) AS source,
               arg_max(text, ver) AS text
        FROM versioned GROUP BY doc_id
      ),
      capped AS (
        SELECT doc_id, lang, text FROM (
          SELECT doc_id, lang, text,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
          FROM lww)
        WHERE rk <= 10
      ),
      base AS (
        SELECT doc_id, lang,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS n_distinct
        FROM capped
      ),
      ranked AS (
        SELECT doc_id, lang, n_tokens,
               (n_distinct * 1000000) // n_tokens AS rank_key
        FROM base WHERE n_tokens > 0
      ),
      cum AS (
        SELECT doc_id, lang, n_tokens, rank_key,
               SUM(n_tokens) OVER (PARTITION BY lang
                                   ORDER BY rank_key DESC, doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
        FROM ranked
      )
      SELECT doc_id, lang, n_tokens, rank_key,
             CAST(cum_tokens AS BIGINT) AS cum_tokens
      FROM cum WHERE cum_tokens <= 2000
      ORDER BY doc_id
    """)
  )

  /** ANNEALED MIXTURE SCHEDULE: a per-EPOCH training-mix manifest that
    * interpolates linearly from a balanced mix (epoch 0: every source
    * downsampled to the smallest source's size, rate nmin/n_s — equal
    * exposure while the model is fresh) to the natural distribution
    * (final epoch: rate 1) — the data-schedule counterpart of
    * [[mixTemperature]]'s static α-rule. Epoch e of E keeps source s
    * at rate (nmin·(E−1−e) + n_s·e) / (n_s·(E−1)), selection
    * content-addressed per epoch (md5("e:doc_id") prefix), the rate
    * rendered as an EXACT integer 2³² threshold in decimal(38,0)/
    * HUGEINT (the [[mixToTarget]] overflow rule) so both engines agree
    * bit-for-bit at any corpus size.
    *
    * Scale shape: per-source count agg (tiny) × E epochs → broadcast
    * threshold table; the corpus scan joins it on source and filters
    * per-row — no corpus shuffle, the E-fold row expansion exists only
    * in the filtered output stream. */
  /** the annealed selection over a prepared (doc_id, source) frame —
    * split out so MixEpochsPropertySpec drives it over arbitrary
    * corpora and epoch counts. */
  private[graft] def mixEpochsSelect(d: DataFrame, epochs: Int): DataFrame = {
    val s = d.sparkSession
    import s.implicits._
    val counts = d.groupBy($"source").agg(count(lit(1)).as("n"))
    val nmin = counts.agg(min($"n").as("nmin"))
    val thr = counts.crossJoin(broadcast(nmin))
      .select($"source", $"n", $"nmin",
        explode(sequence(lit(0), lit(epochs - 1))).as("epoch"))
      .withColumn("thr_hex",
        lpad(lower(hex(least(
          expr(s"(CAST(nmin AS DECIMAL(38,0)) * (${epochs - 1} - epoch)" +
            s" + CAST(n AS DECIMAL(38,0)) * epoch) * 4294967296" +
            s" div (n * ${epochs - 1})"),
          lit(4294967295L)))), 8, "0"))
      .select($"epoch", $"source", $"thr_hex")
    d.select($"doc_id", $"source")
      .join(broadcast(thr), Seq("source"))
      .withColumn("pfx",
        substring(md5(concat($"epoch".cast("string"), lit(":"), $"doc_id".cast("string"))), 1, 8))
      .filter($"pfx" < $"thr_hex")
      .select($"epoch".cast("long").as("epoch"), $"doc_id", $"source")
      .orderBy($"epoch", $"doc_id")
  }

  val mixEpochs: Q = Q(
    "mix_epochs",
    (s, dir) => mixEpochsSelect(
      Tables.load(s, dir, "documents").select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("source")), 3),
    Some("""
      WITH c AS (
        SELECT source, COUNT(*) AS n FROM documents GROUP BY source
      ),
      nm AS (SELECT MIN(n) AS nmin FROM c),
      t AS (
        SELECT e.e AS epoch, c.source,
               lpad(lower(hex(LEAST(
                 CAST((CAST(nmin AS HUGEINT) * (2 - e.e)
                       + CAST(n AS HUGEINT) * e.e) * 4294967296
                      // (CAST(n AS HUGEINT) * 2) AS BIGINT),
                 4294967295))), 8, '0') AS thr_hex
        FROM c, nm, (SELECT unnest(range(3)) AS e) e
      )
      SELECT CAST(t.epoch AS BIGINT) AS epoch, d.doc_id, d.source
      FROM documents d JOIN t ON d.source = t.source
      WHERE substring(md5(CAST(t.epoch AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)), 1, 8)
            < t.thr_hex
      ORDER BY epoch, d.doc_id
    """)
  )

  /** The dedup-centric curation FLAGSHIP: near-dup survivors → per-lang
    * token-budget selection → source-interleaved training order, as ONE
    * plan — the "from raw crawl to the order the trainer reads" spine
    * that [[curationE2e]]'s gate/cap/split composition doesn't cover.
    * Stage 1 reads the materialized corpus-version label table (the
    * labeling is paid once per version, never here); stage 2 is the
    * [[tokenBudget]] greedy rule over SURVIVORS; stage 3 is
    * [[corpusInterleave]]'s round-robin key over the SELECTED set.
    * Every stage is integer/content-addressed, so the three-stage
    * composition is oracled end to end.
    *
    * Scale shape: the label side is a bucketed scan (LabelStoreSpec's
    * discipline), the budget window takes the per-lang (or, for
    * mono-lingual corpora, [[tokenBudget2Phase]]'s histogram) form, and
    * the interleave adds one source-keyed rank exchange — the same
    * three exchanges the stages pay standalone; composing them adds
    * NO new shuffle. */
  val curateOrder: Q = Q(
    "corpus_curate_order",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val budget = 2000L
      val labT = s.table(Dedup.labelTable(s, dir))
      val dupes = labT.filter($"doc_id" =!= $"canonical_id").select($"doc_id")
      val toks = TextFns.tokens($"text")
      val base = Tables.load(s, dir, "documents")
        .select($"doc_id", $"lang", $"source",
          size(toks).cast("long").as("n_tokens"),
          size(array_distinct(toks)).cast("long").as("n_distinct"))
        .join(dupes, Seq("doc_id"), "left_anti")
        .filter($"n_tokens" > 0)
        .withColumn("rank_key", expr("(n_distinct * 1000000L) div n_tokens"))
      val wB = Window.partitionBy($"lang")
        .orderBy($"rank_key".desc, $"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val selected = base
        .withColumn("cum_tokens", sum($"n_tokens").over(wB))
        .filter($"cum_tokens" <= budget)
        .select($"doc_id", $"lang", $"source", $"n_tokens",
          md5(concat(lit("order:"), $"doc_id".cast("string"))).as("skey"))
        .localCheckpoint()   // scanned by the source index AND the rank
      val srcIdx = selected.select($"source").distinct()
        .withColumn("s_idx",
          row_number().over(Window.orderBy($"source")).cast("long") - 1L)
      val nSrc = srcIdx.count()
      val wI = Window.partitionBy($"source").orderBy($"skey", $"doc_id")
      selected.withColumn("r", row_number().over(wI).cast("long") - 1L)
        .join(broadcast(srcIdx), "source")
        .select($"doc_id", $"lang", $"source", $"n_tokens",
          ($"r" * nSrc + $"s_idx").as("pos"))
        .orderBy($"pos")
    },
    Some(s"""
      WITH RECURSIVE sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(len(toks)-2),
                             i -> array_to_string(toks[i+1:i+3], ' '))) AS shset
        FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
              FROM documents)
        WHERE len(toks) >= 3
      ),
      ex AS (SELECT doc_id, unnest(shset) s, len(shset) n FROM sh),
      prs AS (
        SELECT a.doc_id d1, b.doc_id d2, COUNT(*) inter,
               ANY_VALUE(a.n) n1, ANY_VALUE(b.n) n2
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ),
      p AS (SELECT d1, d2 FROM prs WHERE 3 * inter >= n1 + n2),
      verts AS (SELECT DISTINCT d1 AS v FROM p UNION SELECT DISTINCT d2 FROM p),
      edges AS (SELECT d1 a, d2 b FROM p UNION ALL SELECT d2, d1 FROM p),
      walk(v, lab) AS (
        SELECT v, v FROM verts
        UNION
        SELECT e.b, walk.lab FROM walk JOIN edges e ON walk.v = e.a
      ),
      cc AS (SELECT v, MIN(lab) AS lab FROM walk GROUP BY v),
      dup AS (SELECT v AS doc_id FROM cc WHERE v <> lab),
      base AS (
        SELECT d.doc_id, d.lang, d.source,
               CAST(len(list_filter(string_split(d.text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(list_filter(string_split(d.text, ' '), x -> x <> ''))) AS BIGINT) AS n_distinct
        FROM documents d LEFT JOIN dup ON d.doc_id = dup.doc_id
        WHERE dup.doc_id IS NULL
      ),
      ranked AS (
        SELECT doc_id, lang, source, n_tokens,
               (n_distinct * 1000000) // n_tokens AS rank_key
        FROM base WHERE n_tokens > 0
      ),
      sel AS (
        SELECT doc_id, lang, source, n_tokens,
               md5('order:' || CAST(doc_id AS VARCHAR)) AS skey
        FROM (
          SELECT doc_id, lang, source, n_tokens,
                 SUM(n_tokens) OVER (PARTITION BY lang
                                     ORDER BY rank_key DESC, doc_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM ranked
        ) WHERE cum <= 2000
      ),
      si AS (
        SELECT source,
               CAST(ROW_NUMBER() OVER (ORDER BY source) AS BIGINT) - 1 AS s_idx
        FROM (SELECT DISTINCT source FROM sel)
      ),
      nsrc AS (SELECT COUNT(*) AS n_src FROM si),
      r AS (
        SELECT doc_id, lang, source, n_tokens,
               CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY skey, doc_id) AS BIGINT) - 1 AS r
        FROM sel
      )
      SELECT r.doc_id, r.lang, r.source, r.n_tokens,
             r.r * nsrc.n_src + si.s_idx AS pos
      FROM r JOIN si USING (source) CROSS JOIN nsrc
      ORDER BY pos
    """)
  )

  /** Z-ORDER LAYOUT KEY: the write-time data-clustering kernel behind
    * "OPTIMIZE ... ZORDER BY (lang, size)". Interleaving the bits of
    * two bounded dimensions — the ranked language index and a 16-way
    * n_chars bucket — yields a Morton key whose sort order keeps rows
    * close in BOTH dimensions at once, so a file written in zkey order
    * carries tight min/max ranges for either column and a scan
    * filtering on `lang = 'de'` OR on a size band prunes most files
    * from the listing alone. Emits per doc the two dimension codes,
    * the interleaved zkey, and the 16-way file assignment
    * (`zkey >> 4`) a compaction job would write.
    *
    * Scale shape: the only exchanges are a ≤|langs|-row distinct
    * aggregate (broadcast back onto the corpus) and the presentation
    * sort; the interleave itself is a stateless integer projection,
    * codegen'd from the same closed-form bit arithmetic the oracle
    * runs. At 100 TB the catalog's ORDER BY becomes
    * `repartitionByRange(zkey).sortWithinPartitions(zkey)` feeding the
    * writer — the key, not the sort, is the operator. */
  val corpusZorder: Q = {
    def zexpr(shl: (String, Int) => String): String =
      (0 until 4).map { i =>
        s"${shl(s"x >> $i", 2 * i + 1)} + ${shl(s"y >> $i", 2 * i)}"
      }.mkString(" + ")
    val sparkZ = zexpr((e, n) => s"shiftleft(($e) & 1, $n)")
    val duckZ  = zexpr((e, n) => s"((($e) & 1) << $n)")
    Q(
      "corpus_zorder",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val d = Tables.load(s, dir, "documents")
          .select($"doc_id", $"lang", $"n_chars",
            least(expr("n_chars div 64"), lit(15L)).as("y"))
        val langIdx = d.select($"lang").distinct()
          .withColumn("x",
            least(row_number().over(Window.orderBy($"lang")).cast("long") - 1L, lit(15L)))
        d.join(broadcast(langIdx), "lang")
          .withColumn("zkey", expr(sparkZ))
          .select($"doc_id", $"lang", $"n_chars", $"x", $"y", $"zkey",
            expr("zkey div 16").as("file_id"))
          .orderBy($"zkey", $"doc_id")
      },
      Some(s"""
        WITH li AS (
          SELECT lang,
                 LEAST(CAST(ROW_NUMBER() OVER (ORDER BY lang) AS BIGINT) - 1, 15) AS x
          FROM (SELECT DISTINCT lang FROM documents)
        ),
        d AS (
          SELECT doc_id, lang, n_chars, LEAST(n_chars // 64, 15) AS y
          FROM documents
        ),
        z AS (
          SELECT d.doc_id, d.lang, d.n_chars, li.x, d.y,
                 CAST($duckZ AS BIGINT) AS zkey
          FROM d JOIN li USING (lang)
        )
        SELECT doc_id, lang, n_chars, x, CAST(y AS BIGINT) AS y, zkey,
               zkey // 16 AS file_id
        FROM z
        ORDER BY zkey, doc_id
      """)
    )
  }

  /** RFM SEGMENTATION over the event log: per-user Recency (days since
    * last event, against the corpus clock), Frequency (event count)
    * and Monetary (exact cent sum), each cut into terciles, plus the
    * 27-cell "rfm" segment string — the classic behavioral cohort
    * model (and the labeling a behavior-LM pipeline conditions on).
    * All three metrics are exact integers; the tercile cut is NTILE(3)
    * over a DETERMINISTIC total order (metric, user_id), which both
    * engines implement per the SQL spec, so the oracle is exact with
    * no float anywhere.
    *
    * Scale shape: one user_id-keyed aggregation (map-side combined)
    * reduces the log to a row per user; the NTILE windows then rank
    * the per-user frame, not the event log — for a corpus whose USER
    * count also breaks the single-partition window, the cut values
    * take the [[tokenPercentilesBinned]] two-phase histogram treatment
    * (recency and frequency are small-integer keys by nature) — that
    * production form SHIPS as the hash-gated [[eventsRfm2Phase]]. */
  /** The shared per-user RFM metric frame: exact integer recency /
    * frequency / monetary plus the $100 monetary bucket the two-phase
    * cut keys on. One user_id-keyed aggregation (map-side combined). */
  private[operators] def rfmPerUser(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.load(s, dir, "events")
      .select($"user_id", $"ts", round($"value" * 100).cast("long").as("c"))
    val ref = ev.agg(max($"ts").as("ref"))
    ev.groupBy($"user_id").agg(
      max($"ts").as("last_ts"), count(lit(1)).as("frequency"),
      sum($"c").as("monetary_cents"))
      .crossJoin(broadcast(ref))
      .select($"user_id",
        expr("(unix_micros(ref) - unix_micros(last_ts)) div 86400000000L")
          .as("recency_days"),
        $"frequency", $"monetary_cents",
        expr("monetary_cents div 10000").as("m_bucket"))
  }

  /** NTILE(3) tercile assignment over a per-user frame
    * (user_id, recency_days, frequency, monetary_cents[, m_bucket]) —
    * [[eventsRfm]]'s cut, factored so RfmPropertySpec can drive it
    * with generated frames against [[rfmHistogramBins]]. */
  private[operators] def rfmNtileBins(perUser: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col => c}
    perUser
      .withColumn("r_bin", ntile(3).over(Window.orderBy(c("recency_days"), c("user_id"))))
      .withColumn("f_bin", ntile(3).over(Window.orderBy(c("frequency").desc, c("user_id"))))
      .withColumn("m_bin", ntile(3).over(Window.orderBy(c("monetary_cents").desc, c("user_id"))))
      .select(c("user_id"), c("recency_days"), c("frequency"), c("monetary_cents"),
        c("r_bin"), c("f_bin"), c("m_bin"),
        concat(c("r_bin"), c("f_bin"), c("m_bin")).as("segment"))
      .orderBy(c("user_id"))
  }

  val eventsRfm: Q = Q(
    "events_rfm",
    (s, dir) => rfmNtileBins(rfmPerUser(s, dir)
      .drop("m_bucket")),

    Some("""
      WITH ev AS (
        SELECT user_id, ts, CAST(ROUND(value * 100) AS BIGINT) c
        FROM events
      ),
      ref AS (SELECT MAX(ts) AS ref FROM ev),
      u AS (
        SELECT user_id,
               (epoch_us(ref) - epoch_us(MAX(ts))) // 86400000000 AS recency_days,
               COUNT(*) AS frequency, SUM(c) AS monetary_cents
        FROM ev, ref
        GROUP BY user_id, ref
      )
      SELECT user_id, CAST(recency_days AS BIGINT) AS recency_days,
             CAST(frequency AS BIGINT) AS frequency,
             CAST(monetary_cents AS BIGINT) AS monetary_cents,
             CAST(NTILE(3) OVER (ORDER BY recency_days, user_id) AS INT) AS r_bin,
             CAST(NTILE(3) OVER (ORDER BY frequency DESC, user_id) AS INT) AS f_bin,
             CAST(NTILE(3) OVER (ORDER BY monetary_cents DESC, user_id) AS INT) AS m_bin,
             CAST(NTILE(3) OVER (ORDER BY recency_days, user_id) AS VARCHAR)
               || CAST(NTILE(3) OVER (ORDER BY frequency DESC, user_id) AS VARCHAR)
               || CAST(NTILE(3) OVER (ORDER BY monetary_cents DESC, user_id) AS VARCHAR)
               AS segment
      FROM u
      ORDER BY user_id
    """)
  )

  /** Two-phase RFM segmentation — the PRODUCTION form of [[eventsRfm]],
    * whose NTILE(3) cut is three single-partition global windows over
    * the per-user frame (the classic scale-killer once the USER count
    * itself outgrows one partition). Here each tercile boundary comes
    * from a HISTOGRAM cut, the [[tokenPercentilesBinned]] treatment:
    * recency and frequency are small-integer keys by nature; monetary
    * is first bucketed to $100 cells (`cents div 10000` — bounded by
    * value-range/width, not by users). The cut is then the CLOSED FORM
    * of NTILE over the cumulative histogram — each key bins at the
    * NTILE rank of its first tied member, `(3·(cum − cnt)) div n + 1`
    * (NTILE(k) ≡ ⌊k(r−1)/n⌋+1), all-integer so the oracle is
    * hash-exact — and the per-user assignment is three BROADCAST joins
    * of histogram-sized bin tables back onto the per-user frame.
    *
    * Semantics vs the NTILE twin: on TIE-FREE metrics the two forms
    * agree bin-for-bin (RfmPropertySpec proves it over random logs);
    * ties (equal metric value / equal bucket) land in ONE bin together
    * instead of being split by user_id rank — the cut every scalable
    * RFM implementation uses, at the price of up-to-one-bucket
    * boundary resolution on monetary. Scale shape: ONE user_id
    * exchange (the
    * per-user agg, map-side combined) + three O(distinct-values)
    * histograms (each a mergeable partial agg, windowed over the tiny
    * histogram frame only) + broadcast joins — nothing corpus- or
    * user-sized ever passes through a single partition. */
  /** Histogram-cut tercile assignment over a per-user frame — the
    * [[eventsRfm2Phase]] cut, factored beside [[rfmNtileBins]] for the
    * cross-form property. Bin formula: each key takes the NTILE rank
    * of its FIRST tied member, `(3·(cum − cnt)) div n + 1` (the exact
    * closed form of NTILE(k): bin(r) = ⌊k(r−1)/n⌋+1) — so on TIE-FREE
    * frames (cnt ≡ 1, cum ≡ rank) the histogram cut IS NTILE(3),
    * bin-for-bin, which RfmPropertySpec proves executable over random
    * logs; with ties the whole run lands in that one bin together
    * (rank-splitting ties is exactly what a histogram cannot do). */
  private[operators] def rfmHistogramBins(perUser0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col => c}
    // localCheckpoint, not persist: repeated callers (RfmPropertySpec
    // drives this ~10x per run) would otherwise accumulate pinned
    // cache entries; checkpoint blocks are reclaimed with the RDD.
    val perUser = perUser0.localCheckpoint()
    // histogram cut: key -> bin, computed over the DISTINCT-KEY frame
    def cut(key: String, asc: Boolean, out: String) = {
      val h = perUser.groupBy(c(key).as("k")).agg(count(lit(1)).as("cnt"))
      val ord = if (asc) c("k").asc else c("k").desc
      val cum = h.withColumn("cum", sum(c("cnt")).over(
          Window.orderBy(ord).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum(c("cnt")).over(Window.partitionBy(lit(1))))
      cum.select(c("k").as(s"${out}_k"),
        expr("CAST((3 * (cum - cnt)) div n AS INT) + 1").as(out))
    }
    perUser
      .join(broadcast(cut("recency_days", asc = true, "r_bin")),
        c("recency_days") === c("r_bin_k"))
      .join(broadcast(cut("frequency", asc = false, "f_bin")),
        c("frequency") === c("f_bin_k"))
      .join(broadcast(cut("m_bucket", asc = false, "m_bin")),
        c("m_bucket") === c("m_bin_k"))
      .select(c("user_id"), c("recency_days"), c("frequency"), c("monetary_cents"),
        c("r_bin"), c("f_bin"), c("m_bin"),
        concat(c("r_bin"), c("f_bin"), c("m_bin")).as("segment"))
      .orderBy(c("user_id"))
  }

  val eventsRfm2Phase: Q = Q(
    "events_rfm_2phase",
    (s, dir) => rfmHistogramBins(rfmPerUser(s, dir)),
    Some("""
      WITH ev AS (
        SELECT user_id, ts, CAST(ROUND(value * 100) AS BIGINT) c
        FROM events
      ),
      ref AS (SELECT MAX(ts) AS ref FROM ev),
      u AS (
        SELECT user_id,
               (epoch_us(ref) - epoch_us(MAX(ts))) // 86400000000 AS recency_days,
               COUNT(*) AS frequency, SUM(c) AS monetary_cents,
               SUM(c) // 10000 AS m_bucket
        FROM ev, ref
        GROUP BY user_id, ref
      ),
      rh AS (SELECT recency_days k, COUNT(*) cnt FROM u GROUP BY 1),
      rc AS (SELECT k, cnt, SUM(cnt) OVER (ORDER BY k ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum,
               SUM(cnt) OVER () n FROM rh),
      rb AS (SELECT k, CAST((3 * (cum - cnt)) // n AS INT) + 1 r_bin FROM rc),
      fh AS (SELECT frequency k, COUNT(*) cnt FROM u GROUP BY 1),
      fc AS (SELECT k, cnt, SUM(cnt) OVER (ORDER BY k DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum,
               SUM(cnt) OVER () n FROM fh),
      fb AS (SELECT k, CAST((3 * (cum - cnt)) // n AS INT) + 1 f_bin FROM fc),
      mh AS (SELECT m_bucket k, COUNT(*) cnt FROM u GROUP BY 1),
      mc AS (SELECT k, cnt, SUM(cnt) OVER (ORDER BY k DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum,
               SUM(cnt) OVER () n FROM mh),
      mb AS (SELECT k, CAST((3 * (cum - cnt)) // n AS INT) + 1 m_bin FROM mc)
      SELECT user_id, CAST(recency_days AS BIGINT) AS recency_days,
             CAST(frequency AS BIGINT) AS frequency,
             CAST(monetary_cents AS BIGINT) AS monetary_cents,
             r_bin, f_bin, m_bin,
             CAST(r_bin AS VARCHAR) || CAST(f_bin AS VARCHAR) || CAST(m_bin AS VARCHAR)
               AS segment
      FROM u
      JOIN rb ON u.recency_days = rb.k
      JOIN fb ON u.frequency = fb.k
      JOIN mb ON u.m_bucket = mb.k
      ORDER BY user_id
    """)
  )

  /** K-ANONYMITY GATE over the event log: the privacy/compliance check a
    * training-data pipeline runs before behavioral data may ship — any
    * quasi-identifier combination (event type × epoch day × $50 value
    * bucket) seen for fewer than k=5 DISTINCT users re-identifies its
    * members and must be suppressed (Sweeney's k-anonymity, applied at
    * the group level). Emits every QI group with its user and event
    * counts plus the suppression verdict; the suppressed rows are
    * exactly what a release job anti-joins away.
    *
    * All keys are exact integers: the day is TZ-free epoch-day
    * arithmetic (`unix_micros div 86.4e9`, the [[retention]]
    * discipline) and the value bucket is cents `div` 5000 (values are
    * non-negative, so truncating and flooring division agree).
    *
    * Scale shape: deliberately TWO keyed hash aggregations —
    * (QI, user_id) then QI — instead of one `count_distinct`, which
    * Catalyst would plan as an Expand that doubles the shuffled rows.
    * Both aggs partial-combine map-side; the second runs over at most
    * one row per (QI, user) pair, and the QI key space itself is
    * bounded by types × days × buckets, so the output is small no
    * matter the corpus. No window anywhere. */
  val eventsKAnonymity: Q = Q(
    "events_k_anonymity",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events").select(
        $"event_type",
        expr("unix_micros(ts) div 86400000000L").as("day"),
        expr("cast(round(value * 100) as long) div 5000L").as("value_bucket"),
        $"user_id")
      ev.groupBy($"event_type", $"day", $"value_bucket", $"user_id")
        .agg(count(lit(1)).as("n"))
        .groupBy($"event_type", $"day", $"value_bucket")
        .agg(count(lit(1)).as("n_users"), sum($"n").as("n_events"))
        .select($"event_type", $"day", $"value_bucket", $"n_users", $"n_events",
          ($"n_users" < 5).as("suppressed"))
        .orderBy($"event_type", $"day", $"value_bucket")
    },
    Some("""
      WITH ev AS (
        SELECT event_type,
               epoch_us(ts) // 86400000000 AS day,
               CAST(ROUND(value * 100) AS BIGINT) // 5000 AS value_bucket,
               user_id
        FROM events
      ),
      per_user AS (
        SELECT event_type, day, value_bucket, user_id, COUNT(*) AS n
        FROM ev GROUP BY 1, 2, 3, 4
      )
      SELECT event_type, CAST(day AS BIGINT) AS day,
             CAST(value_bucket AS BIGINT) AS value_bucket,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(n) AS BIGINT) AS n_events,
             COUNT(*) < 5 AS suppressed
      FROM per_user GROUP BY 1, 2, 3
      ORDER BY event_type, day, value_bucket
    """)
  )

  /** HEAVY HITTERS over the event log: per event type, the users whose
    * event count is at least 1.5× THE UNIFORM SHARE of that type — the
    * frequent-items query behind abuse detection, per-entity rate
    * caps, and "which users dominate this behavior" audits. The
    * threshold is relative (count·n_users ≥ 1.5·n_type) rather than a
    * fixed φ because an absolute share is meaningless across corpus
    * sizes: the max per-user share here is ~10% at 15 users and ~1.2%
    * at 150 — any constant φ degenerates to all-or-nothing as the
    * corpus grows. All-integer comparison (2·n·n_users ≥ 3·n_type),
    * exact floor-divided per-mille ratio emitted for audit.
    *
    * Scale shape: the classic two-level exact plan — (type, user) agg
    * (map-side combined), per-type totals reduced to ≤|types| rows and
    * broadcast back; no window, no distinct-Expand. When per-key
    * cardinality outgrows the exact agg, the sketch path is
    * Misra-Gries/count-min per partition merged at the driver (the
    * [[graft.operators.Dedup]] CMS machinery) — the exact form here is
    * the oracle-able contract the sketch must approximate. */
  val eventsHeavyHitters: Q = Q(
    "events_heavy_hitters",
    (s, dir) => {
      import s.implicits._
      val perUser = Tables.load(s, dir, "events")
        .groupBy($"event_type", $"user_id").agg(count(lit(1)).as("n"))
      val tot = perUser.groupBy($"event_type")
        .agg(sum($"n").as("n_type"), count(lit(1)).as("n_users"))
      perUser.join(broadcast(tot), "event_type")
        .filter($"n" * $"n_users" * 2 >= $"n_type" * 3)
        .select($"event_type", $"user_id", $"n", $"n_type", $"n_users",
          expr("(n * n_users * 1000) div n_type").as("over_uniform_milli"))
        .orderBy($"event_type", $"user_id")
    },
    Some("""
      WITH c AS (
        SELECT event_type, user_id, COUNT(*) AS n
        FROM events GROUP BY 1, 2
      ),
      t AS (
        SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_type,
               COUNT(*) AS n_users
        FROM c GROUP BY 1
      )
      SELECT c.event_type, c.user_id, CAST(c.n AS BIGINT) AS n,
             t.n_type, CAST(t.n_users AS BIGINT) AS n_users,
             CAST((c.n * t.n_users * 1000) // t.n_type AS BIGINT) AS over_uniform_milli
      FROM c JOIN t USING (event_type)
      WHERE c.n * t.n_users * 2 >= t.n_type * 3
      ORDER BY c.event_type, c.user_id
    """)
  )

  /** ROBUST (median/MAD) outlier gate over the event log — the
    * heavy-tail-safe complement to [[eventOutliers]]' z-test: mean and
    * σ are themselves dragged by the outliers they're meant to catch,
    * while the median and the median-absolute-deviation are 50%-
    * breakdown robust. Flags events whose |cents − median| exceeds
    * 3·1.4826·MAD (the normal-consistency constant), per event type.
    *
    * Parity: cents are exact integers; both engines compute the exact
    * interpolated median (sorted lower + 0.5·gap — halves of integers
    * are exact doubles), the same absolute deviations, the same second
    * median, and one identical IEEE product for the threshold — no
    * rounding needed anywhere.
    *
    * Scale shape: the catalog form uses the exact `percentile`
    * aggregate (per-group value buffer — fine while a type's traffic
    * fits an executor); at 100 TB the cents domain is bounded (≤5M
    * distinct values), so both medians take the
    * [[tokenPercentilesBinned]] two-phase histogram treatment — a
    * (type, cents) count table and a cumulative walk, exact at any
    * volume. The flagging pass itself is a broadcast join + stateless
    * filter either way. */
  val eventsOutliersMad: Q = Q(
    "events_outliers_mad",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .select($"event_id", $"event_type",
          round($"value" * 100).cast("long").as("cents"))
      val med = ev.groupBy($"event_type")
        .agg(expr("percentile(cents, 0.5)").as("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("dev", abs($"cents" - $"med"))
      val mad = dev.groupBy($"event_type")
        .agg(expr("percentile(dev, 0.5)").as("mad"))
      dev.join(broadcast(mad), "event_type")
        .select($"event_id", $"event_type", $"cents", $"med", $"mad",
          ($"dev" > $"mad" * lit(3 * 1.4826)).as("is_outlier"))
        .filter($"is_outlier")
        .select($"event_id", $"event_type", $"cents", $"med", $"mad")
        .orderBy($"event_id")
    },
    Some("""
      WITH ev AS (
        SELECT event_id, event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
      ),
      m AS (SELECT event_type, quantile_cont(cents, 0.5) AS med FROM ev GROUP BY 1),
      d AS (
        SELECT ev.event_id, ev.event_type, ev.cents, m.med,
               abs(ev.cents - m.med) AS dev
        FROM ev JOIN m USING (event_type)
      ),
      md AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM d GROUP BY 1)
      SELECT d.event_id, d.event_type, d.cents, d.med, md.mad
      FROM d JOIN md USING (event_type)
      WHERE d.dev > md.mad * (3 * 1.4826)
      ORDER BY d.event_id
    """)
  )

  /** SOURCE-INTERLEAVED training order: the deterministic "don't feed
    * the model an hour of one crawl then an hour of the next" ordering
    * — documents of the S sources are round-robined so any contiguous
    * window of the training stream carries every live source. Each
    * doc gets a content-addressed in-source rank r (the
    * [[corpusShuffle]] md5 order), the source gets a stable index
    * s ∈ [0, S), and the interleave key is pos = r·S + s — globally
    * monotone round-robin WITHOUT a global sort: positions of
    * exhausted sources simply leave gaps, which a training loader
    * reading in pos order never notices.
    *
    * Scale shape: one source-partitioned window for r (the only
    * exchange; source skew bounded by the per-source rank being a
    * running count, not a sort of the corpus), a ≤S-row aggregate for
    * the source index joined back via broadcast, and a stateless
    * key projection. The tiny global window ranks S source names, not
    * corpus rows. */
  /** the interleave over a prepared (doc_id, source) frame — split out
    * so InterleavePropertySpec drives it over arbitrary corpora. */
  private[graft] def interleaveOrder(d0: DataFrame): DataFrame = {
    val s = d0.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val d = d0.select($"doc_id", $"source",
      md5(concat(lit("interleave:"), $"doc_id".cast("string"))).as("skey"))
    val srcIdx = d.select($"source").distinct()
      .withColumn("s_idx",
        row_number().over(Window.orderBy($"source")).cast("long") - 1L)
    val nSrc = srcIdx.count()
    val w = Window.partitionBy($"source").orderBy($"skey", $"doc_id")
    d.withColumn("r", row_number().over(w).cast("long") - 1L)
      .join(broadcast(srcIdx), "source")
      .select($"doc_id", $"source", $"r",
        ($"r" * nSrc + $"s_idx").as("pos"))
      .orderBy($"pos")
  }

  val corpusInterleave: Q = Q(
    "corpus_interleave",
    (s, dir) => interleaveOrder(Tables.load(s, dir, "documents")),
    Some("""
      WITH d AS (
        SELECT doc_id, source,
               md5('interleave:' || CAST(doc_id AS VARCHAR)) AS skey
        FROM documents
      ),
      si AS (
        SELECT source,
               CAST(ROW_NUMBER() OVER (ORDER BY source) AS BIGINT) - 1 AS s_idx
        FROM (SELECT DISTINCT source FROM d)
      ),
      n AS (SELECT COUNT(*) AS n_src FROM si),
      r AS (
        SELECT doc_id, source,
               CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY skey, doc_id) AS BIGINT) - 1 AS r
        FROM d
      )
      SELECT r.doc_id, r.source, r.r, r.r * n.n_src + si.s_idx AS pos
      FROM r JOIN si USING (source) CROSS JOIN n
      ORDER BY pos
    """)
  )

  def queries: Seq[Q] =
    Seq(splitAssign, filteredTopK, tokenPercentiles, tokenPercentilesBinned, sampleStratified, sampleWeighted,
      sourceCap, eventOutliers, funnel, packSequences, packEfficiency, packFfd, packFfdLayout, mixSample, mixUpsample,
      curationE2e,
      packSequencesSharded, sourceCapTwoPhase, sampleStratifiedThreshold,
      mixTemperature, mixToTarget, mixEpochs, ragRetrieve, corpusShuffle, corpusInterleave, curateOrder, retention, eventsRfm, eventsRfm2Phase,
      eventsKAnonymity, corpusZorder, eventsHeavyHitters, eventsOutliersMad,
      snapshotDiff, eventsSequences, eventsMarkov, tokenBudget, tokenBudget2Phase,
      budgetUpdateLww)
}
