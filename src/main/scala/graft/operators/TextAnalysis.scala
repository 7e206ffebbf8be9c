package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFns

/** Text-analysis operators over `documents`: token counting (whitespace
  * + a BPE-ish regex), quality scoring, n-gram-heuristic language ID,
  * and content fingerprinting. All pure per-row column expressions —
  * embarrassingly parallel, no shuffle except the final presentation
  * sort — so they scale linearly with the corpus.
  *
  * Ratios are int/int double divisions of identical integers in both
  * engines (exact IEEE), so the oracle matches bit-for-bit.
  */
object TextAnalysis {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  private val stopEn = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  private val stopEs = Seq("el", "la", "de", "los", "las", "y", "en", "que")
  private val stopDe = Seq("der", "die", "das", "und", "von", "zu", "den", "ist")
  private val stopFr = Seq("le", "la", "les", "de", "des", "et", "en", "est")

  private def sqlList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("[", ", ", "]")
  private def sqlMarker(ws: Seq[String]) =
    s"CAST(len(list_filter(toks, t -> list_contains(${sqlList(ws)}, t))) AS INT)"

  /** Token counting: whitespace tokens, distinct tokens, characters,
    * and BPE-ish subword count ([a-z]+ runs | digits | punctuation). */
  val tokenCount: Q = Q(
    "text_tokens",
    (s, dir) => {
      import s.implicits._
      docs(s, dir)
        .select(
          $"doc_id",
          size(TextFns.tokens($"text")).as("n_tokens"),
          size(array_distinct(TextFns.tokens($"text"))).as("n_distinct"),
          length($"text").as("n_chars"),
          regexp_count(lower($"text"), lit("[a-z]+|[0-9]|[^a-z0-9 ]")).cast("int").as("n_bpeish")
        )
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS INT) AS n_tokens,
             CAST(len(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS INT) AS n_distinct,
             CAST(LENGTH(text) AS INT) AS n_chars,
             CAST(len(regexp_extract_all(LOWER(text), '[a-z]+|[0-9]|[^a-z0-9 ]')) AS INT) AS n_bpeish
      FROM documents
      ORDER BY doc_id
    """)
  )

  /** Quality scoring: length, lexical diversity, stopword ratio and
    * mean token length folded into one [0,1]-ish score. */
  val quality: Q = Q(
    "text_quality",
    (s, dir) => {
      import s.implicits._
      val toks = TextFns.tokens($"text")
      val nTok = size(toks)
      val diversity = size(array_distinct(toks)) / nTok
      val stopRatio = TextFns.markerCount(toks, stopEn) / nTok
      val meanLen = (length($"text") - nTok + 1) / nTok
      docs(s, dir)
        .filter(nTok > 0)
        .select(
          $"doc_id",
          diversity.as("diversity"),
          stopRatio.as("stop_ratio"),
          meanLen.as("mean_token_len"),
          (diversity * 0.5 + stopRatio * 0.2 +
            when(nTok >= 20 && nTok <= 2000, 0.3).otherwise(0.0)).as("quality")
        )
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH t AS (
        SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x <> '') toks
        FROM documents
      )
      SELECT doc_id,
        CAST(len(list_distinct(toks)) AS INT) / CAST(len(toks) AS INT) AS diversity,
        ${sqlMarker(stopEn)} / CAST(len(toks) AS INT) AS stop_ratio,
        CAST(LENGTH(text) - len(toks) + 1 AS INT) / CAST(len(toks) AS INT) AS mean_token_len,
        (CAST(len(list_distinct(toks)) AS INT) / CAST(len(toks) AS INT)) * 0.5
          + (${sqlMarker(stopEn)} / CAST(len(toks) AS INT)) * 0.2
          + CASE WHEN len(toks) BETWEEN 20 AND 2000 THEN 0.3 ELSE 0.0 END AS quality
      FROM t
      WHERE len(toks) > 0
      ORDER BY doc_id
    """)
  )

  /** Quality CLASSIFIER: a fixed-weight linear model over the
    * [[quality]] features — the engine-side stand-in for the
    * fastText-style quality gates every pretraining corpus runs
    * (weights would come from a trained model; the plumbing is what
    * the engine owns). Emits the raw logit and the keep decision
    * (logit > 0), so downstream curation composes on `keep` without
    * re-deriving features.
    *
    * Numeric-parity design: every feature is a ratio of integers and
    * the logit is a fixed left-associated chain of IEEE adds/muls — no
    * exp/log — so the double is bit-identical across engines and the
    * oracle compares it EXACTLY (no micro-rounding needed; same
    * discipline as [[quality]]). A pure per-row projection: stateless,
    * shuffle-free, free at 100 TB. */
  val qualityClassifier: Q = Q(
    "text_quality_classifier",
    (s, dir) => {
      import s.implicits._
      val toks = TextFns.tokens($"text")
      val nTok = size(toks)
      val diversity = size(array_distinct(toks)) / nTok
      val stopRatio = TextFns.markerCount(toks, stopEn) / nTok
      val meanLen = (length($"text") - nTok + 1) / nTok
      val lenBand = when(nTok >= 20 && nTok <= 2000, 0.8).otherwise(-0.6)
      val logit =
        lit(-1.5) + diversity * 3.2 + stopRatio * 2.0 + lenBand + meanLen * -0.02
      docs(s, dir)
        .filter(nTok > 0)
        .select($"doc_id", logit.as("logit"), (logit > 0).as("keep"))
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH t AS (
        SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x <> '') toks
        FROM documents
      ), f AS (
        SELECT doc_id,
          CAST(len(list_distinct(toks)) AS INT) / CAST(len(toks) AS INT) AS diversity,
          ${sqlMarker(stopEn)} / CAST(len(toks) AS INT) AS stop_ratio,
          CAST(LENGTH(text) - len(toks) + 1 AS INT) / CAST(len(toks) AS INT) AS mean_token_len,
          len(toks) AS n_tok
        FROM t
        WHERE len(toks) > 0
      )
      SELECT doc_id,
        -1.5 + diversity * 3.2 + stop_ratio * 2.0
          + CASE WHEN n_tok BETWEEN 20 AND 2000 THEN 0.8 ELSE -0.6 END
          + mean_token_len * -0.02 AS logit,
        (-1.5 + diversity * 3.2 + stop_ratio * 2.0
          + CASE WHEN n_tok BETWEEN 20 AND 2000 THEN 0.8 ELSE -0.6 END
          + mean_token_len * -0.02) > 0 AS keep
      FROM f
      ORDER BY doc_id
    """)
  )

  /** Language ID by stopword-marker voting + CJK character heuristic,
    * ties broken by a fixed chain (en > es > de > fr). On this corpus
    * (shared synthetic vocab) the value is determinism, not accuracy —
    * TextSpec asserts the algorithm, the oracle asserts engine parity. */
  val langId: Q = Q(
    "text_langid",
    (s, dir) => {
      import s.implicits._
      val toks = TextFns.tokens(lower($"text"))
      val sEn = TextFns.markerCount(toks, stopEn)
      val sEs = TextFns.markerCount(toks, stopEs)
      val sDe = TextFns.markerCount(toks, stopDe)
      val sFr = TextFns.markerCount(toks, stopFr)
      val sZh = TextFns.nonAsciiCount($"text")
      docs(s, dir)
        .select($"doc_id", $"lang".as("labeled_lang"),
          sEn.as("s_en"), sEs.as("s_es"), sDe.as("s_de"), sFr.as("s_fr"), sZh.as("s_zh"))
        .withColumn("predicted",
          when($"s_zh" * 4 > $"s_en" + $"s_es" + $"s_de" + $"s_fr" + 1, "zh")
            .when($"s_en" >= $"s_es" && $"s_en" >= $"s_de" && $"s_en" >= $"s_fr" && $"s_en" > 0, "en")
            .when($"s_es" >= $"s_de" && $"s_es" >= $"s_fr" && $"s_es" > 0, "es")
            .when($"s_de" >= $"s_fr" && $"s_de" > 0, "de")
            .when($"s_fr" > 0, "fr")
            .otherwise("und"))
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH t AS (
        SELECT doc_id, lang, text,
               list_filter(string_split(LOWER(text), ' '), x -> x <> '') toks
        FROM documents
      ), sc AS (
        SELECT doc_id, lang AS labeled_lang,
          ${sqlMarker(stopEn)} AS s_en,
          ${sqlMarker(stopEs)} AS s_es,
          ${sqlMarker(stopDe)} AS s_de,
          ${sqlMarker(stopFr)} AS s_fr,
          CAST(LENGTH(regexp_replace(text, '[\\x00-\\x7F]', '', 'g')) AS INT) AS s_zh
        FROM t
      )
      SELECT doc_id, labeled_lang, s_en, s_es, s_de, s_fr, s_zh,
        CASE
          WHEN s_zh * 4 > s_en + s_es + s_de + s_fr + 1 THEN 'zh'
          WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en > 0 THEN 'en'
          WHEN s_es >= s_de AND s_es >= s_fr AND s_es > 0 THEN 'es'
          WHEN s_de >= s_fr AND s_de > 0 THEN 'de'
          WHEN s_fr > 0 THEN 'fr'
          ELSE 'und'
        END AS predicted
      FROM sc
      ORDER BY doc_id
    """)
  )

  /** Content fingerprint (md5 of the sorted distinct token set) plus a
    * first-8-hex-chars shard key — the partitioning handle a 100 TB
    * dedup/bucketing pipeline would use. */
  val fingerprintQ: Q = Q(
    "text_fingerprint",
    (s, dir) => {
      import s.implicits._
      docs(s, dir)
        .select($"doc_id", TextFns.fingerprint($"text").as("fp"))
        .withColumn("fp_shard", substring($"fp", 1, 8))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))), ' ')) AS fp,
             SUBSTRING(md5(array_to_string(list_sort(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))), ' ')), 1, 8) AS fp_shard
      FROM documents
      ORDER BY doc_id
    """)
  )

  /** Per-language top-10 distinctive terms: tf (term occurrences within
    * the language) weighted by inverse document frequency. The score is
    * the exact rational tf/df evaluated as one IEEE double division of
    * two integers — correctly rounded and therefore bit-identical across
    * engines, unlike a log-based idf where last-ulp drift could flip a
    * rank. Ties (equal ratios) break on term ASC, so the top-k is fully
    * deterministic.
    *
    * Scale shape: explode → two partial-aggregated shuffles (tf keyed on
    * (lang, term); df on term after a distinct that is itself partial)
    * → tf⋈df equi-join on term → per-language top-k window. The df side
    * is NOT broadcast-hinted: vocabulary cardinality grows with corpus
    * size (heaps-law — hundreds of millions of distinct terms at the
    * 100 TB target would OOM a forced driver broadcast), so the planner
    * (with AQE runtime stats) picks broadcast vs shuffle-hash per run;
    * both sides are already term-keyed aggregates, so the sort-merge
    * fallback reuses the df shuffle's partitioning. */
  val topTerms: Q = Q(
    "text_topterms",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val k = 10
      val toks = docs(s, dir)
        .select($"doc_id", $"lang", explode(TextFns.tokens($"text")).as("term"))
      val tf = toks.groupBy($"lang", $"term").agg(count(lit(1)).as("tf"))
      val dfreq = toks.select($"doc_id", $"term").distinct()
        .groupBy($"term").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy($"lang").orderBy($"score".desc, $"term")
      tf.join(dfreq, "term")
        .withColumn("score", $"tf".cast("double") / $"df")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= k)
        .select($"lang", $"rn", $"term", $"tf", $"df", $"score")
        .orderBy($"lang", $"rn")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, lang,
               unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
        FROM documents
      ),
      tf AS (SELECT lang, term, COUNT(*) AS tf FROM toks GROUP BY lang, term),
      df AS (SELECT term, COUNT(*) AS df
             FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY term),
      sc AS (SELECT lang, tf.term, tf.tf, df.df, CAST(tf.tf AS DOUBLE) / df.df AS score
             FROM tf JOIN df USING (term)),
      r AS (SELECT lang, term, tf, df, score,
              ROW_NUMBER() OVER (PARTITION BY lang ORDER BY score DESC, term) AS rn
            FROM sc)
      SELECT lang, rn, term, tf, df, score FROM r WHERE rn <= 10 ORDER BY lang, rn
    """)
  )

  /** BM25 relevance scoring of a fixed keyword query ("hash join
    * stream") over the corpus — the lexical half of a hybrid retrieval
    * pipeline (the vector half is [[Pipeline.filteredTopK]]). Standard
    * Robertson parameters k1=1.2, b=0.75, idf = ln(1+(N−df+0.5)/(df+0.5)).
    *
    * Scale shape: corpus stats (N, avgdl, per-term df) are ONE tiny
    * aggregate row broadcast back over the corpus; scoring is then a
    * pure per-row projection — no shuffle grows with document count.
    * The score is emitted in micro-units (×1e6, rounded) because ln()
    * is the one sub-ulp-implementation-dependent function in the
    * engine; both engines see bit-identical inputs, so a flip requires
    * the true value within ~1 ulp of a micro boundary (~1e-9/row). */
  private val bm25Terms = Seq("hash", "join", "stream")

  /** The shared BM25-scored frame (doc_id, tf_*, bm25_micro) for the
    * fixed query — [[bm25]] emits it by doc_id, [[searchTopK]] ranks
    * it. One tiny stats row broadcast over the corpus; pure per-row
    * scoring after that. */
  /** Fixture-spread dial for the text kernels — the shingleSets
    * discipline (round-19 batch 5) extended to the four text kernel
    * spreads that were kept pinned WITHOUT an interleaved A/B (round-19
    * verdict item 6): `graft.text.kernel.pinnedWidth` = 0 forces
    * unpinned `repartition($"doc_id")` (AQE may coalesce at fixture
    * scale — serial kernel, no 32-task scheduling tax), N pins N-wide
    * (parallel kernel — what a real multi-split corpus wants); unset
    * takes the call site's default, priced per query by
    * `tools.TextWidthProbe` (interleaved arms, one JVM, alternating
    * order). Round-20 medians over 6 rounds at sf0.1: pinned/unpinned
    * ratio 1.98 (bigrams), 1.47 (bm25), 1.31 (search_topk), 1.22
    * (pmi), 1.16 (repetition) — pinned lost EVERYWHERE at fixture
    * scale (the 32-task scheduling + 32-way partial-agg merge costs
    * more than the ~250 ms serial kernel it parallelizes), so every
    * call site defaults UNPINNED; a real multi-split corpus that
    * wants the parallel kernel sets the conf. */
  private def kernelSpread(s: SparkSession, df: DataFrame,
      defaultPinned: Boolean): DataFrame = {
    import org.apache.spark.sql.functions.col
    val pin = s.conf.getOption("graft.text.kernel.pinnedWidth").map(_.toInt)
      .getOrElse(if (defaultPinned) graft.GraftSession.spreadWidth(s) else 0)
    if (pin > 0) df.repartition(pin, col("doc_id"))
    else df.repartition(col("doc_id"))
  }

  private def bm25Scored(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.Column
    val terms = bm25Terms
    val d = kernelSpread(s, docs(s, dir), defaultPinned = false)
      .select($"doc_id", TextFns.tokens($"text").as("toks"))
      .withColumn("dl", size($"toks"))
    val tf = terms.foldLeft(d) { (df, t) =>
      df.withColumn(s"tf_$t", size(filter($"toks", x => x === t)))
    }
    val aggExprs = count(lit(1)).as("n_docs") +: avg($"dl").as("avgdl") +:
      terms.map(t => sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    val stats = tf.agg(aggExprs.head, aggExprs.tail: _*)
    def termScore(t: String): Column = {
      val tfc = col(s"tf_$t"); val dfc = col(s"df_$t")
      val idf = log(lit(1.0) + (($"n_docs" - dfc) + 0.5) / (dfc + 0.5))
      idf * (tfc * 2.2) / (tfc + lit(1.2) * (lit(0.25) + lit(0.75) * ($"dl" / $"avgdl")))
    }
    tf.crossJoin(broadcast(stats))
      .filter(terms.map(t => col(s"tf_$t")).reduce(_ + _) > 0)
      .select($"doc_id" +: terms.map(t => col(s"tf_$t")) :+
        round(terms.map(termScore).reduce(_ + _) * 1e6).cast("long").as("bm25_micro"): _*)
  }

  val bm25: Q = {
    Q(
      "text_bm25",
      (s, dir) => {
        import s.implicits._
        bm25Scored(s, dir).orderBy($"doc_id")
      },
      Some("""
        WITH d AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
          FROM documents
        ),
        tf AS (
          SELECT doc_id, len(toks) dl,
                 CAST(len(list_filter(toks, x -> x = 'hash'))   AS INT) tf_hash,
                 CAST(len(list_filter(toks, x -> x = 'join'))   AS INT) tf_join,
                 CAST(len(list_filter(toks, x -> x = 'stream')) AS INT) tf_stream
          FROM d
        ),
        st AS (
          SELECT COUNT(*) n_docs, AVG(dl) avgdl,
                 CAST(SUM(CASE WHEN tf_hash   > 0 THEN 1 ELSE 0 END) AS BIGINT) df_hash,
                 CAST(SUM(CASE WHEN tf_join   > 0 THEN 1 ELSE 0 END) AS BIGINT) df_join,
                 CAST(SUM(CASE WHEN tf_stream > 0 THEN 1 ELSE 0 END) AS BIGINT) df_stream
          FROM tf
        )
        SELECT doc_id, tf_hash, tf_join, tf_stream,
               CAST(ROUND((
                   ln(1.0 + (CAST(n_docs - df_hash AS DOUBLE) + 0.5) / (CAST(df_hash AS DOUBLE) + 0.5))
                     * (CAST(tf_hash AS DOUBLE) * 2.2) / (tf_hash + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
                 + ln(1.0 + (CAST(n_docs - df_join AS DOUBLE) + 0.5) / (CAST(df_join AS DOUBLE) + 0.5))
                     * (CAST(tf_join AS DOUBLE) * 2.2) / (tf_join + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
                 + ln(1.0 + (CAST(n_docs - df_stream AS DOUBLE) + 0.5) / (CAST(df_stream AS DOUBLE) + 0.5))
                     * (CAST(tf_stream AS DOUBLE) * 2.2) / (tf_stream + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
               ) * 1e6) AS BIGINT) AS bm25_micro
        FROM tf, st
        WHERE tf_hash + tf_join + tf_stream > 0
        ORDER BY doc_id
      """)
    )
  }

  /** BM25 RETRIEVAL: the top-10 documents for the fixed query, ranked
    * by [[bm25]]'s micro-unit score (ties broken by doc_id, so the
    * result is total-ordered and fully oracled). This is the serving
    * half of lexical search — ranking, not per-doc audit.
    *
    * Scale shape: identical scoring plan (one broadcast stats row, per-
    * row projection), then top-k planned as TakeOrderedAndProject — at
    * most k rows leave each partition, so result traffic is O(k·parts)
    * regardless of corpus size; no global sort materializes. */
  val searchTopK: Q = Q(
    "text_search_topk",
    (s, dir) => {
      import s.implicits._
      bm25Scored(s, dir)
        .orderBy(desc("bm25_micro"), $"doc_id")
        .limit(10)
    },
    Some("""
      WITH d AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
        FROM documents
      ),
      tf AS (
        SELECT doc_id, len(toks) dl,
               CAST(len(list_filter(toks, x -> x = 'hash'))   AS INT) tf_hash,
               CAST(len(list_filter(toks, x -> x = 'join'))   AS INT) tf_join,
               CAST(len(list_filter(toks, x -> x = 'stream')) AS INT) tf_stream
        FROM d
      ),
      st AS (
        SELECT COUNT(*) n_docs, AVG(dl) avgdl,
               CAST(SUM(CASE WHEN tf_hash   > 0 THEN 1 ELSE 0 END) AS BIGINT) df_hash,
               CAST(SUM(CASE WHEN tf_join   > 0 THEN 1 ELSE 0 END) AS BIGINT) df_join,
               CAST(SUM(CASE WHEN tf_stream > 0 THEN 1 ELSE 0 END) AS BIGINT) df_stream
        FROM tf
      )
      SELECT doc_id, tf_hash, tf_join, tf_stream,
             CAST(ROUND((
                 ln(1.0 + (CAST(n_docs - df_hash AS DOUBLE) + 0.5) / (CAST(df_hash AS DOUBLE) + 0.5))
                   * (CAST(tf_hash AS DOUBLE) * 2.2) / (tf_hash + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
               + ln(1.0 + (CAST(n_docs - df_join AS DOUBLE) + 0.5) / (CAST(df_join AS DOUBLE) + 0.5))
                   * (CAST(tf_join AS DOUBLE) * 2.2) / (tf_join + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
               + ln(1.0 + (CAST(n_docs - df_stream AS DOUBLE) + 0.5) / (CAST(df_stream AS DOUBLE) + 0.5))
                   * (CAST(tf_stream AS DOUBLE) * 2.2) / (tf_stream + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
             ) * 1e6) AS BIGINT) AS bm25_micro
      FROM tf, st
      WHERE tf_hash + tf_join + tf_stream > 0
      ORDER BY bm25_micro DESC, doc_id
      LIMIT 10
    """)
  )

  /** Unigram LM scoring: per-document total log-probability under the
    * corpus's own unigram distribution — the cheap stand-in for the
    * KenLM/perplexity quality filters (CCNet-style) every pretraining
    * corpus runs; low `sum_lp_micro / n_tokens` flags gibberish and
    * boilerplate-heavy docs.
    *
    * Parity discipline: each DISTINCT term's `ln(cnt/N)` is
    * micro-rounded to BIGINT once (ln is the only sub-ulp function;
    * a flip needs the true value within ~1 ulp of a micro boundary,
    * ~1e-9 per term — the [[bm25]] discipline), then per-doc totals
    * are exact integer sums — order-independent, so fully oracled.
    *
    * Scale shape: term-frequency agg with map-side combine (one
    * shuffle on term); the term→logprob table is vocabulary-sized
    * (bounded in practice: top-V + OOV floor) and BROADCAST back onto
    * the exploded token stream, whose per-doc re-sum partial-aggregates
    * to one row per doc before its exchange. The corpus is scanned
    * twice (tf build + scoring) rather than materializing the exploded
    * stream — at 100 TB a rescan beats a shuffle-sized cache. */
  val unigramLogprob: Q = Q(
    "text_unigram_logprob",
    (s, dir) => {
      import s.implicits._
      val toks = docs(s, dir)
        .select($"doc_id", explode(TextFns.tokens($"text")).as("term"))
      val tf = toks.groupBy($"term").agg(count(lit(1)).as("cnt"))
      val total = tf.agg(sum($"cnt").as("n"))
      val lp = tf.crossJoin(broadcast(total))
        .select($"term",
          round(log($"cnt" / $"n") * 1e6).cast("long").as("lp_micro"))
      toks.join(broadcast(lp), "term")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum($"lp_micro").as("sum_lp_micro"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH t AS (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) term
        FROM documents
      ), tf AS (
        SELECT term, COUNT(*) cnt FROM t GROUP BY 1
      ), n AS (
        SELECT SUM(cnt) n FROM tf
      ), lp AS (
        SELECT term,
               CAST(ROUND(ln(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6) AS BIGINT) lp_micro
        FROM tf, n
      )
      SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(lp_micro) AS BIGINT) AS sum_lp_micro
      FROM t JOIN lp USING (term)
      GROUP BY 1
      ORDER BY 1
    """)
  )

  /** text → bigram stream in one tight pass. The declarative form —
    * `explode(transform(sequence(...), i -> concat_ws(slice(...))))` —
    * is interpreted (higher-order functions are not codegen'd) at
    * ~10µs/shingle AND lands in one task on a single-file scan; the
    * kernel + an up-front repartition keeps the hot path compiled and
    * parallel (the `sketchText` precedent, Dedup.scala). Shingling
    * must match DuckDB `string_split(text,' ')` semantics: split on
    * the literal space, drop empties. */
  private def bigramsOf(text: String): Array[String] = {
    if (text == null) return Array.empty   // match string_split(NULL) row-drop
    val toks = text.split(' ').filter(_.nonEmpty)
    if (toks.length < 2) Array.empty
    else Array.tabulate(toks.length - 1)(i => toks(i) + " " + toks(i + 1))
  }

  /** Global top-20 bigrams by corpus frequency — the n-gram corpus
    * statistic (contamination screens, boilerplate detection, tokenizer
    * diagnostics). Kernel-shingle → partially-aggregated count on the
    * bigram key → top-k as TakeOrderedAndProject: only ≤k rows per
    * partition survive the map side, so the result traffic is O(k),
    * not O(vocab²). Ties break on the bigram string, making the top-k
    * total-ordered. */
  val bigrams: Q = Q(
    "text_bigrams",
    (s, dir) => {
      import s.implicits._
      kernelSpread(s, docs(s, dir), defaultPinned = false)
        .select($"text").as[String]
        .mapPartitions(_.flatMap(bigramsOf))
        .toDF("bigram")
        .groupBy($"bigram")
        .agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"bigram")
        .limit(20)
    },
    Some("""
      WITH t AS (
        SELECT list_filter(string_split(text, ' '), x -> x <> '') toks FROM documents
      ),
      bg AS (
        SELECT unnest(list_transform(range(len(toks)-1),
               i -> array_to_string(toks[i+1:i+2], ' '))) AS bigram
        FROM t WHERE len(toks) >= 2
      )
      SELECT bigram, COUNT(*) AS cnt
      FROM bg GROUP BY bigram
      ORDER BY cnt DESC, bigram LIMIT 20
    """)
  )

  /** Repetition-ratio quality signal (the "excessive duplicate n-gram"
    * filter of web-scale curation pipelines): per document, the
    * fraction of its bigram stream already seen in the same document —
    * 1 − distinct/total — with docs above 0.2 flagged. The bigram
    * count/distinct pair comes from the one-pass kernel (see
    * [[bigramsOf]]); the ratio is one int/int IEEE division, exact in
    * both engines. No shuffle grows with the corpus — only the
    * presentation sort. */
  val repetition: Q = Q(
    "text_repetition",
    (s, dir) => {
      import s.implicits._
      kernelSpread(s, docs(s, dir), defaultPinned = false)
        .select($"doc_id", $"text").as[(Long, String)]
        .mapPartitions(_.flatMap { case (id, text) =>
          val bg = bigramsOf(text)
          if (bg.isEmpty) None
          else {
            val seen = new java.util.HashSet[String]()
            var i = 0
            while (i < bg.length) { seen.add(bg(i)); i += 1 }
            Some((id, bg.length, seen.size))
          }
        })
        .toDF("doc_id", "n_bigrams", "n_distinct")
        .withColumn("rep_ratio", lit(1.0) - ($"n_distinct" / $"n_bigrams"))
        .withColumn("flagged", $"rep_ratio" > 0.2)
        .orderBy($"doc_id")
    },
    Some("""
      WITH t AS (
        SELECT doc_id, list_transform(range(len(toks)-1),
                 i -> array_to_string(toks[i+1:i+2], ' ')) AS bg
        FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') toks
              FROM documents)
        WHERE len(toks) >= 2
      )
      SELECT doc_id,
             CAST(len(bg) AS INT) AS n_bigrams,
             CAST(len(list_distinct(bg)) AS INT) AS n_distinct,
             1.0 - (CAST(len(list_distinct(bg)) AS INT) / CAST(len(bg) AS INT)) AS rep_ratio,
             (1.0 - (CAST(len(list_distinct(bg)) AS INT) / CAST(len(bg) AS INT))) > 0.2 AS flagged
      FROM t
      WHERE len(bg) > 0
      ORDER BY doc_id
    """)
  )

  /** Document chunking for embedding/RAG ingestion: fixed 32-token
    * windows at stride 24 (8-token overlap so no boundary sentence is
    * ever split across chunks without context), each with its ordinal,
    * exact token count, and a content-address (md5 of the chunk text)
    * ready for downstream chunk-level dedup and vectorization. Chunk
    * boundaries are a pure function of the token sequence — no model,
    * no RNG — so both engines and any rerun produce identical chunks.
    *
    * Scale shape: a per-row explode (fan-out ≈ n_tokens/24), no
    * shuffle — chunking rides the ingest scan; at 100 TB the output
    * feeds the embedding stage partition-local. */
  val docChunks: Q = Q(
    "doc_chunks",
    (s, dir) => {
      import s.implicits._
      val (win, stride) = (32, 24)
      Tables.load(s, dir, "documents")
        .select($"doc_id", TextFns.tokens($"text").as("toks"))
        .filter(size($"toks") > 0)
        .select($"doc_id", size($"toks").cast("long").as("n_tokens"),
          posexplode(expr(
            s"transform(sequence(0, size(toks) - 1, $stride), " +
              s"st -> concat_ws(' ', slice(toks, st + 1, $win)))")))
        .select($"doc_id", $"pos".cast("long").as("chunk_idx"),
          least(lit(win).cast("long"), $"n_tokens" - $"pos" * stride)
            .as("n_chunk_tokens"),
          md5($"col").as("chunk_fp"))
        .orderBy($"doc_id", $"chunk_idx")
    },
    Some("""
      WITH t AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
      ),
      c AS (
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
               unnest(list_transform(range(0, len(toks), 24),
                 st -> struct_pack(idx := st // 24,
                   txt := array_to_string(toks[st + 1 : st + 32], ' ')))) AS ch
        FROM t WHERE len(toks) > 0
      )
      SELECT doc_id, CAST(ch.idx AS BIGINT) AS chunk_idx,
             LEAST(CAST(32 AS BIGINT), n_tokens - ch.idx * 24) AS n_chunk_tokens,
             md5(ch.txt) AS chunk_fp
      FROM c
      ORDER BY doc_id, chunk_idx
    """)
  )

  /** Reason-coded quality filter (the C4/Gopher-style rule cascade):
    * every document gets a keep/drop verdict AND the comma-joined list
    * of every rule it failed — the auditability a curation pipeline
    * needs (per-rule drop rates, rule-overlap analysis, appeals), not
    * just a boolean. [[quality]] scores; this GATES. All four rules are
    * evaluated in INTEGER arithmetic (counts and cross-multiplied
    * ratios — `3·distinct < n` instead of `distinct/n < 1/3`), so the
    * oracle compare carries zero float hazard. `concat_ws` skips NULL
    * branches in both engines, making the reasons string a cheap
    * order-stable set encoding. Stateless per-row projection:
    * shuffle-free at any corpus size. */
  val qualityFilterReasons: Q = Q(
    "quality_filter_reasons",
    (s, dir) => {
      import s.implicits._
      val toks = TextFns.tokens($"text")
      val n = size(toks).cast("long")
      val nDist = size(array_distinct(toks)).cast("long")
      val reasons = concat_ws(",",
        when(n < 20, "too_short"),
        when(n > 2000, "too_long"),
        when(nDist * 3 < n, "low_diversity"),
        when(length($"text") - n + 1 > n * 8, "long_tokens"))
      docs(s, dir)
        .select($"doc_id", n.as("n_tokens"), reasons.as("reasons"))
        .withColumn("keep", $"reasons" === "")
        .orderBy($"doc_id")
    },
    Some("""
      WITH t AS (
        SELECT doc_id, text,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) n,
               CAST(len(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) nd
        FROM documents
      )
      SELECT doc_id, n AS n_tokens,
             concat_ws(',',
               CASE WHEN n < 20 THEN 'too_short' END,
               CASE WHEN n > 2000 THEN 'too_long' END,
               CASE WHEN nd * 3 < n THEN 'low_diversity' END,
               CASE WHEN LENGTH(text) - n + 1 > n * 8 THEN 'long_tokens' END) AS reasons,
             concat_ws(',',
               CASE WHEN n < 20 THEN 'too_short' END,
               CASE WHEN n > 2000 THEN 'too_long' END,
               CASE WHEN nd * 3 < n THEN 'low_diversity' END,
               CASE WHEN LENGTH(text) - n + 1 > n * 8 THEN 'long_tokens' END) = '' AS keep
      FROM t
      ORDER BY doc_id
    """)
  )

  /** Inverted-index construction — capped posting lists (term → top-8
    * docs by tf, doc_id tie-break, for terms with df ≥ 4), emitted as
    * flat (term, df, pos, doc_id, tf) rows: the index-BUILD half of
    * lexical search ([[searchTopK]] is the query half). Capping
    * postings is what production indexes do (impact-ordered /
    * early-termination indexes keep the highest-impact postings first).
    *
    * Scale shape: (term, doc) tf is a hash aggregate with map-side
    * combine; df per term likewise (both key-shuffled once on term
    * after that). The top-8 cap is TWO-PHASE exactly like
    * `pack_sequences_sharded`: rank within (term, xxhash64(doc_id)%16)
    * first — so a stopword's postings (billions of rows for one term
    * at 100 TB) never land in ONE window partition — then rank the
    * ≤16·8 per-term survivors globally. Exact: any global-top-8 row has
    * <8 rows above it globally, hence <8 above it in its own shard.
    * The df join keeps both sides term-keyed aggregates (no broadcast
    * hint: vocabulary grows heaps-law with corpus size, same argument
    * as [[topTerms]]). */
  val invertedIndex: Q = Q(
    "text_inverted_index",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val tfd = docs(s, dir)
        .select($"doc_id", explode(TextFns.tokens($"text")).as("term"))
        .groupBy($"term", $"doc_id").agg(count(lit(1)).as("tf"))
      val dfreq = tfd.groupBy($"term").agg(count(lit(1)).as("df"))
      val w1 = Window.partitionBy($"term", pmod(xxhash64($"doc_id"), lit(16)))
        .orderBy($"tf".desc, $"doc_id")
      val w2 = Window.partitionBy($"term").orderBy($"tf".desc, $"doc_id")
      tfd
        .withColumn("rn1", row_number().over(w1)).filter($"rn1" <= 8)
        .withColumn("pos", row_number().over(w2)).filter($"pos" <= 8)
        .join(dfreq.filter($"df" >= 4), "term")
        .select($"term", $"df", $"pos", $"doc_id", $"tf")
        .orderBy($"term", $"pos")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
        FROM documents
      ),
      tfd AS (SELECT term, doc_id, COUNT(*) AS tf FROM toks GROUP BY term, doc_id),
      dfq AS (SELECT term, COUNT(*) AS df FROM tfd GROUP BY term),
      r AS (SELECT term, doc_id, tf,
              ROW_NUMBER() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS pos
            FROM tfd)
      SELECT r.term, df, pos, doc_id, tf
      FROM r JOIN dfq USING (term)
      WHERE pos <= 8 AND df >= 4
      ORDER BY term, pos
    """)
  )

  /** PII detect + redact over the document corpus — the privacy scrub
    * every training-data pipeline runs before a corpus ships: find
    * email addresses and phone-shaped tokens, count them per document,
    * and emit the redacted text with typed placeholders. The corpus is
    * synthetic words, so the PII is INJECTED deterministically first
    * (the `corpus_snapshot_diff` fixture-derivation pattern): docs in
    * md5 buckets {a,b} gain a doc_id-addressed email, buckets {b,c} a
    * doc_id-addressed 555-prefixed number (bucket b gets both), the
    * rest none — giving redact-hit, multi-hit, and no-op rows. The
    * detector then runs with NO knowledge of the injection rule: plain
    * email / 555-number regexes over the text, the same patterns on
    * both engines (kept to the Java-regex ∩ RE2 common subset; DuckDB
    * needs the explicit 'g' flag for replace-ALL to match Spark's
    * default).
    *
    * Scale shape: stateless per-row projection — regex scan + replace
    * fused into the scan stage, no shuffle at all until the final
    * presentation sort (production writes unsorted). Redacted text is
    * hash-verified whole, so the oracle pins byte-exact redaction, not
    * just counts. */
  val piiRedact: Q = Q(
    "text_pii_redact",
    (s, dir) => {
      import s.implicits._
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneRe = "555-[0-9]{4}"
      val h = substring(md5($"doc_id".cast("string")), 1, 1)
      val injected = docs(s, dir)
        .withColumn("txt", concat(
          coalesce($"text", lit("")),
          when(h.isin("a", "b"),
            concat(lit(" contact user"), $"doc_id", lit("@example.com")))
            .otherwise(lit("")),
          when(h.isin("b", "c"),
            concat(lit(" call 555-"), lpad(($"doc_id" % 10000).cast("string"), 4, "0")))
            .otherwise(lit(""))))
      injected
        .select($"doc_id",
          regexp_count($"txt", lit(emailRe)).cast("long").as("n_emails"),
          regexp_count($"txt", lit(phoneRe)).cast("long").as("n_phones"),
          regexp_replace(regexp_replace($"txt", emailRe, "[EMAIL]"),
            phoneRe, "[PHONE]").as("redacted"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH injected AS (
        SELECT doc_id,
               COALESCE(text, '')
                 || CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('a', 'b')
                         THEN ' contact user' || doc_id || '@example.com' ELSE '' END
                 || CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('b', 'c')
                         THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                         ELSE '' END AS txt
        FROM documents
      )
      SELECT doc_id,
             CAST(len(regexp_extract_all(txt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
             CAST(len(regexp_extract_all(txt, '555-[0-9]{4}')) AS BIGINT) AS n_phones,
             regexp_replace(regexp_replace(txt,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
               '555-[0-9]{4}', '[PHONE]', 'g') AS redacted
      FROM injected
      ORDER BY doc_id
    """)
  )

  /** Per-document KEYWORD extraction: each doc's top-3 TF-IDF terms —
    * the document-level feature [[topTerms]]'s corpus-level report
    * doesn't give you (tagging/routing/clustering features, dataset
    * cards, retrieval summaries). idf = ln((N+1)/(df+1)) is
    * micro-rounded ONCE PER TERM (the [[bm25]] / [[unigramLogprob]]
    * ln-parity discipline), then the doc-level score is exact integer
    * arithmetic tf·idf_micro — order-independent, fully oracled.
    *
    * Scale shape: tf agg (one term-keyed exchange with map-side
    * combine), df from the same exploded stream (distinct + agg — the
    * term df table is vocabulary-sized and BROADCAST back), and the
    * top-3-per-doc window partitioned by doc_id — the no-skew key (a
    * doc's term count is its length, and WindowGroupLimit prunes to
    * ≤3 rows per doc map-side before the exchange). */
  val keywordExtract: Q = Q(
    "text_keyword_extract",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val toks = docs(s, dir)
        .select($"doc_id", explode(TextFns.tokens($"text")).as("term"))
      val nDocs = docs(s, dir).agg(count(lit(1)).as("n_docs"))
      val dfreq = toks.distinct().groupBy($"term").agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(nDocs))
        .select($"term",
          round(log(($"n_docs" + 1.0) / ($"df" + 1.0)) * 1e6).cast("long").as("idf_micro"))
      val tf = toks.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val w = Window.partitionBy($"doc_id")
        .orderBy($"score_micro".desc, $"term")
      tf.join(broadcast(dfreq), "term")
        .withColumn("score_micro", $"tf" * $"idf_micro")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .select($"doc_id", $"rn", $"term", $"tf", $"score_micro")
        .orderBy($"doc_id", $"rn")
    },
    Some("""
      WITH t AS (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) term
        FROM documents
      ),
      nd AS (SELECT COUNT(*) AS n_docs FROM documents),
      idf AS (
        SELECT term,
               CAST(ROUND(ln((CAST(n_docs AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0)) * 1e6) AS BIGINT) AS idf_micro
        FROM (SELECT term, COUNT(*) AS df
              FROM (SELECT DISTINCT doc_id, term FROM t) GROUP BY term), nd
      ),
      tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
      sc AS (
        SELECT tf.doc_id, tf.term, tf.tf,
               CAST(tf.tf * idf.idf_micro AS BIGINT) AS score_micro
        FROM tf JOIN idf USING (term)
      ),
      r AS (
        SELECT doc_id, term, tf, score_micro,
               CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY score_micro DESC, term) AS INT) AS rn
        FROM sc
      )
      SELECT doc_id, rn, term, CAST(tf AS BIGINT) AS tf, score_micro
      FROM r WHERE rn <= 3
      ORDER BY doc_id, rn
    """)
  )

  /** VOCABULARY COVERAGE curve: what fraction of the corpus's token
    * mass the top-k most frequent terms cover, at k ∈ {10, 100, 1000} —
    * the tokenizer-sizing / OOV-budget diagnostic (how big must the
    * vocab be before coverage plateaus). Entirely integer arithmetic
    * (cumulative counts + ppm integer division), so the oracle is
    * exact.
    *
    * Scale shape: one term-keyed exchange with map-side combine builds
    * the frequency table; totals are a plain aggregate of it; the rank
    * window then runs over the top-max(k) PREFIX only — an exact
    * `TakeOrderedAndProject` (orderBy+limit) by (cnt desc, term), so
    * the windowed frame is O(k) rows regardless of vocabulary size
    * (the coverage points at k ∈ {10,100,1000} only ever need the
    * first 1000 ranks of the cumulative sum). */
  val vocabCoverage: Q = Q(
    "text_vocab_coverage",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val tf = docs(s, dir)
        .select(explode(TextFns.tokens($"text")).as("term"))
        .groupBy($"term").agg(count(lit(1)).as("cnt"))
      val w = Window.orderBy($"cnt".desc, $"term")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = tf.agg(sum($"cnt").as("total"), count(lit(1)).as("vocab"))
      tf.orderBy($"cnt".desc, $"term").limit(1000)
        .withColumn("rk", row_number().over(Window.orderBy($"cnt".desc, $"term")))
        .withColumn("cum", sum($"cnt").over(w))
        .filter($"rk".isin(10, 100, 1000))
        .crossJoin(broadcast(tot))
        .select($"rk".cast("long").as("k"), $"cum".as("covered_tokens"),
          $"total".as("total_tokens"), $"vocab".as("vocab_size"),
          expr("(cum * 1000000L) div total").cast("long").as("coverage_ppm"))
        .orderBy($"k")
    },
    Some("""
      WITH t AS (
        SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) term
        FROM documents
      ),
      tf AS (SELECT term, COUNT(*) cnt FROM t GROUP BY 1),
      tot AS (SELECT SUM(cnt) total, COUNT(*) vocab FROM tf),
      r AS (
        SELECT term, cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, term) rk,
               SUM(cnt) OVER (ORDER BY cnt DESC, term
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum
        FROM tf
      )
      SELECT CAST(rk AS BIGINT) AS k, CAST(cum AS BIGINT) AS covered_tokens,
             CAST(total AS BIGINT) AS total_tokens, CAST(vocab AS BIGINT) AS vocab_size,
             CAST(cum * 1000000 // total AS BIGINT) AS coverage_ppm
      FROM r, tot
      WHERE rk IN (10, 100, 1000)
      ORDER BY k
    """)
  )

  /** CORPUS DRIFT between snapshot versions: per-term Jensen-Shannon
    * divergence contributions of the v1→v2 unigram distributions (the
    * [[graft.operators.Pipeline]] snapshot-diff derivation) — the
    * "did this refresh change what the corpus is made of" monitor a
    * versioned training pipeline runs before promoting a snapshot;
    * the top drifted terms name WHAT moved, the total says how much.
    *
    * Parity: each term's closed-form JSD contribution
    * ½p·ln(2p/(p+q)) + ½q·ln(2q/(p+q)) is evaluated with an
    * IDENTICAL expression shape on both engines and nano-rounded ONCE
    * per term (the [[bm25]] discipline, at 1e9 for headroom); the
    * total is then an exact integer sum — order-independent.
    *
    * Scale shape: two term-frequency aggs (map-side combined, the
    * diff's derivation reads each snapshot once), one full-outer join
    * on the term key (vocabulary-sized, NOT corpus-sized), and a
    * TakeOrdered top-20 — nothing corpus-scale crosses the wire after
    * the tf aggs. */
  val jsdDrift: Q = Q(
    "text_jsd_drift",
    (s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      val bk = substring(md5($"doc_id".cast("string")), 1, 1)
      def tf(df: org.apache.spark.sql.DataFrame) = df
        .select(explode(TextFns.tokens($"text")).as("term"))
        .groupBy($"term").agg(count(lit(1)).as("c"))
      val v1tf = tf(d.filter(bk =!= "f").select($"text"))
      val v2tf = tf(d.filter(bk =!= "0")
        .select(when(bk.isin("1", "2"), concat($"text", lit(" rev2")))
          .otherwise($"text").as("text")))
      val joined = v1tf.withColumnRenamed("c", "c1")
        .join(v2tf.withColumnRenamed("c", "c2"), Seq("term"), "full_outer")
        .select($"term", coalesce($"c1", lit(0L)).as("c1"),
          coalesce($"c2", lit(0L)).as("c2"))
        .localCheckpoint()   // scanned by the totals AND the scoring pass
      val tot = joined.agg(sum($"c1").as("n1"), sum($"c2").as("n2"))
      val scored = joined.crossJoin(broadcast(tot))
        .withColumn("p", $"c1".cast("double") / $"n1".cast("double"))
        .withColumn("q", $"c2".cast("double") / $"n2".cast("double"))
        .withColumn("contrib_nano", round((
          when($"c1" > 0, $"p" * log(lit(2.0) * $"p" / ($"p" + $"q")) * 0.5).otherwise(0.0) +
          when($"c2" > 0, $"q" * log(lit(2.0) * $"q" / ($"p" + $"q")) * 0.5).otherwise(0.0)
        ) * 1e9).cast("long"))
        .localCheckpoint()   // scanned by the total AND the top-k
      val jsd = scored.agg(sum($"contrib_nano").as("jsd_total_nano"))
      scored.orderBy($"contrib_nano".desc, $"term").limit(20)
        .crossJoin(broadcast(jsd))
        .select($"term", $"c1", $"c2", $"contrib_nano", $"jsd_total_nano")
    },
    Some("""
      WITH d AS (
        SELECT doc_id, text, substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bk
        FROM documents
      ),
      t1 AS (
        SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) term
        FROM d WHERE bk <> 'f'
      ),
      t2 AS (
        SELECT unnest(list_filter(string_split(
                 CASE WHEN bk IN ('1', '2') THEN text || ' rev2' ELSE text END,
                 ' '), x -> x <> '')) term
        FROM d WHERE bk <> '0'
      ),
      f1 AS (SELECT term, COUNT(*) c1 FROM t1 GROUP BY 1),
      f2 AS (SELECT term, COUNT(*) c2 FROM t2 GROUP BY 1),
      j AS (
        SELECT COALESCE(f1.term, f2.term) term,
               COALESCE(c1, 0) c1, COALESCE(c2, 0) c2
        FROM f1 FULL OUTER JOIN f2 ON f1.term = f2.term
      ),
      tot AS (SELECT SUM(c1) n1, SUM(c2) n2 FROM j),
      sc AS (
        SELECT term, c1, c2,
               CAST(ROUND((
                 CASE WHEN c1 > 0
                   THEN (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                        * ln(2.0 * (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                             / ((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                                + (CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE)))) * 0.5
                   ELSE 0.0 END +
                 CASE WHEN c2 > 0
                   THEN (CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                        * ln(2.0 * (CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                             / ((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                                + (CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE)))) * 0.5
                   ELSE 0.0 END
               ) * 1e9) AS BIGINT) AS contrib_nano
        FROM j, tot
      ),
      total AS (SELECT SUM(contrib_nano) jsd_total_nano FROM sc)
      SELECT term, CAST(c1 AS BIGINT) AS c1, CAST(c2 AS BIGINT) AS c2,
             contrib_nano, CAST(jsd_total_nano AS BIGINT) AS jsd_total_nano
      FROM (SELECT * FROM sc ORDER BY contrib_nano DESC, term LIMIT 20), total
      ORDER BY contrib_nano DESC, term
    """)
  )

  /** BPE VOCABULARY INDUCTION, first merge round: the tokenizer-training
    * kernel. Every lowercase word is a character sequence; the pair
    * table counts each ADJACENT CHARACTER PAIR weighted by word
    * frequency, and the top of that table (count desc, pair asc for a
    * total order) is exactly the first entry class of a byte-pair-
    * encoding merge list. Later rounds re-run the same pair count over
    * the re-segmented vocab, so this one round IS the iterated kernel.
    *
    * Scale shape: the pair count deliberately runs over the WORD-
    * FREQUENCY TABLE, not the corpus — the real BPE trick. One shuffle
    * collapses the corpus to vocabulary-sized (word, n) rows (map-side
    * combined), the pair explosion then touches |vocab| × avg_len rows
    * regardless of corpus size, and the second agg's key space is
    * ≤ alphabet² — tiny. Top-20 is orderBy+limit, which Catalyst plans
    * as TakeOrderedAndProject (per-partition heaps, no global sort);
    * the rank window runs over the 20 collected survivors only. */
  val bpeMerges: Q = Q(
    "text_bpe_merges",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val vocab = docs(s, dir)
        .select(explode(TextFns.tokens(lower($"text"))).as("w"))
        .groupBy($"w").agg(count(lit(1)).as("n"))
      vocab
        .where(length($"w") >= 2)
        .select($"n", explode(transform(sequence(lit(1), length($"w") - 1),
          i => $"w".substr(i, lit(2)))).as("pair"))
        .groupBy($"pair").agg(sum($"n").as("n_pairs"))
        .orderBy($"n_pairs".desc, $"pair").limit(20)
        .withColumn("rank",
          row_number().over(Window.orderBy($"n_pairs".desc, $"pair")))
        .select($"rank", $"pair", $"n_pairs")
    },
    Some("""
      WITH toks AS (
        SELECT unnest(list_filter(string_split(LOWER(text), ' '), x -> x <> '')) AS w
        FROM documents
      ),
      vocab AS (SELECT w, COUNT(*) AS n FROM toks GROUP BY w),
      pairs AS (
        SELECT substr(w, CAST(i AS INT), 2) AS pair, n
        FROM (SELECT w, n, unnest(range(1, length(w))) AS i
              FROM vocab WHERE length(w) >= 2)
      ),
      agg AS (SELECT pair, CAST(SUM(n) AS BIGINT) AS n_pairs FROM pairs GROUP BY pair),
      top AS (SELECT pair, n_pairs FROM agg ORDER BY n_pairs DESC, pair LIMIT 20)
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_pairs DESC, pair) AS INT) AS rank,
             pair, n_pairs
      FROM top
      ORDER BY rank
    """)
  )

  /** LANGID EVALUATION MATRIX: the labeled `lang` column scored against
    * [[langId]]'s n-gram-heuristic prediction as a full confusion
    * matrix — per (labeled, predicted) cell the count, the label's
    * row total, the exact integer fraction (×10⁶, floor), and the
    * diagonal flag. This is the "how wrong is my cheap classifier,
    * and in which direction" diagnostic a curation pipeline consults
    * before trusting a language gate to route 100 TB.
    *
    * Built BY COMPOSITION on the langid projection (same expression
    * tree, same oracle SQL inlined as a CTE), so the two can never
    * drift. Scale shape: the stateless per-row classifier feeds two
    * tiny aggregations (≤ langs² cells), the row-total joined back by
    * broadcast; integer arithmetic end to end. */
  val langidConfusion: Q = Q(
    "text_langid_confusion",
    (s, dir) => {
      import s.implicits._
      val base = langId.run(s, dir).select($"labeled_lang", $"predicted")
      val tot = base.groupBy($"labeled_lang").agg(count(lit(1)).as("n_label"))
      base.groupBy($"labeled_lang", $"predicted").agg(count(lit(1)).as("n"))
        .join(broadcast(tot), "labeled_lang")
        .select($"labeled_lang", $"predicted", $"n", $"n_label",
          expr("(n * 1000000) div n_label").as("frac_micro"),
          ($"labeled_lang" === $"predicted").as("correct"))
        .orderBy($"labeled_lang", $"predicted")
    },
    langId.oracle.map(inner => s"""
      WITH base AS ($inner),
      tot AS (SELECT labeled_lang, COUNT(*) AS n_label FROM base GROUP BY 1),
      cell AS (SELECT labeled_lang, predicted, COUNT(*) AS n FROM base GROUP BY 1, 2)
      SELECT c.labeled_lang, c.predicted,
             CAST(c.n AS BIGINT) AS n, CAST(t.n_label AS BIGINT) AS n_label,
             CAST((c.n * 1000000) // t.n_label AS BIGINT) AS frac_micro,
             c.labeled_lang = c.predicted AS correct
      FROM cell c JOIN tot t USING (labeled_lang)
      ORDER BY labeled_lang, predicted
    """)
  )

  /** TABLE STATISTICS PROFILE — the ANALYZE/COMPUTE STATISTICS pass a
    * cost-based optimizer (and any data-quality monitor) runs before
    * planning against a 100 TB table: per column the row count, null
    * count, exact NDV, and min/max rendered as strings (the contents
    * of a catalog stats entry). Exact NDV keeps the op fully oracled;
    * the production path swaps in one-pass HLL sketches (the
    * [[Advanced]] `hll_distinct` machinery — one sketch row per
    * column per partition, no distinct shuffle) once exactness stops
    * mattering, which for planner stats is immediately.
    *
    * Scale shape: ONE scan — the five exact distinct aggregates share
    * it through Catalyst's Expand (×6 row streams, each map-side
    * partial-aggregated on its own key before the single exchange);
    * min/max/counts ride the same pass. The wide 1-row aggregate then
    * unpivots via `stack` into the 5-row catalog frame — driver-side
    * volume, nothing more. */
  val statsProfile: Q = {
    val profiled = Seq("doc_id", "lang", "n_chars", "source", "text")
    Q(
      "corpus_stats_profile",
      (s, dir) => {
        import s.implicits._
        val d = docs(s, dir)
        val aggs = Seq(count(lit(1)).as("n_rows")) ++ profiled.flatMap { c =>
          Seq((count(lit(1)) - count(col(c))).as(s"nn_$c"),
            countDistinct(col(c)).as(s"ndv_$c"),
            min(col(c)).cast("string").as(s"min_$c"),
            max(col(c)).cast("string").as(s"max_$c"))
        }
        val wide = d.agg(aggs.head, aggs.tail: _*)
        val stacked = "stack(5, " +
          profiled.map(c => s"'$c', nn_$c, ndv_$c, min_$c, max_$c").mkString(", ") +
          ") as (column_name, n_nulls, ndv, min_repr, max_repr)"
        wide.select(expr(stacked), $"n_rows")
          .select($"column_name", $"n_rows", $"n_nulls", $"ndv",
            $"min_repr", $"max_repr")
          .orderBy($"column_name")
      },
      Some(profiled.map { c =>
        s"""SELECT '$c' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT $c) AS BIGINT) AS ndv,
               CAST(MIN($c) AS VARCHAR) AS min_repr,
               CAST(MAX($c) AS VARCHAR) AS max_repr
           FROM documents"""
      }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name"))
    )
  }

  /** PMI COLLOCATIONS: the top-20 bigrams by pointwise mutual
    * information — ln(p(w1w2) / (p(w1)p(w2))) — with support ≥ 5, the
    * classic collocation extractor (Church & Hanks) a corpus pipeline
    * runs to find multi-word units worth protecting from tokenization
    * splits. Parity is the [[jsdDrift]] discipline: ONE ln over an
    * identically-shaped ratio of exact integer counts, nano-rounded
    * once; ties break on the bigram string, so top-20 is hash-exact.
    *
    * Scale shape: the bigram and unigram frequency tables are each one
    * partial-aggregated exchange (the [[bigrams]] kernel feeds the
    * first); scoring joins the BIGRAM-VOCAB-sized frame to the unigram
    * table twice on the word key — vocabulary-sized frames throughout
    * (Heaps-sublinear in the corpus), never document-sized; top-20 is
    * a TakeOrdered, not a global sort. */
  val pmiCollocations: Q = Q(
    "text_pmi_collocations",
    (s, dir) => {
      import s.implicits._
      val toks = kernelSpread(s, docs(s, dir), defaultPinned = false)
        .select($"text").as[String]
      val bg = toks.mapPartitions(_.flatMap(bigramsOf)).toDF("bigram")
        .groupBy($"bigram").agg(count(lit(1)).as("c_ab"))
        .filter($"c_ab" >= 5)
      val uni = docs(s, dir)
        .select(explode(TextFns.tokens($"text")).as("term"))
        .groupBy($"term").agg(count(lit(1)).as("c"))
        .localCheckpoint()   // joined twice + totalled
      val nt = uni.agg(sum($"c").as("nt"))
      val nb = docs(s, dir)
        .select((size(TextFns.tokens($"text")) - 1).as("k"))
        .filter($"k" >= 1).agg(sum($"k").as("nb"))
      bg
        .withColumn("w1", split($"bigram", " ").getItem(0))
        .withColumn("w2", split($"bigram", " ").getItem(1))
        .join(uni.select($"term".as("w1"), $"c".as("c_a")), "w1")
        .join(uni.select($"term".as("w2"), $"c".as("c_b")), "w2")
        .crossJoin(broadcast(nt)).crossJoin(broadcast(nb))
        .withColumn("pmi_nano", round(log(
          ($"c_ab".cast("double") / $"nb".cast("double")) /
            (($"c_a".cast("double") / $"nt".cast("double")) *
              ($"c_b".cast("double") / $"nt".cast("double")))) * 1e9).cast("long"))
        .select($"bigram", $"c_ab", $"c_a", $"c_b", $"pmi_nano")
        .orderBy($"pmi_nano".desc, $"bigram")
        .limit(20)
    },
    Some("""
      WITH t AS (
        SELECT list_filter(string_split(text, ' '), x -> x <> '') toks FROM documents
      ),
      bgx AS (
        SELECT unnest(list_transform(range(len(toks)-1),
               i -> array_to_string(toks[i+1:i+2], ' '))) AS bigram
        FROM t WHERE len(toks) >= 2
      ),
      bg AS (SELECT bigram, COUNT(*) c_ab FROM bgx GROUP BY 1 HAVING COUNT(*) >= 5),
      uni AS (SELECT unnest(toks) term FROM t),
      u AS (SELECT term, COUNT(*) c FROM uni GROUP BY 1),
      nt AS (SELECT SUM(c) nt FROM u),
      nb AS (SELECT SUM(len(toks) - 1) nb FROM t WHERE len(toks) >= 2),
      sc AS (
        SELECT bg.bigram, bg.c_ab, ua.c c_a, ub.c c_b,
               CAST(ROUND(ln(
                 (CAST(bg.c_ab AS DOUBLE) / CAST(nb AS DOUBLE)) /
                   ((CAST(ua.c AS DOUBLE) / CAST(nt AS DOUBLE)) *
                    (CAST(ub.c AS DOUBLE) / CAST(nt AS DOUBLE)))) * 1e9) AS BIGINT)
                 AS pmi_nano
        FROM bg
        JOIN u ua ON ua.term = string_split(bg.bigram, ' ')[1]
        JOIN u ub ON ub.term = string_split(bg.bigram, ' ')[2]
        CROSS JOIN nt CROSS JOIN nb
      )
      SELECT bigram, CAST(c_ab AS BIGINT) c_ab, CAST(c_a AS BIGINT) c_a,
             CAST(c_b AS BIGINT) c_b, pmi_nano
      FROM sc ORDER BY pmi_nano DESC, bigram LIMIT 20
    """)
  )

  /** ZIPF-LAW FIT over the rank-frequency head: least-squares slope
    * and intercept of ln(cnt) on ln(rank) for the top-1000 terms —
    * the "is this corpus natural-language-shaped" diagnostic (natural
    * text fits slope ≈ −1; template/boilerplate-heavy corpora flatten
    * it). Parity is a two-stage discipline: each ln is nano-rounded
    * ONCE per term with the identical expression shape (bm25/jsd),
    * then every regression moment (Σx, Σy, Σxy, Σx²) is an EXACT
    * integer sum in decimal(38,0)/HUGEINT — order-independent — and
    * the single closing division runs over identically-rounded
    * doubles (the [[graft.operators.Quality]] z-test treatment), so
    * the one-row result is hash-exact.
    *
    * Scale shape: the frequency table is one partial-aggregated
    * exchange; the fit runs on a top-1000 `TakeOrderedAndProject`
    * prefix ([[vocabCoverage]]'s discipline) — O(k) regression work
    * regardless of vocabulary size. */
  val zipfFit: Q = Q(
    "text_zipf_fit",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val dec = "decimal(38,0)"
      val tf = docs(s, dir)
        .select(explode(TextFns.tokens($"text")).as("term"))
        .groupBy($"term").agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"term").limit(1000)
        .withColumn("rk", row_number().over(Window.orderBy($"cnt".desc, $"term")))
        .select(
          expr(s"CAST(CAST(ROUND(1e9 * ln(CAST(rk AS DOUBLE))) AS BIGINT) AS $dec)").as("x"),
          expr(s"CAST(CAST(ROUND(1e9 * ln(CAST(cnt AS DOUBLE))) AS BIGINT) AS $dec)").as("y"))
      tf.agg(
          count(lit(1)).cast(dec).as("n"),
          sum($"x").as("sx"), sum($"y").as("sy"),
          sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"))
        .select($"n".cast("long").as("n_terms"),
          expr("""CAST(ROUND(1e6 *
                   (CAST(n * sxy - sx * sy AS DOUBLE) /
                    CAST(n * sxx - sx * sx AS DOUBLE))) AS BIGINT)""").as("slope_micro"),
          expr("""CAST(ROUND(
                   CAST(sy * sxx - sx * sxy AS DOUBLE) /
                   CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)""").as("intercept_nano"))
    },
    Some("""
      WITH t AS (
        SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) term
        FROM documents
      ),
      tf AS (SELECT term, COUNT(*) cnt FROM t GROUP BY 1
             ORDER BY cnt DESC, term LIMIT 1000),
      r AS (
        SELECT CAST(CAST(ROUND(1e9 * ln(CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS DOUBLE))) AS BIGINT) AS HUGEINT) x,
               CAST(CAST(ROUND(1e9 * ln(CAST(cnt AS DOUBLE))) AS BIGINT) AS HUGEINT) y
        FROM tf
      ),
      m AS (
        SELECT CAST(COUNT(*) AS HUGEINT) n, SUM(x) sx, SUM(y) sy,
               SUM(x * y) sxy, SUM(x * x) sxx
        FROM r
      )
      SELECT CAST(n AS BIGINT) n_terms,
             CAST(ROUND(1e6 *
               (CAST(n * sxy - sx * sy AS DOUBLE) /
                CAST(n * sxx - sx * sx AS DOUBLE))) AS BIGINT) slope_micro,
             CAST(ROUND(
               CAST(sy * sxx - sx * sxy AS DOUBLE) /
               CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT) intercept_nano
      FROM m
    """)
  )

  def queries: Seq[Q] =
    Seq(tokenCount, quality, qualityClassifier, langId, fingerprintQ, topTerms,
      bm25, searchTopK, bigrams, repetition, docChunks, qualityFilterReasons,
      unigramLogprob, invertedIndex, piiRedact, keywordExtract, vocabCoverage,
      jsdDrift, bpeMerges, langidConfusion, statsProfile, pmiCollocations,
      zipfFit)
}
