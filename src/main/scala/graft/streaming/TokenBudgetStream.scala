package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.TextFns

/** One arriving document after the stateless rank projection and the
  * broadcast cut/histogram joins, ready for stateful admission.
  * `limit` is the inclusive in-group token budget: unbounded for
  * groups wholly above the cut, the boundary group's residual at the
  * cut. */
case class BudgetRow(doc_id: Long, lang: String, n_tokens: Long,
                     rank_key: Long, before: Long, limit: Long)

/** Admitted-manifest row — same shape as `corpus_token_budget`'s
  * batch output. */
case class BudgetAdmit(doc_id: Long, lang: String, n_tokens: Long,
                       rank_key: Long, cum_tokens: Long)

/** [[BudgetRow]] with the embedding and LWW version carried through
  * ([[TokenBudgetStream.admitCarry]]). */
case class BudgetRowE(doc_id: Long, lang: String, n_tokens: Long,
                      rank_key: Long, before: Long, limit: Long,
                      embedding: Array[Double], ver: Long)

/** [[BudgetAdmit]] carrying the embedding and LWW version — the row
  * the indexed admitted manifest is built from (the serve dedups
  * multi-admitted docs by `ver`). */
case class BudgetAdmitE(doc_id: Long, lang: String, n_tokens: Long,
                        rank_key: Long, cum_tokens: Long,
                        embedding: Array[Double], ver: Long)

/** STREAMING token-budget admission — the ingest-side form of
  * `corpus_token_budget_2phase` (Pipeline.scala `tokenBudget2Phase`),
  * completing the streaming-curation composition with the final
  * corpus-sizing gate: documents are admitted or rejected AS THEY
  * ARRIVE against a per-(lang, rank_key) histogram computed once, in
  * batch, from the previous corpus snapshot and broadcast as the
  * static side.
  *
  * Stage semantics vs the batch operator:
  *   - rank projection: identical (stateless; the same scaled-integer
  *     lexical-diversity `rank_key` — `Pipeline.budgetBase`).
  *   - below-cut rejection: stateless — a broadcast join against the
  *     one-row-per-lang cut table filters groups that can never fit,
  *     so stateful admission only ever sees above-cut and boundary
  *     rows (the same pruning phase 3 of the batch form applies).
  *   - admission: `flatMapGroupsWithState` keyed by (lang, rank_key),
  *     state = ONE Long (inclusive in-group token cumsum, counting
  *     admitted AND rejected arrivals — the batch rule is a prefix
  *     cumsum over ALL group rows, not a best-fit knapsack, and
  *     matching it exactly requires advancing past oversize rows).
  *     A row is admitted iff its inclusive cumsum stays within the
  *     group limit; `cum_tokens` = histogram exclusive prefix + the
  *     in-group cumsum, so emitted positions are bit-identical to the
  *     batch output. Arrivals are ranked by doc_id WITHIN each
  *     micro-batch (the same in-group order as batch); across
  *     micro-batches admission is greedy, equal to batch whenever
  *     arrival order respects doc_id order per group (the spec's
  *     fixture), which is inherent to any streaming budget gate — the
  *     batch pick needs the whole corpus.
  *
  * Scale shape: the histogram/cut static side is ≤10⁶ rows per lang
  * regardless of corpus size (bounded scaled-integer key space) —
  * always broadcastable; the only shuffle on the arriving stream is
  * the one keyed exchange into the stateful operator, and state is a
  * single Long per (lang, rank_key) group actually seen, bounded by
  * the histogram key space, not the stream length. Saturated groups
  * (cumsum past limit) could be evicted with a processing-time
  * timeout at production scale; admission then degrades to the
  * stateless below-cut rejection for them. */
object TokenBudgetStream {

  /** `src`: a streaming (or batch) `documents`-shaped frame.
    * `hist` / `cuts`: the static side from
    * `Pipeline.budgetHistCuts(Pipeline.budgetBase(...), budget)`,
    * computed in batch from the corpus snapshot. */
  def admit(src: DataFrame, hist: DataFrame, cuts: DataFrame): Dataset[BudgetAdmit] = {
    val spark = src.sparkSession
    import spark.implicits._
    val toks = TextFns.tokens(col("text"))
    val ranked = src
      .select(col("doc_id"), col("lang"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"))
      .filter(col("n_tokens") > 0)
      .withColumn("rank_key", expr("(n_distinct * 1000000L) div n_tokens"))
    val gated = ranked
      .join(broadcast(cuts), Seq("lang"))
      .filter(col("rank_key") >= col("cut_key"))
      .join(broadcast(hist.select(col("lang"), col("rank_key"), col("before"))),
        Seq("lang", "rank_key"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("rank_key"),
        col("before"),
        when(col("rank_key") > col("cut_key"), lit(Long.MaxValue))
          .otherwise(col("residual")).as("limit"))
      .as[BudgetRow]
    gated.groupByKey(r => (r.lang, r.rank_key))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        admitGroup _)
  }

  private def admitGroup(key: (String, Long), rows: Iterator[BudgetRow],
      state: GroupState[Long]): Iterator[BudgetAdmit] = {
    var cum = state.getOption.getOrElse(0L)
    val out = Seq.newBuilder[BudgetAdmit]
    rows.toSeq.sortBy(_.doc_id).foreach { r =>
      cum += r.n_tokens
      if (cum <= r.limit)
        out += BudgetAdmit(r.doc_id, r.lang, r.n_tokens, r.rank_key, r.before + cum)
    }
    state.update(cum)
    out.result().iterator
  }

  /** [[admit]] with the document's EMBEDDING carried through the
    * admission kernel — the projection that lets the chain write its
    * admitted manifest AS the serve index
    * ([[graft.streaming.PipelineE2E]] `serveIndexedAdmit`: a stateless
    * cell-assignment map follows this operator inside the SAME
    * streaming query, so every admitted row lands cell-keyed with its
    * vector and norm, and the serve scans nprobe/C of the manifest
    * with no store re-read and no per-epoch rebuild). Pure carried
    * payload: the embedding never enters the rank projection, the cut
    * join, or the cumsum state — admission verdicts and positions are
    * column-for-column identical to [[admit]]'s. */
  def admitCarry(src: DataFrame, hist: DataFrame,
      cuts: DataFrame): Dataset[BudgetAdmitE] = {
    val spark = src.sparkSession
    import spark.implicits._
    val toks = TextFns.tokens(col("text"))
    val ranked = src
      .select(col("doc_id"), col("lang"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        col("embedding"), col("ver"))
      .filter(col("n_tokens") > 0)
      .withColumn("rank_key", expr("(n_distinct * 1000000L) div n_tokens"))
    val gated = ranked
      .join(broadcast(cuts), Seq("lang"))
      .filter(col("rank_key") >= col("cut_key"))
      .join(broadcast(hist.select(col("lang"), col("rank_key"), col("before"))),
        Seq("lang", "rank_key"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("rank_key"),
        col("before"),
        when(col("rank_key") > col("cut_key"), lit(Long.MaxValue))
          .otherwise(col("residual")).as("limit"),
        col("embedding"), col("ver"))
      .as[BudgetRowE]
    gated.groupByKey(r => (r.lang, r.rank_key))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        admitGroupE _)
  }

  private def admitGroupE(key: (String, Long), rows: Iterator[BudgetRowE],
      state: GroupState[Long]): Iterator[BudgetAdmitE] = {
    var cum = state.getOption.getOrElse(0L)
    val out = Seq.newBuilder[BudgetAdmitE]
    rows.toSeq.sortBy(_.doc_id).foreach { r =>
      cum += r.n_tokens
      if (cum <= r.limit)
        out += BudgetAdmitE(r.doc_id, r.lang, r.n_tokens, r.rank_key,
          r.before + cum, r.embedding, r.ver)
    }
    state.update(cum)
    out.result().iterator
  }

  /** UPDATE-AWARE admission — the dedup-at-curation variant
    * (`corpus_budget_update_lww`'s live form): an updated document
    * consumes the token budget exactly ONCE, at its newest version,
    * via a REFUND-OR-RESTORE ledger. [[admit]]'s segment-model
    * accounting charges every surviving curated version (correct for
    * the append-only manifest contract, where compaction reconciles);
    * here the charge moves WITH the update:
    *
    *  - first version of a doc: exactly [[admit]]'s greedy rule — the
    *    group cumsum advances (admitted or not) and the row is
    *    admitted iff the inclusive cumsum fits the group limit, so a
    *    no-update drained run admits the identical set.
    *  - an update of an ADMITTED doc: the old charge is refunded from
    *    its group's cumsum, then the new version is charged in ITS
    *    group (updates can move groups — n_tokens and rank both
    *    change with text). If the new version fits, the new charge
    *    commits and the row is emitted (downstream reads LWW by
    *    `ver`); if it does NOT fit, the refund is ROLLED BACK and
    *    nothing is emitted — the old admitted version stays in force
    *    and keeps its charge, so charged tokens always equal the sum
    *    of the newest ADMITTED versions (conservation is exact;
    *    "refund then reject" would leave a served version unpaid).
    *  - a stale replay (ver ≤ the charged ver) is a no-op.
    *  - DIVERGENCE, stated plainly: an update whose newest version
    *    falls below its lang cut (rank_key < cut_key) or tokenizes to
    *    zero is dropped by the STATELESS pre-filters and never reaches
    *    the ledger — the old version stays charged and keeps serving.
    *    The batch twin (`corpus_budget_update_lww`) collapses LWW
    *    FIRST and excludes such a doc entirely. The live form's
    *    behavior is the conservative one under its own invariant:
    *    every SERVED version is a PAID version (the manifest is
    *    append-only and the serve's newest-wins dedup would keep
    *    serving the old admitted row regardless — a refund-only
    *    release here would serve an unpaid row). Reconciliation is
    *    compaction's job, exactly like the segment model's
    *    duplicate-version window: the next full seal collapses by
    *    `ver` over what admission actually emitted. DEMONSTRATED, not
    *    just documented (round 17): PipelineE2EChainServeSpec
    *    "below-cut update: live keeps the old charge, the compaction
    *    seal releases it" drives the full-LWW chain through exactly
    *    this timeline and runs the seal — the stale charge is
    *    released, conservation holds per lang, and the freed tokens
    *    admit a previously-rejected lang-mate.
    *
    * State is keyed by LANG (a refund must cross rank_key groups):
    * per-group cumsums (histogram-bounded) plus a per-admitted-doc
    * charge ledger — corpus-linear, the same class as the apply
    * stage's LWW registers (the chain's documented resident-state
    * ledger; RocksDB is the store dial at scale). The lang keying
    * makes one exchange partition per language: for a mono-lingual
    * 100 TB corpus the documented relaxation is salting by rank_key
    * with per-salt budget shares — the same skew treatment as the
    * batch form's sharded window. */
  def admitLww(src: DataFrame, hist: DataFrame,
      cuts: DataFrame): Dataset[BudgetAdmitE] = {
    val spark = src.sparkSession
    import spark.implicits._
    val toks = TextFns.tokens(col("text"))
    val ranked = src
      .select(col("doc_id"), col("lang"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        col("embedding"), col("ver"))
      .filter(col("n_tokens") > 0)
      .withColumn("rank_key", expr("(n_distinct * 1000000L) div n_tokens"))
    val gated = ranked
      .join(broadcast(cuts), Seq("lang"))
      .filter(col("rank_key") >= col("cut_key"))
      .join(broadcast(hist.select(col("lang"), col("rank_key"), col("before"))),
        Seq("lang", "rank_key"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("rank_key"),
        col("before"),
        when(col("rank_key") > col("cut_key"), lit(Long.MaxValue))
          .otherwise(col("residual")).as("limit"),
        col("embedding"), col("ver"))
      .as[BudgetRowE]
    gated.groupByKey(_.lang)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        admitGroupLww _)
  }

  /** one admitted charge: the group it was charged in, the tokens
    * paid, and the charged version. */
  case class BudgetCharge(rank_key: Long, n_tokens: Long, ver: Long)

  /** [[admitLww]] per-lang state: per-rank_key inclusive cumsums and
    * the admitted-doc charge ledger. */
  case class BudgetLwwState(cums: Map[Long, Long],
                            charges: Map[Long, BudgetCharge])

  // private[streaming]: BudgetLwwPropertySpec drives the kernel
  // directly through TestGroupState across generated batch sequences
  private[streaming] def admitGroupLww(lang: String, rows: Iterator[BudgetRowE],
      state: GroupState[BudgetLwwState]): Iterator[BudgetAdmitE] = {
    var st = state.getOption.getOrElse(BudgetLwwState(Map.empty, Map.empty))
    val out = Seq.newBuilder[BudgetAdmitE]
    // older versions first, then doc order — the per-group doc order
    // [[admitGroupE]] uses, extended across versions
    rows.toSeq.sortBy(r => (r.ver, r.doc_id)).foreach { r =>
      st.charges.get(r.doc_id) match {
        case Some(prev) if r.ver <= prev.ver => () // stale replay
        case Some(prev) =>
          // refund the old charge, try the new version in ITS group
          val refunded = st.cums.updated(prev.rank_key,
            st.cums(prev.rank_key) - prev.n_tokens)
          val cum = refunded.getOrElse(r.rank_key, 0L) + r.n_tokens
          if (cum <= r.limit) {
            st = BudgetLwwState(refunded.updated(r.rank_key, cum),
              st.charges.updated(r.doc_id,
                BudgetCharge(r.rank_key, r.n_tokens, r.ver)))
            out += BudgetAdmitE(r.doc_id, r.lang, r.n_tokens, r.rank_key,
              r.before + cum, r.embedding, r.ver)
          } // else: restore (st unchanged) — the old version stays paid
        case None =>
          val cum = st.cums.getOrElse(r.rank_key, 0L) + r.n_tokens
          val admitted = cum <= r.limit
          st = BudgetLwwState(st.cums.updated(r.rank_key, cum),
            if (admitted)
              st.charges.updated(r.doc_id,
                BudgetCharge(r.rank_key, r.n_tokens, r.ver))
            else st.charges)
          if (admitted)
            out += BudgetAdmitE(r.doc_id, r.lang, r.n_tokens, r.rank_key,
              r.before + cum, r.embedding, r.ver)
      }
    }
    state.update(st)
    out.result().iterator
  }
}
