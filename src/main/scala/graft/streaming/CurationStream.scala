package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.TextFns

/** One row of the curation stream after the stateless projection +
  * quality gate (mirror of `curation_e2e`'s `base` frame). */
case class CurationDoc(doc_id: Long, source: String, lang: String,
                       n_tokens: Long, fp: String, mh: String)

/** Final curated-manifest row — same shape as `curation_e2e`'s output. */
case class CurationOut(doc_id: Long, source: String, lang: String,
                       n_tokens: Long, split: String)

/** [[CurationDoc]] with the text carried through — the live-chain
  * projection ([[CurationStream.curateWithText]]). */
case class CurationDocT(doc_id: Long, source: String, lang: String,
                        n_tokens: Long, fp: String, mh: String, text: String)

/** Curated-manifest row CARRYING text — what the live composed chain
  * hands straight to budget admission (no store re-probe). */
case class CurationFull(doc_id: Long, source: String, lang: String,
                        n_tokens: Long, split: String, text: String)

/** [[CurationDocT]] additionally carrying the document's embedding and
  * LWW version — the serve-from-chain projection
  * ([[CurationStream.curateWithEmbedding]]). */
case class CurationDocE(doc_id: Long, source: String, lang: String,
                        n_tokens: Long, fp: String, mh: String,
                        text: String, embedding: Array[Double], ver: Long)

/** Curated-manifest row carrying text, embedding AND the LWW version —
  * what makes the chain's own vectors servable NEWEST-FIRST
  * ([[MmrServeStream.serveChainRefreshed]] dedups by `ver`). */
case class CurationFullE(doc_id: Long, source: String, lang: String,
                         n_tokens: Long, split: String, text: String,
                         embedding: Array[Double], ver: Long)

/** The composed STREAMING curation pass: quality gate → watermarked
  * exact content dedup → per-source stateful cap → split assignment,
  * all inside ONE streaming query — the ingest-side form of the batch
  * flagship `curation_e2e` (`Pipeline.scala` `curationE2e`), chaining
  * two stateful operators the way the CDC pipeline chains
  * filter → quorum-dedup → apply.
  *
  * Stage semantics vs the batch operator:
  *   - gate: identical (stateless, `n_tokens >= 20`).
  *   - dedup: `dropDuplicatesWithinWatermark("fp")` — keeps the FIRST
  *     arrival per content fingerprint; equals batch min-doc_id dedup
  *     whenever arrival order is doc_id order (the spec's fixture).
  *     State is bounded by the watermark delay, not corpus size — the
  *     100 TB knob; the event-time column is synthesized
  *     deterministically from doc_id so replays are stable.
  *   - cap: `flatMapGroupsWithState` keyed by source, state = one Long
  *     (rows admitted so far). Content-addressed (mh, doc_id) rank
  *     WITHIN each micro-batch — the same rank key as the batch
  *     operator — greedy across micro-batches. Caps enforce the same
  *     per-source cardinality as batch (`min(cap, survivors)`); which
  *     members survive depends on arrival batching, which is inherent
  *     to any streaming cap (the batch pick needs the full corpus).
  *   - split: identical (stateless, content-addressed md5 thresholds).
  *
  * Scale shape: the gate runs before both stateful stages so state
  * only sees surviving rows; dedup state is watermark-bounded; cap
  * state is ONE Long per source. Each stage is one keyed exchange —
  * the same two shuffles the batch plan pays. */
object CurationStream {
  val QualityMinTokens = 20

  def curate(src: DataFrame, cap: Int = 10, delay: String = "1 hour"): Dataset[CurationOut] = {
    val spark = src.sparkSession
    import spark.implicits._
    val gated = src
      .select(col("doc_id"), col("source"), col("lang"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"),
        TextFns.fingerprint(col("text")).as("fp"),
        md5(col("doc_id").cast("string")).as("mh"),
        // day-one offset: a synthetic clock must not START at the epoch
        // origin — the initial watermark is also 0, and a row whose
        // event time equals the watermark is dropped as late (observed:
        // doc_id 0 silently vanishing from the dedup stage)
        timestamp_micros((col("doc_id") + 86400L) * 1000000L).as("ets"))
      .filter(col("n_tokens") >= QualityMinTokens)
      .withWatermark("ets", delay)
      .dropDuplicatesWithinWatermark("fp")
      .select(col("doc_id"), col("source"), col("lang"),
        col("n_tokens"), col("fp"), col("mh"))
      .as[CurationDoc]
    gated.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        capGroup(cap) _)
  }

  private def capGroup(cap: Int)(source: String, rows: Iterator[CurationDoc],
      state: GroupState[Long]): Iterator[CurationOut] = {
    val used = state.getOption.getOrElse(0L)
    val room = math.max(cap - used, 0L).toInt
    val picked = rows.toSeq.sortBy(d => (d.mh, d.doc_id)).take(room)
    state.update(used + picked.length)
    picked.iterator.map { d =>
      CurationOut(d.doc_id, d.source, d.lang, d.n_tokens, splitOf(d.mh))
    }
  }

  private def splitOf(mh: String): String = {
    val h2 = mh.substring(0, 2)
    if (h2 < "cd") "train" else if (h2 < "e6") "val" else "test"
  }

  /** [[curate]] with the TEXT carried through the manifest — the LIVE
    * composed chain's form ([[PipelineE2E]]): downstream budget
    * admission re-ranks from text, and in a fully-live chain the
    * document store is still being written while the manifest flows,
    * so a store re-probe (the sequential chain's stream-static join)
    * would race its own upstream. Carrying text is the standard
    * hot-path bandwidth trade: pay manifest width, skip a store read —
    * both shapes ship, a deployment picks per corpus. Same stages,
    * same state, same semantics as [[curate]]. */
  def curateWithText(src: DataFrame, cap: Int = 10,
      delay: String = "1 hour"): Dataset[CurationFull] = {
    val spark = src.sparkSession
    import spark.implicits._
    val gated = src
      .select(col("doc_id"), col("source"), col("lang"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"),
        TextFns.fingerprint(col("text")).as("fp"),
        md5(col("doc_id").cast("string")).as("mh"),
        col("text"),
        timestamp_micros((col("doc_id") + 86400L) * 1000000L).as("ets"))
      .filter(col("n_tokens") >= QualityMinTokens)
      .withWatermark("ets", delay)
      .dropDuplicatesWithinWatermark("fp")
      .select(col("doc_id"), col("source"), col("lang"),
        col("n_tokens"), col("fp"), col("mh"), col("text"))
      .as[CurationDocT]
    gated.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        capGroupT(cap) _)
  }

  private def capGroupT(cap: Int)(source: String, rows: Iterator[CurationDocT],
      state: GroupState[Long]): Iterator[CurationFull] = {
    val used = state.getOption.getOrElse(0L)
    val room = math.max(cap - used, 0L).toInt
    val picked = rows.toSeq.sortBy(d => (d.mh, d.doc_id)).take(room)
    state.update(used + picked.length)
    picked.iterator.map { d =>
      CurationFull(d.doc_id, d.source, d.lang, d.n_tokens, splitOf(d.mh), d.text)
    }
  }

  /** [[curateWithText]] additionally carrying the document's EMBEDDING
    * through the curated manifest — the schema extension that makes
    * the chain's OWN vectors servable end to end: with it, the serve
    * stage's candidate corpus is the chain-curated store
    * ([[MmrServeStream.serveChainRefreshed]] reads embeddings the
    * ingest payload delivered and the apply stage materialized),
    * instead of restricting a pre-existing fixture vector table. Same
    * stages, same state, same kernels as [[curate]]/[[curateWithText]]
    * — the embedding is pure carried payload: it never enters a fold
    * key, so verdicts and caps are identical column-for-column. The
    * width trade is [[curateWithText]]'s, one step further: a 64-dim
    * double vector adds ~512 B/row of manifest bandwidth; at 100 TB a
    * deployment stores vectors fixed-point-quantized or routes them
    * around the dedup stage (only doc_id/fp/mh enter state either
    * way — state size is unchanged by the carry). */
  def curateWithEmbedding(src: DataFrame, cap: Int = 10,
      delay: String = "1 hour"): Dataset[CurationFullE] = {
    val spark = src.sparkSession
    import spark.implicits._
    val gated = src
      .select(col("doc_id"), col("source"), col("lang"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"),
        TextFns.fingerprint(col("text")).as("fp"),
        md5(col("doc_id").cast("string")).as("mh"),
        col("text"), col("embedding"), col("ver"),
        timestamp_micros((col("doc_id") + 86400L) * 1000000L).as("ets"))
      .filter(col("n_tokens") >= QualityMinTokens)
      .withWatermark("ets", delay)
      .dropDuplicatesWithinWatermark("fp")
      .select(col("doc_id"), col("source"), col("lang"),
        col("n_tokens"), col("fp"), col("mh"), col("text"), col("embedding"),
        col("ver"))
      .as[CurationDocE]
    gated.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        capGroupE(cap) _)
  }

  private def capGroupE(cap: Int)(source: String, rows: Iterator[CurationDocE],
      state: GroupState[Long]): Iterator[CurationFullE] = {
    val used = state.getOption.getOrElse(0L)
    val room = math.max(cap - used, 0L).toInt
    val picked = rows.toSeq.sortBy(d => (d.mh, d.doc_id)).take(room)
    state.update(used + picked.length)
    picked.iterator.map { d =>
      CurationFullE(d.doc_id, d.source, d.lang, d.n_tokens, splitOf(d.mh),
        d.text, d.embedding, d.ver)
    }
  }
}
