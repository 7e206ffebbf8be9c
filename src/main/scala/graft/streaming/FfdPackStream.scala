package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.TextFns

/** one arriving document, token-counted (zero-token docs are absent,
  * as in the batch layout — they carry no training content). */
case class FfdDoc(doc_id: Long, lang: String, n_tokens: Long)

/** one per-document bin assignment — the `pack_ffd_layout` row shape:
  * in-cap docs land whole in one bin (`bin_first == bin_last`, FFD
  * never severs what fits); oversized docs claim a dedicated
  * ceil(n/cap)-bin run. */
case class FfdAssign(doc_id: Long, lang: String, n_tokens: Long,
                     bin_first: Long, bin_last: Long)

/** STREAMING FIRST-FIT PACKING ADMISSION — the online twin of
  * `pack_ffd_layout` (operators/Pipeline.scala `packFfdLayout`):
  * documents are assigned to training bins AS THEY ARRIVE, each
  * in-cap doc whole into the lowest-indexed open bin with room (a
  * fresh bin otherwise), each oversized doc as a dedicated
  * ceil(n/cap)-bin run — so a dataloader can start consuming packed
  * bins while ingest is still running instead of waiting for a batch
  * repack of the whole corpus.
  *
  * State per language stream: the open bins' REMAINING CAPACITIES, in
  * bin-creation order — exactly the batch fold's accumulator, carried
  * in the state store across micro-batches (and restarts: the
  * checkpoint replays assignment mid-fold, the spec's kill/restart
  * case). The placement kernel is `Pipeline.ffdPlace`, shared with the
  * batch operator VERBATIM, so stream ≡ batch is structural: when
  * per-language arrival order equals the batch fold order (in-cap docs
  * by tokens desc then doc_id, oversized docs after), the emitted
  * assignment table is row-identical to `pack_ffd_layout`. Within one
  * micro-batch arrivals are folded in that same (in-cap first,
  * tokens desc, doc_id) order — first-fit-DECREASING per batch,
  * first-fit across batches — which both maximizes fill at each
  * trigger and makes the fold deterministic under any within-batch
  * delivery interleaving.
  *
  * Scale shape: one keyed exchange into the stateful operator, no
  * other shuffle; the fold is inherently serial PER STREAM (the batch
  * twin's documented property), so at 100 TB the key is the sharded
  * `pack_sequences_sharded` (lang, shard) key and each shard-stream
  * folds independently. State is the open-bin remainder list — bounded
  * by stream tokens/cap; a production deployment CLOSES bins past a
  * fill threshold (drops them from state — first-fit never revisits a
  * bin that cannot fit the smallest admissible doc), keeping state to
  * the sliver of genuinely open bins. */
object FfdPackStream {

  /** whole-stream state: remaining capacity per open bin, creation
    * order. Oversized runs ride along as zero-capacity entries so bin
    * indices stay dense and first-fit skips them for free. */
  case class FfdState(rem: Seq[Long])

  /** `src`: a streaming (or batch) `documents`-shaped frame with
    * (doc_id, lang, text). */
  def pack(src: DataFrame, cap: Long = 512L): Dataset[FfdAssign] = {
    val spark = src.sparkSession
    import spark.implicits._
    packCounted(
      src.select(col("doc_id"), col("lang"),
          size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"))
        .filter(col("n_tokens") > 0L)
        .as[FfdDoc],
      cap)
  }

  /** the stateful half over an already-counted stream — the composed
    * chain ([[PipelineE2E]]) feeds the ADMITTED manifest, which carries
    * `n_tokens`, so re-tokenizing (and re-reading text) would be waste. */
  def packCounted(docs: Dataset[FfdDoc], cap: Long = 512L): Dataset[FfdAssign] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_.lang)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        packGroup(cap) _)
  }

  private def packGroup(cap: Long)(lang: String, rows: Iterator[FfdDoc],
      state: GroupState[FfdState]): Iterator[FfdAssign] = {
    val rem = scala.collection.mutable.ArrayBuffer.from(
      state.getOption.map(_.rem).getOrElse(Seq.empty[Long]))
    val out = Seq.newBuilder[FfdAssign]
    // fold order within the trigger: in-cap first, tokens desc, doc_id
    // — the batch fold's order, so stream ≡ batch when arrivals respect
    // it across triggers too
    rows.toSeq.sortBy(d => (d.n_tokens > cap, -d.n_tokens, d.doc_id)).foreach { d =>
      if (d.n_tokens <= cap) {
        val b = graft.operators.Pipeline.ffdPlace(rem, d.n_tokens, cap)
        out += FfdAssign(d.doc_id, lang, d.n_tokens, b.toLong, b.toLong)
      } else {
        val runs = (d.n_tokens + cap - 1L) / cap
        val first = rem.length.toLong
        (1L to runs).foreach(_ => rem += 0L)
        out += FfdAssign(d.doc_id, lang, d.n_tokens, first, first + runs - 1L)
      }
    }
    state.update(FfdState(rem.toSeq))
    out.result().iterator
  }
}
