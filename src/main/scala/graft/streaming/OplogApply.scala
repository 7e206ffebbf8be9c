package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import graft.model.OplogEntry

/** Fold a (quorum-deduped) oplog stream into CURRENT COLLECTION STATE —
  * the oplog-native form of [[graft.operators.CdcApply]] and the natural
  * consumer of the reference's pipeline: where the reference stops at
  * shipping raw ops to Elasticsearch
  * (`reference:src/main/java/org/flinkmon/sink/ElasticsearchEmbeddedNodeSink.java:54-66`),
  * this materializes what those ops MEAN.
  *
  * Semantics, per the oplog contract (SURVEY.md §1.2):
  *  - key = (ns, _id); `_id` lives in `o2` for updates and in `o` for
  *    inserts/deletes;
  *  - last-writer-wins under the BSON logical clock `(ts, tsInc)`;
  *  - op `d` leaves a TOMBSTONE carrying its clock (so an out-of-order
  *    older op cannot resurrect the doc); a genuinely newer insert
  *    resurrects it.
  *
  * Scale: one ~(key + latest doc) record per key in the state store,
  * partitioned by key across executors; LIVE-key cardinality — not
  * change volume — bounds memory. Tombstones are kept only until the
  * watermark passes their clock (EventTimeTimeout reaping, the
  * [[QuorumDedup]] pattern), so delete churn cannot grow state
  * unboundedly while stale resurrection stays fenced inside the
  * lateness horizon.
  */
object OplogApply {

  /** current state of one document. */
  final case class DocState(
      ns: String, docId: String, op: String, tsUs: Long, tsInc: Int, doc: String)

  @transient private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** `_id` of the doc an op addresses: `o2` for updates, else `o`
    * (`MongoDBConstants.java:24-28` field layout). Falls back to the
    * whole payload string when no `_id` field exists. */
  private[streaming] def docIdOf(e: OplogEntry): String = {
    val payload = if (e.op == "u") e.o2.getOrElse(e.o) else e.o
    try {
      val node = mapper.readTree(payload)
      if (node != null && node.hasNonNull("_id")) {
        val id = node.get("_id")
        // scalar _ids → their text; structured _ids (e.g. {"$oid": ...})
        // → their JSON — asText() alone returns "" for objects, which
        // would merge every structured-_id doc into one state key
        if (id.isValueNode) id.asText() else id.toString
      } else payload
    } catch { case _: Exception => payload }
  }

  private def micros(t: java.sql.Timestamp): Long = OplogEntry.timestampMicros(t)

  /** shallow materialization of an update payload over the prior doc:
    * a `{"$set": {...}}` operator merges its fields into the previous
    * document when both parse as objects; any other payload (full
    * replacement, exotic operators) replaces the doc wholesale. */
  private[streaming] def applyUpdate(prior: String, payload: String): String = {
    try {
      val p = mapper.readTree(payload)
      if (p != null && p.isObject && p.has("$set") && p.get("$set").isObject) {
        val base = if (prior.nonEmpty) mapper.readTree(prior) else null
        if (base != null && base.isObject) {
          base.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
            .setAll(p.get("$set").asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode])
          base.toString
        } else payload   // no prior doc to patch: keep the operator payload
      } else payload
    } catch { case _: Exception => payload }
  }

  /** pure LWW transition over the oplog clock — unit-testable.
    *  - A delete becomes a TOMBSTONE state (op "d") rather than
    *    clearing the slot: the tombstone keeps its clock so an
    *    out-of-order OLDER op arriving after the delete cannot
    *    resurrect the doc. Only a genuinely newer op wins.
    *  - An update MATERIALIZES: `$set` fields merge into the prior
    *    live doc (patches must be applied in clock order for the merge
    *    to be meaningful — the group folds below sort by clock first;
    *    a patch older than the current state is dropped, LWW-style). */
  private[streaming] def lww(cur: Option[DocState], e: OplogEntry, id: String): Option[DocState] = {
    val ts = micros(e.ts)
    val newer = cur.forall(s => ts > s.tsUs || (ts == s.tsUs && e.tsInc > s.tsInc))
    if (!newer) cur
    else if (e.op == "d") Some(DocState(e.ns, id, "d", ts, e.tsInc, ""))
    else if (e.op == "u") {
      val prior = cur.filter(_.op != "d").map(_.doc).getOrElse("")
      Some(DocState(e.ns, id, "u", ts, e.tsInc, applyUpdate(prior, e.o)))
    } else Some(DocState(e.ns, id, e.op, ts, e.tsInc, e.o))
  }

  /** clock-sort a batch's ops for one key before folding, so `$set`
    * chains compose deterministically regardless of arrival order. */
  private def foldSorted(cur0: Option[DocState], it: Iterator[OplogEntry], id: String): Option[DocState] = {
    var cur = cur0
    it.toSeq.sortBy(e => (micros(e.ts), e.tsInc)).foreach(e => cur = lww(cur, e, id))
    cur
  }

  /** Streaming form (Append output: the state-CHANGE log — one row per
    * changed key per batch, the latest row per key IS the current
    * state). A tombstoned key emits its tombstone (op "d") — filter
    * those for the live view; the tombstone blocks stale resurrection
    * until the watermark passes its clock, then its state is reaped. */
  def currentState(ds: Dataset[OplogEntry], lateness: String = "10 seconds")(
      implicit spark: SparkSession): Dataset[DocState] = {
    import spark.implicits._
    // flatMapGroupsWithState in APPEND mode (not mapGroupsWithState /
    // Update): Spark only allows chaining stateful operators when all
    // of them — and the query — are in append mode, and this operator
    // must run AFTER the quorum dedup's stateful operator in one query.
    // EventTimeTimeout reaps TOMBSTONES once the watermark passes their
    // clock (live docs never time out — they ARE the materialized
    // state), so deleted-key state is bounded by the lateness horizon,
    // not by every key ever seen. Requires a watermark upstream.
    // the watermark is re-declared here: an upstream stateful operator's
    // output columns are fresh attributes without the original watermark
    // tag, and EventTimeTimeout requires one on ITS input
    ds.withWatermark("ts", lateness)
      .groupByKey(e => (e.ns, docIdOf(e)))
      .flatMapGroupsWithState[DocState, DocState](
        org.apache.spark.sql.streaming.OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (String, String), it: Iterator[OplogEntry], state: GroupState[DocState]) =>
          if (state.hasTimedOut) {      // watermark passed a tombstone: reap
            state.remove()
            Iterator.empty
          } else {
            val cur = foldSorted(state.getOption, it, key._2)
            val s = cur.get             // at least one event seen for the key
            state.update(s)
            if (s.op == "d") {
              state.setTimeoutTimestamp(
                math.max(s.tsUs / 1000L + 1, state.getCurrentWatermarkMs() + 1))
            }
            Iterator.single(s)
          }
      }
  }

  /** Batch form over a bounded oplog slice (same LWW semantics; deleted
    * docs are absent from the result). */
  def currentStateBatch(ds: Dataset[OplogEntry])(implicit spark: SparkSession): Dataset[DocState] = {
    import spark.implicits._
    ds.groupByKey(e => (e.ns, docIdOf(e)))
      .flatMapGroups { (key: (String, String), it: Iterator[OplogEntry]) =>
        foldSorted(None, it, key._2).filter(_.op != "d").iterator
      }
  }
}
