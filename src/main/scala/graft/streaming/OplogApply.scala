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
  * partitioned by key across executors; key cardinality — not change
  * volume — bounds memory. Tombstones are kept to fence stale
  * resurrection and should be reaped with a watermark timeout once the
  * out-of-order horizon passes (the [[QuorumDedup]] reaping pattern).
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

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  /** pure LWW transition over the oplog clock — unit-testable.
    * A delete becomes a TOMBSTONE state (op "d") rather than clearing
    * the slot: the tombstone keeps its clock so an out-of-order OLDER
    * op arriving after the delete cannot resurrect the doc. Only an op
    * genuinely newer than the tombstone wins. */
  private[streaming] def lww(cur: Option[DocState], e: OplogEntry, id: String): Option[DocState] = {
    val ts = micros(e.ts)
    val newer = cur.forall(s => ts > s.tsUs || (ts == s.tsUs && e.tsInc > s.tsInc))
    if (!newer) cur
    else if (e.op == "d") Some(DocState(e.ns, id, "d", ts, e.tsInc, ""))
    else Some(DocState(e.ns, id, e.op, ts, e.tsInc, e.o))
  }

  /** Streaming form (Append output: the state-CHANGE log — one row per
    * changed key per batch, the latest row per key IS the current
    * state);
    * a tombstoned key emits its tombstone (op "d") — filter those for
    * the live view. Tombstones stay in the state store so late older
    * ops cannot resurrect; pair with a watermark-based timeout to reap
    * them once the out-of-order horizon passes (the same pattern
    * [[QuorumDedup]] uses for its keys). */
  def currentState(ds: Dataset[OplogEntry])(implicit spark: SparkSession): Dataset[DocState] = {
    import spark.implicits._
    // flatMapGroupsWithState in APPEND mode (not mapGroupsWithState /
    // Update): Spark only allows chaining stateful operators when all
    // of them — and the query — are in append mode, and this operator
    // must run AFTER the quorum dedup's stateful operator in one query.
    ds.groupByKey(e => (e.ns, docIdOf(e)))
      .flatMapGroupsWithState[DocState, DocState](
        org.apache.spark.sql.streaming.OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (String, String), it: Iterator[OplogEntry], state: GroupState[DocState]) =>
          var cur = state.getOption
          it.foreach(e => cur = lww(cur, e, key._2))
          cur match {
            case Some(s) => state.update(s); Iterator.single(s)
            case None => Iterator.empty
          }
      }
  }

  /** Batch form over a bounded oplog slice (same LWW semantics; deleted
    * docs are absent from the result). */
  def currentStateBatch(ds: Dataset[OplogEntry])(implicit spark: SparkSession): Dataset[DocState] = {
    import spark.implicits._
    ds.groupByKey(e => (e.ns, docIdOf(e)))
      .flatMapGroups { (key: (String, String), it: Iterator[OplogEntry]) =>
        var cur: Option[DocState] = None
        it.foreach(e => cur = lww(cur, e, key._2))
        cur.filter(_.op != "d").iterator
      }
  }
}
