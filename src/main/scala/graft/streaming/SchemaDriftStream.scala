package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One arriving payload, reduced to its key set. */
case class PayloadKeys(event_type: String, event_id: Long, keys: Seq[String])

/** A first-appearance alert: collection × key, stamped with the event
  * that introduced it. */
case class SchemaAlert(event_type: String, key: String, first_event_id: Long)

/** STREAMING SCHEMA-DRIFT MONITOR: the production form of
  * `cdc_payload_schema` — the reference tails SCHEMALESS documents
  * (SURVEY §1.1), so a producer can add a field at any moment and the
  * first sign downstream is a key nobody declared. This component
  * keeps, per collection (event_type), the set of payload keys seen so
  * far as `flatMapGroupsWithState` state and emits ONE alert per
  * (collection, key) the first time it appears — the "schema changed
  * under you" page, at ingest, exactly once per drift.
  *
  * Within a micro-batch events are processed in event_id order so the
  * stamped `first_event_id` is deterministic under any batching of an
  * id-ordered arrival stream (the spec proves batching invariance by
  * re-running with a different split).
  *
  * Scale shape: one keyed exchange into the stateful operator; state
  * is the live key SET per collection — tens of strings, bounded by
  * the real schema, not the traffic. Contrast with the profile
  * (`cdc_payload_schema`): the batch op measures presence fractions
  * over history, the stream answers "did anything NEW just appear"
  * with O(schema) state. */
object SchemaDriftStream {

  /** arriving heterogeneous payloads (column `p`, the
    * [[graft.operators.CdcBatch.withHeterogeneousPayload]] view) →
    * first-appearance alerts. */
  def alerts(src: DataFrame): Dataset[SchemaAlert] = {
    val spark = src.sparkSession
    import spark.implicits._
    src.select(col("event_type"), col("event_id"),
        expr("json_object_keys(p)").as("keys"))
      .as[PayloadKeys]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        update _)
  }

  private def update(collection: String, events: Iterator[PayloadKeys],
      state: GroupState[Set[String]]): Iterator[SchemaAlert] = {
    var seen = state.getOption.getOrElse(Set.empty[String])
    val out = Seq.newBuilder[SchemaAlert]
    events.toSeq.sortBy(_.event_id).foreach { e =>
      e.keys.foreach { k =>
        if (!seen.contains(k)) {
          seen += k
          out += SchemaAlert(collection, k, e.event_id)
        }
      }
    }
    state.update(seen)
    out.result().iterator
  }
}
