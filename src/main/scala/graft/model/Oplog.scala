package graft.model

import org.apache.spark.sql.types._

/** The CDC envelope — the reference's implicit oplog record schema made
  * explicit (SURVEY.md §1.2; field constants at
  * `reference:src/main/java/org/flinkmon/mongo/conn/MongoDBConstants.java:24-28`).
  *
  * BSON's `BsonTimestamp(seconds, inc)` is a logical clock: we keep the
  * seconds as an event-time `ts` plus the `inc` tiebreaker so the
  * per-replica total order survives. Payloads (`o`, `o2`) stay opaque
  * JSON strings — introspected on demand with `from_json`, never
  * schema-exploded.
  */
final case class OplogEntry(
    ts: java.sql.Timestamp,
    tsInc: Int,
    h: Long,
    op: String,
    ns: String,
    fromMigrate: Option[Boolean],
    o: String,
    o2: Option[String],
    sourceHost: String
)

object OplogEntry {
  /** java.sql.Timestamp → epoch micros (getTime carries millis; the
    * sub-milli part hides in getNanos). Shared by the connector's
    * pushed-filter evaluation and the apply-state clock. */
  def timestampMicros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  val schema: StructType = StructType(Seq(
    StructField("ts", TimestampType, nullable = false),
    StructField("tsInc", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("ns", StringType, nullable = false),
    StructField("fromMigrate", BooleanType, nullable = true),
    StructField("o", StringType, nullable = false),
    StructField("o2", StringType, nullable = true),
    StructField("sourceHost", StringType, nullable = false)
  ))
}
