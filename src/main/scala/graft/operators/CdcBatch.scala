package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Parity._

/** Batch analogs of the reference's CDC operator surface, expressed over
  * the `events` table (the oplog-shaped stream analog: event_id→`h`,
  * event_type→`op`, props→`o`; see FIXTURES.md §B).
  *
  * Reference operators covered (SURVEY.md §2.1): the static pushdown
  * filter O3 (`MongoOplogTailMapper.java:90-94`), the resume-offset range
  * predicate O4 (`:96-98`), arrival-order sort O5 (`:77`), lookup+limit
  * O6 (`:84-85`), quorum dedup O7 (`MongoDBOplogSource.java:116-128`),
  * per-host offset upsert O8 (`:130-139`), union fan-in O9 (`:58,81-89`)
  * and the `{"data": doc}` sink projection O12
  * (`ElasticsearchEmbeddedNodeSink.java:60-63`).
  *
  * The genuinely-streaming renditions (stateful quorum, checkpointing,
  * fan-out) live in [[graft.streaming]]; these relational forms are what
  * the DuckDB oracle can gate.
  */
object CdcBatch {

  private def ev(s: SparkSession, dir: String) = Tables.load(s, dir, "events")

  /** O3: static predicate filter evaluated at the scan (PushedFilters).
    * The reference pushes `ns != ..., op != 'n', fromMigrate not exists`
    * into mongod; here the analog predicate reaches the parquet reader. */
  val filterPushdown: Q = Q(
    "cdc_filter_pushdown",
    (s, dir) => {
      import s.implicits._
      ev(s, dir)
        .filter($"event_type" =!= "error" && $"props".isNotNull && $"value" > 100.0)
        .select($"event_id", $"user_id", $"event_type", $"value")
        .orderBy($"event_id")
    },
    Some("""
      SELECT event_id, user_id, event_type, value
      FROM events
      WHERE event_type <> 'error' AND props IS NOT NULL AND value > 100.0
      ORDER BY event_id
    """)
  )

  /** O4: resume from an offset — a range predicate on the monotone
    * event-time column, exactly the `ts > lastSeen` the reference builds
    * per host. Epoch-micros output keeps timestamp comparison exact. */
  val resumeRange: Q = Q(
    "cdc_resume_range",
    (s, dir) => {
      import s.implicits._
      ev(s, dir)
        .filter($"ts" > lit(java.sql.Timestamp.valueOf("2024-01-03 00:00:00")))
        .select($"event_id", unix_micros($"ts").as("ts_us"), $"event_type")
        .orderBy($"event_id")
    },
    Some("""
      SELECT event_id, epoch_us(ts) AS ts_us, event_type
      FROM events
      WHERE epoch_us(ts) > 1704240000000000
      ORDER BY event_id
    """)
  )

  /** O5+O6: arrival-order ($natural ≈ event-time) sort with a LIMIT —
    * Spark plans this as TakeOrderedAndProject (a top-k, never a full
    * global sort). */
  val sortLimit: Q = Q(
    "cdc_sort_limit",
    (s, dir) => {
      import s.implicits._
      ev(s, dir)
        .select($"event_id", unix_micros($"ts").as("ts_us"), $"user_id")
        .orderBy($"ts_us", $"event_id")
        .limit(100)
    },
    Some("""
      SELECT event_id, epoch_us(ts) AS ts_us, user_id
      FROM events
      ORDER BY ts_us, event_id
      LIMIT 100
    """)
  )

  /** O7 batch analog of the replica-quorum dedup: key ops by a
    * simulated op-hash `h`, emit each key's first-arriving record once
    * it has been observed >= depth(3) times. The streaming form (state,
    * watermark reaping) is [[graft.streaming.QuorumDedup]]. */
  val quorumBatch: Q = Q(
    "cdc_quorum_batch",
    (s, dir) => {
      import s.implicits._
      val depth = 3
      val keyed = ev(s, dir).withColumn("h", $"event_id" % 256)
      val w = Window.partitionBy($"h")
      val order = Window.partitionBy($"h").orderBy($"ts", $"event_id")
      keyed
        .withColumn("seen", count(lit(1)).over(w))
        .withColumn("rn", row_number().over(order))
        .filter($"seen" >= depth && $"rn" === 1)
        .select($"h", $"event_id", $"user_id", $"event_type", $"seen")
        .orderBy($"h")
    },
    Some("""
      SELECT h, event_id, user_id, event_type, seen
      FROM (
        SELECT event_id % 256 AS h, event_id, user_id, event_type,
               COUNT(*) OVER (PARTITION BY event_id % 256) AS seen,
               ROW_NUMBER() OVER (PARTITION BY event_id % 256 ORDER BY epoch_us(ts), event_id) AS rn
        FROM events
      )
      WHERE seen >= 3 AND rn = 1
      ORDER BY h
    """)
  )

  /** O8: per-host progress = MAX(ts) per key — the relational form of
    * the reference's per-record `replaceOne(upsert)` offset writes
    * (we keep only the final value per host, as a checkpoint would). */
  val offsets: Q = Q(
    "cdc_offsets",
    (s, dir) => {
      import s.implicits._
      ev(s, dir)
        .groupBy($"user_id")
        .agg(max(unix_micros($"ts")).as("last_ts_us"), count(lit(1)).as("n_ops"))
        .orderBy($"user_id")
    },
    Some("""
      SELECT user_id, MAX(epoch_us(ts)) AS last_ts_us, COUNT(*) AS n_ops
      FROM events
      GROUP BY user_id
      ORDER BY user_id
    """)
  )

  /** O9: union fan-in of N per-replica streams into one — two disjoint
    * substreams re-unioned and aggregated. */
  val unionFanIn: Q = Q(
    "cdc_union_fanin",
    (s, dir) => {
      import s.implicits._
      val e = ev(s, dir)
      val a = e.filter($"user_id" % 2 === 0)
      val b = e.filter($"user_id" % 2 === 1)
      a.union(b)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), dsum(decP($"value")).as("total_value"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS total_value
      FROM (
        SELECT * FROM events WHERE user_id % 2 = 0
        UNION ALL
        SELECT * FROM events WHERE user_id % 2 = 1
      )
      GROUP BY event_type
      ORDER BY event_type
    """)
  )

  /** O12: the sink projection — wrap each record as `{"data": <doc>}`
    * like the Elasticsearch sink does. JSON built from exactly-typed
    * fields so both engines serialize identically. */
  val esProjection: Q = Q(
    "cdc_es_projection",
    (s, dir) => {
      import s.implicits._
      ev(s, dir)
        .filter($"event_type" === "purchase")
        .select(
          $"event_id",
          concat(
            lit("{\"data\":{\"event_id\":"), $"event_id",
            lit(",\"user_id\":"), $"user_id",
            lit(",\"event_type\":\""), $"event_type",
            lit("\"}}")
          ).as("data")
        )
        .orderBy($"event_id")
    },
    Some("""
      SELECT event_id,
             '{"data":{"event_id":' || event_id || ',"user_id":' || user_id ||
             ',"event_type":"' || event_type || '"}}' AS data
      FROM events
      WHERE event_type = 'purchase'
      ORDER BY event_id
    """)
  )

  /** Subject-id tokenization column. With a secret key supplied via
    * `graft.pseudonymize.hmacKey` (Spark conf) or `GRAFT_PSEUDONYMIZE_KEY`
    * (env), emits a true HMAC-SHA256 token — built from codegen'd
    * builtins only (sha2/concat/unhex with the ipad/opad-XORed key as
    * driver-side literal constants, RFC 2104), so the hot path stays
    * inside whole-stage codegen with no UDF. Without a key it falls
    * back to the keyless DEMO token (md5 over a public salt) that the
    * DuckDB oracle reproduces — enumerable over a small id space,
    * clearly NOT production pseudonymity. CdcBatchSpec pins the HMAC
    * path bit-for-bit against javax.crypto.Mac. */
  def subjectToken(s: SparkSession, uid: Column): Column = {
    val key = s.conf.getOption("graft.pseudonymize.hmacKey")
      .orElse(sys.env.get("GRAFT_PSEUDONYMIZE_KEY"))
    key match {
      case Some(k) =>
        val raw = k.getBytes("UTF-8")
        val block =
          if (raw.length > 64)
            java.security.MessageDigest.getInstance("SHA-256").digest(raw)
          else raw
        val padded = java.util.Arrays.copyOf(block, 64)
        val ipad = padded.map(b => (b ^ 0x36).toByte)
        val opad = padded.map(b => (b ^ 0x5c).toByte)
        sha2(concat(lit(opad),
          unhex(sha2(concat(lit(ipad), encode(uid.cast("string"), "UTF-8")), 256))), 256)
      case None =>
        md5(concat(lit("tenant-salt:"), uid.cast("string")))
    }
  }

  /** Privacy-preserving sink projection — pseudonymization in the
    * replication path (the GDPR-shaped requirement of any CDC-to-search
    * pipeline; the reference forwards subject identifiers verbatim).
    * The subject id becomes a stable keyed token via [[subjectToken]]
    * (same token per subject, so downstream joins and aggregations
    * still work on it), the payload keeps only the declared-safe field
    * (`props.k`), and the monetary value is generalized to a 100-unit
    * band. The oracled form runs keyless (DEMO token, reproducible in
    * DuckDB); supply `graft.pseudonymize.hmacKey` for the production
    * HMAC-SHA256 path. A pure per-row projection: stateless,
    * shuffle-free at any scale, and composes unchanged with the O12
    * sink wrap and the streaming pipeline. */
  val pseudonymize: Q = Q(
    "cdc_pseudonymize",
    (s, dir) => {
      import s.implicits._
      ev(s, dir)
        .filter($"event_type" === "purchase")
        .select(
          $"event_id",
          subjectToken(s, $"user_id").as("subject_key"),
          get_json_object($"props", "$.k").cast("long").as("k"),
          (floor($"value" / 100) * 100).cast("long").as("value_band"))
        .orderBy($"event_id")
    },
    Some("""
      SELECT event_id,
             md5('tenant-salt:' || CAST(user_id AS VARCHAR)) AS subject_key,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             CAST(FLOOR(value / 100) * 100 AS BIGINT) AS value_band
      FROM events
      WHERE event_type = 'purchase'
      ORDER BY event_id
    """)
  )

  /** SCD2 (slowly-changing-dimension type 2) history: each per-subject
    * change event becomes a versioned row with a [valid_from, valid_to)
    * validity interval — valid_to is the next change's timestamp, NULL
    * while current — the standard warehouse materialization of a CDC
    * stream (the reference only ever forwards the latest doc; this
    * keeps the full history queryable "as of" any time). Timestamps
    * compare as epoch micros (the fixture's parity convention). One
    * window shuffle keyed on the subject — the same key the stream is
    * already partitioned by, so in the streaming pipeline this costs no
    * extra exchange. */
  val scd2: Q = Q(
    "cdc_scd2",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      ev(s, dir)
        .select($"event_id", $"user_id", $"event_type",
          unix_micros($"ts").as("ts_us"))
        .withColumn("valid_from_us", $"ts_us")
        .withColumn("valid_to_us", lead($"ts_us", 1).over(w))
        .withColumn("is_current", $"valid_to_us".isNull)
        .select($"event_id", $"user_id", $"event_type",
          $"valid_from_us", $"valid_to_us", $"is_current")
        .orderBy($"event_id")
    },
    Some("""
      SELECT event_id, user_id, event_type,
             epoch_us(ts) AS valid_from_us,
             LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id) AS valid_to_us,
             LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id) IS NULL AS is_current
      FROM events
      ORDER BY event_id
    """)
  )

  /** Payload scrubbing in the replication path: every digit run in the
    * CDC payload is collapsed to '#' before the document reaches the
    * search sink, and the redaction count rides along for audit — the
    * "no raw numeric identifiers leave the replication boundary" rule.
    * Complements [[pseudonymize]] (which tokenizes the KEYED subject
    * id; this scrubs the free-form payload BODY). Stateless per-row
    * regexp projection — shuffle-free at any scale, and the pattern
    * ([0-9]+) sits in the regex subset Java and RE2 interpret
    * identically, so the oracle is exact. */
  val payloadRedact: Q = Q(
    "cdc_payload_redact",
    (s, dir) => {
      import s.implicits._
      ev(s, dir)
        .select($"event_id",
          regexp_replace($"props", "[0-9]+", "#").as("props_redacted"),
          size(expr("regexp_extract_all(props, '[0-9]+', 0)")).cast("long")
            .as("n_redacted"))
        .orderBy($"event_id")
    },
    Some("""
      SELECT event_id,
             regexp_replace(props, '[0-9]+', '#', 'g') AS props_redacted,
             CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_redacted
      FROM events
      ORDER BY event_id
    """)
  )

  /** SCHEMA DISCOVERY over DYNAMIC documents — the data-model property
    * that defines the reference (SURVEY §1.1: an unbounded stream of
    * schemaless BSON documents). A CDC consumer cannot declare the
    * payload schema up front; it must DISCOVER the key population, per
    * collection, including drift as producers add fields. This op
    * profiles exactly that: per (event_type, top-level key) the
    * document count, the type's total, and the exact presence fraction
    * (×10⁶, floor) — the report that drives schema-evolution alerts
    * and reader-schema unioning.
    *
    * The payload frame is a content-addressed heterogeneity view over
    * the (homogeneous) fixture `props`: by event_id mod 3 a document
    * keeps `{"k"}`, gains a `"tag"` field, or gains a nested `"meta"`
    * object — both engines derive the SAME augmented JSON by string
    * surgery, so discovery is fully oracled without a new fixture.
    *
    * Scale shape: one stateless pass builds and key-explodes the
    * payloads (`json_object_keys`, codegen'd — a few rows per doc);
    * the profile agg's key space is ≤ types × live keys, totals reduce
    * to ≤|types| rows broadcast back. Schema drift at 100 TB is a
    * partial-agg-combined counting problem, never a scan of declared
    * schemas. */
  /** the content-addressed payload-heterogeneity view (FIXTURES.md §C):
    * by event_id mod 3 the props JSON keeps `{"k"}`, gains a `"tag"`,
    * or gains a nested `"meta"`. Works on batch AND streaming frames —
    * [[graft.streaming.SchemaDriftStream]] rides the same column. */
  private[graft] def withHeterogeneousPayload(
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.withColumn("p",
      when(col("event_id") % 3 === 1,
        concat(expr("substring(props, 1, length(props) - 1)"),
          lit(", \"tag\": \"t"), pmod(col("user_id"), lit(4)).cast("string"), lit("\"}")))
        .when(col("event_id") % 3 === 2,
          concat(expr("substring(props, 1, length(props) - 1)"),
            lit(", \"meta\": {\"src\": \"cdc\"}}")))
        .otherwise(col("props")))

  val payloadSchema: Q = Q(
    "cdc_payload_schema",
    (s, dir) => {
      import s.implicits._
      val withP = withHeterogeneousPayload(
        ev(s, dir).select($"event_id", $"event_type", $"user_id", $"props"))
      val tot = withP.groupBy($"event_type").agg(count(lit(1)).as("n_events"))
      withP.select($"event_type", explode(expr("json_object_keys(p)")).as("key"))
        .groupBy($"event_type", $"key").agg(count(lit(1)).as("n"))
        .join(broadcast(tot), "event_type")
        .select($"event_type", $"key", $"n", $"n_events",
          expr("(n * 1000000) div n_events").as("presence_micro"))
        .orderBy($"event_type", $"key")
    },
    Some("""
      WITH p AS (
        SELECT event_type,
               CASE
                 WHEN event_id % 3 = 1 THEN substring(props, 1, length(props) - 1)
                   || ', "tag": "t' || CAST(user_id % 4 AS VARCHAR) || '"}'
                 WHEN event_id % 3 = 2 THEN substring(props, 1, length(props) - 1)
                   || ', "meta": {"src": "cdc"}}'
                 ELSE props
               END AS p
        FROM events
      ),
      k AS (SELECT event_type, unnest(json_keys(p)) AS key FROM p),
      t AS (SELECT event_type, COUNT(*) AS n_events FROM p GROUP BY 1)
      SELECT k.event_type, k.key, CAST(COUNT(*) AS BIGINT) AS n,
             t.n_events, CAST((COUNT(*) * 1000000) // t.n_events AS BIGINT) AS presence_micro
      FROM k JOIN (SELECT event_type, CAST(n_events AS BIGINT) AS n_events FROM t) t
        USING (event_type)
      GROUP BY k.event_type, k.key, t.n_events
      ORDER BY event_type, key
    """)
  )

  /** REPLICA LAG REPORT: per simulated replica member (host =
    * `r(event_id mod 3)`, the fan-in modeling), how far its newest
    * seen op trails the set's newest — plus the QUORUM FRONTIER flag
    * on the laggiest member, the one actually holding a
    * depth-majority quorum back. The reference tails N members
    * (MongoOplogTailMapper.java:75-78) with zero observability into
    * which cursor is behind; this is the ops readout its quorum gate
    * needs, as one oracled query. All integer µs arithmetic.
    *
    * Scale shape: one partial-aggregated exchange on the member key
    * (member count is replica-set-sized — tiny), global max broadcast
    * back; nothing op-log-sized moves after the scan. */
  val lagReport: Q = Q(
    "cdc_lag",
    (s, dir) => {
      import s.implicits._
      val perHost = ev(s, dir)
        .select(concat(lit("r"), $"event_id" % 3).as("host"),
          unix_micros($"ts").as("us"))
        .groupBy($"host")
        .agg(count(lit(1)).as("n_ops"), max($"us").as("last_ts_us"))
      val frontier = perHost.agg(
        max($"last_ts_us").as("newest"), min($"last_ts_us").as("frontier"))
      perHost.crossJoin(broadcast(frontier))
        .select($"host", $"n_ops", $"last_ts_us",
          ($"newest" - $"last_ts_us").as("lag_us"),
          ($"last_ts_us" === $"frontier").as("is_quorum_frontier"))
        .orderBy($"host")
    },
    Some("""
      WITH h AS (
        SELECT 'r' || CAST(event_id % 3 AS VARCHAR) host,
               COUNT(*) n_ops, MAX(epoch_us(ts)) last_ts_us
        FROM events GROUP BY 1
      ),
      f AS (SELECT MAX(last_ts_us) newest, MIN(last_ts_us) frontier FROM h)
      SELECT host, CAST(n_ops AS BIGINT) n_ops, CAST(last_ts_us AS BIGINT) last_ts_us,
             CAST(newest - last_ts_us AS BIGINT) lag_us,
             last_ts_us = frontier AS is_quorum_frontier
      FROM h, f
      ORDER BY host
    """)
  )

  /** VECTOR PAYLOAD ROUND-TRIP — the serve-from-chain carriage
    * discipline ([[graft.streaming.PipelineE2E]] `serveFromChain`:
    * embedding rides the oplog JSON payload through ingest → apply →
    * curation) as one ORACLED batch query. Each document's embedding
    * is serialized into an oplog-shaped JSON payload (`to_json`) and
    * parsed back (`from_json`), and the per-lang report — doc count,
    * micro-summed first dimension, micro-summed squared norm — is
    * computed FROM THE PARSED VECTORS, while the oracle computes the
    * same report from the raw embeddings table: hash equality pins the
    * JSON round-trip bit-exact (one ULP of serialize/parse drift
    * flips a micro-rounded sum). Norms use the engine's sequential
    * `dot_product` fold; DuckDB's `list_reduce` mirror is the
    * established parity shape (vector_mmr_rerank's oracle). Micro-
    * rounding BEFORE the sum keeps the aggregate integer-exact and
    * order-independent, so the group-by parallelizes freely.
    *
    * Scale shape: one stateless serialize+parse projection (codegen'd
    * JSON expressions, no UDFs) + one partial-aggregated exchange on
    * the lang key — payload carriage costs a map pass, never a
    * shuffle of its own. Ref: the reference ships whole BSON documents
    * through its pipeline the same way (MongoDBOplogSource.java:82
    * `document.toJson()`). */
  val payloadEmbedding: Q = Q(
    "cdc_payload_embedding",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.graftexpr.VectorFunctions.dot_product
      val docs = Tables.load(s, dir, "documents").select($"doc_id", $"lang")
      val vecs = Tables.load(s, dir, "embeddings")
        .select($"vec_id".as("doc_id"),
          expr("transform(embedding, x -> cast(x as double))").as("embedding"))
      val payload = docs.join(vecs, "doc_id")
        .select($"lang",
          to_json(struct($"doc_id".as("_id"), $"doc_id", $"lang", $"embedding"))
            .as("o"))
      val parsed = payload.select($"lang",
        from_json($"o", org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id LONG, embedding ARRAY<DOUBLE>"))
          .getField("embedding").as("pe"))
      parsed.groupBy($"lang").agg(
          count(lit(1)).as("n_docs"),
          sum(round(lit(1e6) * element_at($"pe", 1)).cast("long"))
            .as("sum_dim1_micro"),
          sum(round(lit(1e6) * dot_product($"pe", $"pe")).cast("long"))
            .as("sum_norm2_micro"))
        .select($"lang", $"n_docs",
          $"sum_dim1_micro", $"sum_norm2_micro")
        .orderBy($"lang")
    },
    Some("""
      WITH e AS (SELECT vec_id AS doc_id,
                        list_transform(embedding, x -> CAST(x AS DOUBLE)) v
                 FROM embeddings),
      j AS (SELECT d.lang, e.v FROM documents d JOIN e USING (doc_id))
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CAST(ROUND(1e6 * v[1]) AS BIGINT)) AS BIGINT) AS sum_dim1_micro,
             CAST(SUM(CAST(ROUND(1e6 *
               list_reduce(list_transform(list_zip(v, v), s -> s[1]*s[2]),
                           (a, b) -> a + b)) AS BIGINT)) AS BIGINT) AS sum_norm2_micro
      FROM j GROUP BY lang ORDER BY lang
    """)
  )

  def queries: Seq[Q] = Seq(
    filterPushdown, resumeRange, sortLimit, quorumBatch, offsets,
    unionFanIn, esProjection, pseudonymize, scd2, payloadRedact,
    payloadSchema, lagReport, payloadEmbedding
  )
}
