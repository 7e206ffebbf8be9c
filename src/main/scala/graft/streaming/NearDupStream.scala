package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** one per-(doc, band) admission row: `dup_of` carries the bucket's
  * claimant iff the arriving signature matched it at ≥ tau64 agreeing
  * hash positions; `sim64` is the agreement count against the matched
  * claimant (or the best non-matching claimant, for observability). */
case class NearDupBand(doc_id: Long, b: Int, dup_of: Option[Long], sim64: Int)

/** STREAMING NEAR-DUP ADMISSION — the live MinHash-LSH gate, the one
  * member of the dedup family (SURVEY §2.4) that had no streaming
  * form: arriving documents are sketched with the batch operator's
  * exact MinHash kernel (`Dedup.sketchText`, 64 hashes) and banded
  * with its exact band hash (16 bands × 4 rows,
  * `Dedup.minhashBandRows`'s xxhash64 shape), then each band row
  * rendezvouses with its (band, band-hash) BUCKET in the state store:
  * the first arrival CLAIMS the bucket (doc_id + full signature);
  * later arrivals compare signatures against the claimants in claim
  * order and are flagged `dup_of` the first one agreeing on ≥ tau64
  * of the 64 hash positions (tau64 = 32 ⇔ estimated Jaccard ≥ 0.5,
  * the batch verify threshold). "Is this document a near-duplicate of
  * anything already ingested?" is answered within the arrival's own
  * micro-batch — no repack, no candidate self-join, no corpus scan.
  *
  * A document's 16 band rows all travel in its own micro-batch, so the
  * per-document verdict is a STATELESS per-batch fold over this
  * stream's output ([[NearDupStream.fold]]): dup iff any band matched;
  * canonical = the smallest matched claimant — the
  * [[QuorumDedup]]-applyLive discipline (stateful kernel emits
  * per-band facts, the stateless post-stage folds them at the batch
  * rendezvous every row passes).
  *
  * Stream ≡ batch: within a bucket, arrivals fold in doc_id order, so
  * when classes are transitively clean (every member pairwise-similar
  * — the planted fixture shape, and what LSH banding assumes anyway)
  * the flagged set is EXACTLY the batch `dedup_minhash_lsh` verdict:
  * each class's minimum doc claims the buckets, every later member
  * matches it, canonical = class min. NearDupStreamSpec pins the
  * stream against a driver replay of this exact discipline over the
  * real corpus AND against the batch operator's verified pairs
  * (flagged set = the batch components' non-canonicals; est-vs-exact
  * verify agreement asserted pair-by-pair), plus a kill/restart case
  * proving wave-2 arrivals match wave-1 claimants out of restored
  * state.
  *
  * Scale shape at 100 TB: ONE keyed exchange (by (band, band-hash) —
  * 16× the arrival rows, each 8+8+512 bytes) into the stateful
  * operator; state is one claimant list per OCCUPIED bucket, ~1
  * claimant each (a second claimant needs a band collision between
  * dissimilar docs: P ≈ j⁴ per band at the measured background
  * j ≈ 0.03–0.07), i.e. ≈ 16 × 520 B per distinct content class —
  * linear in the DISTINCT corpus, like the batch band index it
  * replaces, and shardable by the key itself. The signature travels
  * once per band row but is stored only on claim. A production
  * deployment ages buckets out with an event-time timeout when the
  * upstream keeps per-class arrival windows bounded; the gate itself
  * never rescans, so state is the only corpus-sized term.
  *
  * Reference: the reference engine has no dedup surface (527 LoC of
  * CDC wiring); this is the streaming twin of the mandated batch
  * family (`dedup_minhash_lsh`, `dedup_labels_incremental`'s
  * persisted-band-index discipline made live). */
object NearDupStream {

  /** tau64 = 32 of 64 agreeing MinHash positions ⇔ estimated
    * Jaccard ≥ 0.5 — the batch operator's verify threshold
    * (`inter*3 >= n1+n2`). */
  val DefaultTau64 = 32

  case class Claimant(id: Long, sig: Array[Long])
  case class BucketState(claimants: Seq[Claimant])
  // public: Encoder codegen materializes instances from generated code
  case class BandArrival(doc_id: Long, b: Int, bh: Long, mh: Array[Long])

  /** `src`: a streaming (or batch) frame with (doc_id, text). Emits
    * one [[NearDupBand]] row per (arrival, band) in Append mode. */
  def flag(src: DataFrame, tau64: Int = DefaultTau64): Dataset[NearDupBand] = {
    val spark = src.sparkSession
    import spark.implicits._
    val sigs = src.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        graft.operators.Dedup.sketchText(text).map(mh => (id, mh))
      })
      .toDF("doc_id", "mh")
    // the batch band hash, verbatim: xxhash64 over the band's 4 sketch
    // positions (Dedup.minhashBandRows) — stream and batch bucket
    // identically, which is what the spec's cross-check relies on
    val bandStructs = (0 until 16).map { b =>
      struct(lit(b).as("b"),
        xxhash64(element_at(col("mh"), 4 * b + 1), element_at(col("mh"), 4 * b + 2),
          element_at(col("mh"), 4 * b + 3), element_at(col("mh"), 4 * b + 4)).as("bh"))
    }
    sigs
      .select(col("doc_id"), col("mh"), explode(array(bandStructs: _*)).as("band"))
      .select(col("doc_id"), col("band.b").as("b"), col("band.bh").as("bh"), col("mh"))
      .as[BandArrival]
      .groupByKey(r => (r.b, r.bh))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        bandGroup(tau64) _)
  }

  /** agreeing MinHash positions — the unbiased Jaccard estimator's
    * numerator (64 trials). */
  private[streaming] def sim64(a: Array[Long], b: Array[Long]): Int = {
    var i = 0; var c = 0
    while (i < a.length) { if (a(i) == b(i)) c += 1; i += 1 }
    c
  }

  private def bandGroup(tau64: Int)(key: (Int, Long),
      rows: Iterator[BandArrival],
      state: GroupState[BucketState]): Iterator[NearDupBand] = {
    var claimants = state.getOption.map(_.claimants).getOrElse(Seq.empty)
    val out = Seq.newBuilder[NearDupBand]
    // doc_id order within the trigger: the batch canonical is the class
    // MINIMUM, so the smallest co-arriving member must claim first
    rows.toSeq.sortBy(_.doc_id).foreach { a =>
      claimants.find(c => sim64(c.sig, a.mh) >= tau64) match {
        case Some(c) =>
          out += NearDupBand(a.doc_id, a.b, Some(c.id), sim64(c.sig, a.mh))
        case None =>
          val best =
            if (claimants.isEmpty) 0
            else claimants.iterator.map(c => sim64(c.sig, a.mh)).max
          claimants = claimants :+ Claimant(a.doc_id, a.mh)
          out += NearDupBand(a.doc_id, a.b, None, best)
      }
    }
    state.update(BucketState(claimants))
    out.result().iterator
  }

  /** the stateless per-document fold over one micro-batch of
    * [[flag]] output (all 16 band rows of a doc ride its own batch):
    * dup iff ANY band matched; canonical = the smallest matched
    * claimant (`min` skips nulls); `sim64` = the best agreement seen.
    * Run it inside foreachBatch — the post-stage rendezvous pattern. */
  def fold(bandRows: DataFrame): DataFrame =
    bandRows.groupBy(col("doc_id")).agg(
      min(col("dup_of")).as("dup_of"),
      max(col("sim64")).as("sim64"))

  // -------------------------------------------------------------------
  // Carry-payload form: the survivor publish without the store re-read.
  // -------------------------------------------------------------------

  /** [[NearDupBand]] + the document's serialized payload, carried on
    * its band-0 row only (null on the other 15 — the keyed exchange
    * pays the payload once per document, not per band). */
  case class NearDupBandP(doc_id: Long, b: Int, dup_of: Option[Long],
                          sim64: Int, payload: Option[String])

  case class BandArrivalP(doc_id: Long, b: Int, bh: Long, mh: Array[Long],
                          payload: Option[String])
  case class BandArrivalPT(doc_id: Long, b: Int, bh: Long, mh: Array[Long],
                           payload: Option[String], ets: java.sql.Timestamp)

  /** [[flag]] with the document's FULL ROW carried through the fold —
    * the width-vs-reread trade taken on the width side, which the
    * round-15 knee measurement made the right side: the chain's
    * survivor publish used to re-read the whole (growing) curated
    * store per batch (a corpus-sized scan term that made the gate the
    * chain's binding stage at 81% busy), while this form serializes
    * every arriving row once (`to_json` over all of `src`'s columns,
    * riding ONLY the band-0 row) and the survivor publish becomes a
    * batch-local semi-join + `from_json` — trigger-bounded, no store
    * access at all. Verdicts, claim order and bucket state are
    * byte-identical to [[flag]]'s (the kernel never looks at the
    * payload; [[BucketState]] is unchanged, so checkpoints carry
    * over). `src` must carry (doc_id, text); every column of `src`
    * enters the payload. */
  def flagCarry(src: DataFrame, tau64: Int = DefaultTau64): Dataset[NearDupBandP] = {
    val spark = src.sparkSession
    import spark.implicits._
    val sigs = src
      .select(col("doc_id"), col("text"),
        to_json(struct(src.columns.map(col): _*)).as("payload"))
      .as[(Long, String, String)]
      .mapPartitions(_.flatMap { case (id, text, payload) =>
        graft.operators.Dedup.sketchText(text).map(mh => (id, mh, payload))
      })
      .toDF("doc_id", "mh", "payload")
    val bandStructs = (0 until 16).map { b =>
      struct(lit(b).as("b"),
        xxhash64(element_at(col("mh"), 4 * b + 1), element_at(col("mh"), 4 * b + 2),
          element_at(col("mh"), 4 * b + 3), element_at(col("mh"), 4 * b + 4)).as("bh"))
    }
    sigs
      .select(col("doc_id"), col("mh"), col("payload"),
        explode(array(bandStructs: _*)).as("band"))
      .select(col("doc_id"), col("band.b").as("b"), col("band.bh").as("bh"),
        col("mh"),
        when(col("band.b") === 0, col("payload")).as("payload"))
      .as[BandArrivalP]
      .groupByKey(r => (r.b, r.bh))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        bandGroupP(tau64) _)
  }

  private def bandGroupP(tau64: Int)(key: (Int, Long),
      rows: Iterator[BandArrivalP],
      state: GroupState[BucketState]): Iterator[NearDupBandP] = {
    var claimants = state.getOption.map(_.claimants).getOrElse(Seq.empty)
    val out = Seq.newBuilder[NearDupBandP]
    rows.toSeq.sortBy(_.doc_id).foreach { a =>
      claimants.find(c => sim64(c.sig, a.mh) >= tau64) match {
        case Some(c) =>
          out += NearDupBandP(a.doc_id, a.b, Some(c.id), sim64(c.sig, a.mh), a.payload)
        case None =>
          val best =
            if (claimants.isEmpty) 0
            else claimants.iterator.map(c => sim64(c.sig, a.mh)).max
          claimants = claimants :+ Claimant(a.doc_id, a.mh)
          out += NearDupBandP(a.doc_id, a.b, None, best, a.payload)
      }
    }
    state.update(BucketState(claimants))
    out.result().iterator
  }

  /** [[flagExpiring]] with the carried payload — same bounded-state
    * contract, same carry discipline as [[flagCarry]]. `src` carries
    * (doc_id, text, ets) plus payload columns; `ets` is excluded from
    * the payload (it is the gate's event clock, not document data). */
  def flagExpiringCarry(src: DataFrame, ttlMs: Long,
      delay: String = "10 seconds",
      tau64: Int = DefaultTau64): Dataset[NearDupBandP] = {
    val spark = src.sparkSession
    import spark.implicits._
    val payloadCols = src.columns.filterNot(_ == "ets")
    val sigs = src
      .select(col("doc_id"), col("text"), col("ets"),
        to_json(struct(payloadCols.map(col): _*)).as("payload"))
      .as[(Long, String, java.sql.Timestamp, String)]
      .mapPartitions(_.flatMap { case (id, text, ets, payload) =>
        graft.operators.Dedup.sketchText(text).map(mh => (id, mh, payload, ets))
      })
      .toDF("doc_id", "mh", "payload", "ets")
      .withWatermark("ets", delay)
    val bandStructs = (0 until 16).map { b =>
      struct(lit(b).as("b"),
        xxhash64(element_at(col("mh"), 4 * b + 1), element_at(col("mh"), 4 * b + 2),
          element_at(col("mh"), 4 * b + 3), element_at(col("mh"), 4 * b + 4)).as("bh"))
    }
    sigs
      .select(col("doc_id"), col("mh"), col("payload"), col("ets"),
        explode(array(bandStructs: _*)).as("band"))
      .select(col("doc_id"), col("band.b").as("b"), col("band.bh").as("bh"),
        col("mh"),
        when(col("band.b") === 0, col("payload")).as("payload"),
        col("ets"))
      .as[BandArrivalPT]
      .groupByKey(r => (r.b, r.bh))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        expiringGroupP(tau64, ttlMs) _)
  }

  private def expiringGroupP(tau64: Int, ttlMs: Long)(key: (Int, Long),
      rows: Iterator[BandArrivalPT],
      state: GroupState[BucketState]): Iterator[NearDupBandP] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      var claimants = state.getOption.map(_.claimants).getOrElse(Seq.empty)
      val out = Seq.newBuilder[NearDupBandP]
      var maxEts = Long.MinValue
      rows.toSeq.sortBy(_.doc_id).foreach { a =>
        maxEts = math.max(maxEts, a.ets.getTime)
        claimants.find(c => sim64(c.sig, a.mh) >= tau64) match {
          case Some(c) =>
            out += NearDupBandP(a.doc_id, a.b, Some(c.id), sim64(c.sig, a.mh), a.payload)
          case None =>
            val best =
              if (claimants.isEmpty) 0
              else claimants.iterator.map(c => sim64(c.sig, a.mh)).max
            claimants = claimants :+ Claimant(a.doc_id, a.mh)
            out += NearDupBandP(a.doc_id, a.b, None, best, a.payload)
        }
      }
      state.update(BucketState(claimants))
      val wm = state.getCurrentWatermarkMs()
      state.setTimeoutTimestamp(math.max(wm, maxEts) + ttlMs)
      out.result().iterator
    }
  }

  // -------------------------------------------------------------------
  // UPDATE-AWARE (LWW) form: a superseded version's band claims retire.
  // -------------------------------------------------------------------

  /** one per-(doc, band) bucket message AFTER the consumer-side
    * explode: an ARRIVAL (the newest version's band row — signature,
    * and the carried payload on band 0) or a RETIRE (strip this doc's
    * claims with ver < `ver` from the OLD version's bucket). `mh` is
    * empty and `payload` null on retires. `epoch` is the registry
    * batch the message rode — the bucket kernel replays messages in
    * epoch order within its own trigger (see [[applyLww]]). */
  case class BandMsg(doc_id: Long, ver: Long, epoch: Long, b: Int, bh: Long,
                     retire: Boolean, mh: Array[Long], payload: Option[String])

  /** ONE registry→bucket message PER ARRIVING DOC — what the epoch
    * handoff actually carries. The 16× band fan-out is deliberately
    * NOT materialized here: the handoff is serialized JSON on disk,
    * and emitting per-band rows made the registry the measured binding
    * stage (92% busy at the serve-config knee burst, the bucket query
    * re-parsing 16 rows — each dragging its own 512 B signature copy —
    * per document). One compact row per doc (retire_bhs for the
    * superseded version, bhs + ONE mh + ONE payload for the new one)
    * cuts the handoff volume ~16× for arrivals and ~32× for updates;
    * [[explodeBands]] re-derives the exact per-band messages
    * STATELESSLY inside the consumer, after the JSON parse, before the
    * keyed exchange — same messages, same claim order, same verdicts.
    * `bhs` is empty on a pure retirement (idle timeout), `retire_bhs`
    * empty on a first arrival. */
  case class RegMsg(doc_id: Long, ver: Long, retire_bhs: Array[Long],
                    bhs: Array[Long], mh: Array[Long], payload: Option[String])

  /** DDL of [[RegMsg]] as the index-sink epochs carry it — the schema
    * the chain's bucket query reads the registry handoff with. The
    * publisher stamps each epoch's rows with the registry batch id
    * (`epoch` — a per-batch constant, so it is added at the
    * foreachBatch publish site, not by the kernel); the bucket kernel
    * replays messages in epoch order within a catch-up trigger.
    * Format evolution is FAIL-FAST: [[explodeBands]] raises on rows
    * whose arrays/epoch parse null (a pre-upgrade handoff directory
    * must be rebuilt, never silently dropped). */
  val RegMsgDdl: String = "doc_id LONG, ver LONG, retire_bhs ARRAY<LONG>, " +
    "bhs ARRAY<LONG>, mh ARRAY<LONG>, payload STRING, epoch LONG"

  /** the stateless consumer-side fan-out of [[RegMsg]] rows to
    * [[BandMsg]] rows (band index = array position — both arrays are
    * stored in band order): ONE generator over the concatenated
    * retire+arrival hash arrays, with `pos < |retire_bhs|`
    * discriminating the two halves — a single scan of the handoff
    * batch (a union of per-kind projections would parse every epoch
    * file twice), all codegen'd functions. The signature rides every
    * arrival row and the payload band 0 only — byte-identical input
    * to the bucket kernel as a per-band handoff would produce. */
  def explodeBands(msgs: DataFrame): DataFrame = {
    // FAIL-FAST format guard (round-17 ADVICE): a pre-upgrade handoff
    // directory (per-band BandMsg rows, or RegMsg epochs without the
    // publish-time epoch stamp) parses under [[RegMsgDdl]] with null
    // arrays/epoch, and the generator below would silently emit ZERO
    // rows for those files — a restarted chain would drop every gate
    // message without a trace. The guard rides the generator's own
    // input expression (evaluated once per handoff row, codegen'd;
    // a standalone guard column would be pruned as unused), so a
    // format mismatch kills the query loudly instead.
    val guardedRetire = when(
      col("retire_bhs").isNull.or(col("bhs").isNull).or(col("epoch").isNull),
      raise_error(lit("graft near-dup gate: handoff row parsed with null " +
        "retire_bhs/bhs/epoch — this epoch directory predates the current " +
        "RegMsg handoff format (NearDupStream.RegMsgDdl). Rebuild the gate " +
        "handoff/checkpoint; refusing to silently drop gate messages."))
        .cast("array<bigint>"))
      .otherwise(col("retire_bhs"))
    msgs
      .select(col("doc_id"), col("ver"), col("epoch"), col("mh"), col("payload"),
        size(col("retire_bhs")).as("nr"),
        posexplode(concat(guardedRetire, col("bhs"))).as(Seq("pos", "bh")))
      .select(col("doc_id"), col("ver"), col("epoch"),
        when(col("pos") < col("nr"), col("pos"))
          .otherwise(col("pos") - col("nr")).cast("int").as("b"),
        col("bh"),
        (col("pos") < col("nr")).as("retire"),
        when(col("pos") < col("nr"), expr("array()").cast("array<bigint>"))
          .otherwise(col("mh")).as("mh"),
        when(col("pos") === col("nr"), col("payload"))
          .otherwise(lit(null).cast("string")).as("payload"))
  }

  // public: Encoder codegen materializes instances from generated code
  case class RegArrival(doc_id: Long, ver: Long, mh: Array[Long],
                        bhs: Array[Long], payload: Option[String])
  /** per-doc registry state: the charged version and ITS 16 band
    * hashes — what a later update must retire. */
  case class DocReg(ver: Long, bhs: Array[Long])

  case class ClaimantV(id: Long, ver: Long, sig: Array[Long])
  case class BucketStateV(claimants: Seq[ClaimantV])

  /** Stage 1 of the UPDATE-AWARE gate — the per-doc VERSION REGISTRY:
    * the exact stale-state fix [[graft.streaming.TokenBudgetStream]]
    * `admitLww` ships for budget accounting, ported to band claims.
    * The reference analog is O7's keyed state lifecycle — per-key
    * registers that a later op for the same key supersedes
    * (`reference:src/main/java/org/flinkmon/source/MongoDBOplogSource.java:116-128`);
    * here the superseded entry additionally RETIRES what it had
    * claimed elsewhere.
    * [[flag]]'s contract is first-writer-claims-forever: an updated
    * document's OLD shingles stay resident in its old buckets, so a
    * superseded version can flag a genuinely-new arrival as its
    * near-dup — the one remaining stale-state semantic in the live
    * chain (the batch compaction twin, `dedup_minhash_lsh_lww`,
    * collapses LWW FIRST and never sees old versions at all).
    *
    * The registry is a second keyed ledger IN FRONT of the bucket
    * rendezvous, necessarily its own exchange: "which buckets did this
    * doc's previous version claim" is per-doc knowledge, while
    * retirement must be DELIVERED per-bucket — two different partition
    * keys, so the composition is two stateful queries joined by the
    * chain's standard exactly-once directory handoff (index-sink
    * epochs), exactly how every other stage pair composes.
    *
    * Per arriving doc (in-batch LWW collapse first — of several
    * versions co-arriving in one trigger only the NEWEST is forwarded,
    * the same rule the batch twin's `max_by(ver)` applies; an
    * intermediate version must never claim):
    *  - ver ≤ the registered ver → stale replay, dropped whole;
    *  - a NEW doc → one [[RegMsg]] with its 16 band hashes, signature
    *    and payload (the [[flagCarry]] discipline — the payload lands
    *    on band 0 at [[explodeBands]] time);
    *  - an UPDATE → the same row ALSO carrying `retire_bhs`, the OLD
    *    version's band hashes to strip.
    *
    * Scale shape: ONE keyed exchange by doc_id AND one emitted row per
    * arriving doc — never ×16 on either side of this stage; the
    * per-band fan-out is stateless and runs inside the CONSUMER
    * ([[explodeBands]]), after the handoff's JSON parse (emitting
    * per-band rows here put the registry at 92% busy at the measured
    * knee — the handoff is serialized on disk, and 16 rows/doc each
    * carrying a 512 B signature was the gate pair's binding term;
    * SCALING.md round 16); state is (ver + 16 hashes) ≈ 140 B per
    * doc — the same
    * corpus-linear apply-register class as `cdc_apply_state` and
    * `admitLww`'s charge ledger (RocksDB is the store dial; the TTL'd
    * deployment form is [[registerExpiringLww]], where the registry is
    * the ONE ager and its timeout retires the claims it forgets — a
    * claim never outlives the memory of how to retire it).
    *
    * `src` must carry (doc_id, ver, text); every column enters the
    * band-0 payload. Verdict semantics downstream are arrival-time
    * semantics, stated plainly: retiring a claim changes FUTURE
    * verdicts only — a doc already published as `dup_of` the old
    * version stays published (the batch twin re-adjudicates history
    * at compaction; the gate never rewrites emitted epochs). */
  def registerLww(src: DataFrame): Dataset[RegMsg] = {
    val spark = src.sparkSession
    import spark.implicits._
    val sigs = src
      .select(col("doc_id"), col("ver"), col("text"),
        to_json(struct(src.columns.map(col): _*)).as("payload"))
      .as[(Long, Long, String, String)]
      .mapPartitions(_.flatMap { case (id, ver, text, payload) =>
        graft.operators.Dedup.sketchText(text)
          .map(mh => (id, ver, mh, payload))
      })
      .toDF("doc_id", "ver", "mh", "payload")
    // the batch band hash, verbatim (same bucketing as [[flag]]) —
    // computed HERE so the registry can remember the old version's
    // bucket addresses without re-deriving them from text it no
    // longer has
    val bandHashes = (0 until 16).map { b =>
      xxhash64(element_at(col("mh"), 4 * b + 1), element_at(col("mh"), 4 * b + 2),
        element_at(col("mh"), 4 * b + 3), element_at(col("mh"), 4 * b + 4))
    }
    sigs
      .select(col("doc_id"), col("ver"), col("mh"),
        array(bandHashes: _*).as("bhs"), col("payload"))
      .as[(Long, Long, Array[Long], Array[Long], String)]
      .map { case (id, ver, mh, bhs, payload) =>
        RegArrival(id, ver, mh, bhs, Option(payload))
      }
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        regGroup _)
  }

  private def regGroup(key: Long, rows: Iterator[RegArrival],
      state: GroupState[DocReg]): Iterator[RegMsg] = {
    val newest = rows.maxBy(_.ver)   // in-batch LWW collapse
    val prev = state.getOption
    if (prev.exists(_.ver >= newest.ver)) Iterator.empty   // stale replay
    else {
      val retireBhs = prev.map(_.bhs).getOrElse(Array.empty[Long])
      state.update(DocReg(newest.ver, newest.bhs))
      Iterator.single(RegMsg(key, newest.ver, retireBhs, newest.bhs,
        newest.mh, newest.payload))
    }
  }

  /** Stage 2 of the UPDATE-AWARE gate — the bucket rendezvous with
    * VERSION-STAMPED claims: [[flag]]'s kernel plus retirement,
    * replayed EPOCH BY EPOCH (round-17 ADVICE): under catch-up one
    * file-stream trigger can bundle several registry epochs, and a
    * flat retires-first fold across the bundle has two hazards — a
    * LATE timeout-retire would strip a claim ahead of an EARLIER
    * in-horizon arrival (admitting a near-copy that should flag), and
    * a v1 arrival bundled with its own v2 update would claim after
    * the retire already ran, letting v2 flag against its own
    * superseded claim. Grouping the trigger's messages by the
    * publish-stamped `epoch` and folding epochs in ascending order —
    * per epoch: retires first, then arrivals in doc_id order —
    * reproduces the one-trigger-per-epoch sequential semantics
    * exactly, at ANY catch-up bundling, without throttling the reader
    * (a maxFilesPerTrigger=1 bound would pay the chain's measured
    * per-batch fixed machinery once per epoch during catch-up).
    * A retire strips the doc's claims with ver < the retiring ver; the
    * bucket's other claimants (including docs once flagged against the
    * retired claim) are untouched. Emits [[NearDupBandP]] rows for
    * arrivals only — [[fold]] and the batch-local survivor publish
    * compose unchanged. `msgs` is the COMPACT per-doc form —
    * [[registerLww]] output (directly — stamped epoch 0, one epoch
    * per trigger by construction — or re-read from its exactly-once
    * epoch handoff as [[RegMsgDdl]]); the per-band fan-out happens
    * here, statelessly, ahead of the keyed exchange
    * ([[explodeBands]]). */
  def applyLww(msgs: DataFrame, tau64: Int = DefaultTau64): Dataset[NearDupBandP] = {
    val spark = msgs.sparkSession
    import spark.implicits._
    val withEpoch =
      if (msgs.columns.contains("epoch")) msgs
      else msgs.withColumn("epoch", lit(0L))
    explodeBands(withEpoch
        .select(col("doc_id"), col("ver"), col("epoch"), col("retire_bhs"),
          col("bhs"), col("mh"), col("payload")))
      .as[BandMsg]
      .groupByKey(m => (m.b, m.bh))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        bucketGroupLww(tau64) _)
  }

  // private[streaming]: NearDupLwwPropertySpec drives the kernel
  // directly through TestGroupState across generated epoch histories
  private[streaming] def bucketGroupLww(tau64: Int)(key: (Int, Long),
      rows: Iterator[BandMsg],
      state: GroupState[BucketStateV]): Iterator[NearDupBandP] = {
    var claimants = state.getOption.map(_.claimants).getOrElse(Seq.empty)
    val out = Seq.newBuilder[NearDupBandP]
    // epoch-ordered replay (see [[applyLww]]); within an epoch each doc
    // appears at most once (the registry collapses in-batch LWW and
    // emits one RegMsg per doc per trigger)
    rows.toSeq.groupBy(_.epoch).toSeq.sortBy(_._1).foreach { case (_, msgs) =>
      val (retires, arrivals) = msgs.partition(_.retire)
      retires.foreach { r =>
        claimants = claimants.filterNot(c => c.id == r.doc_id && c.ver < r.ver)
      }
      arrivals.sortBy(_.doc_id).foreach { a =>
        // defensive reconciliation (round-17 ADVICE): a stamped handoff
        // always delivers a doc's retire ahead of its re-arrival, so an
        // own STALE claim still resident here means the input skipped
        // that discipline — drop it before adjudicating, keeping the
        // per-doc-single-claim invariant structural (appending beside
        // it would leave duplicate claimants for the doc, and `best`
        // would score the arrival against its own old signature)
        claimants = claimants.filterNot(c => c.id == a.doc_id && c.ver < a.ver)
        // c.id != a.doc_id: a document never adjudicates ITSELF — the
        // epoch replay already prevents self-pairing for stamped
        // handoffs; this keeps the invariant structural for any input
        claimants.find(c => c.id != a.doc_id && sim64(c.sig, a.mh) >= tau64) match {
          case Some(c) =>
            out += NearDupBandP(a.doc_id, a.b, Some(c.id), sim64(c.sig, a.mh), a.payload)
          case None =>
            val best =
              if (claimants.isEmpty) 0
              else claimants.iterator.map(c => sim64(c.sig, a.mh)).max
            claimants = claimants :+ ClaimantV(a.doc_id, a.ver, a.mh)
            out += NearDupBandP(a.doc_id, a.b, None, best, a.payload)
        }
      }
    }
    // a bucket whose last claim was retired is equivalent to absent —
    // remove it outright so retirement (and the TTL'd registry's eager
    // retires) actually SHRINKS the band-state ledger instead of
    // leaving empty tombstones resident
    if (claimants.isEmpty) state.remove()
    else state.update(BucketStateV(claimants))
    out.result().iterator
  }

  // -------------------------------------------------------------------
  // TTL'd UPDATE-AWARE form: the registry is the ONE ager.
  // -------------------------------------------------------------------

  /** per-doc registry state for the TTL'd form: [[DocReg]] plus the
    * doc's last-arrival event time (what the idle horizon measures). */
  case class DocRegT(ver: Long, bhs: Array[Long], lastEtsMs: Long)
  // public: Encoder codegen materializes instances from generated code.
  // ets stays a COLUMN (select, not map) so the watermark attribution
  // survives into the stateful operator — EventTimeTimeout requires it.
  case class RegArrivalT(doc_id: Long, ver: Long, mh: Array[Long],
                         bhs: Array[Long], payload: Option[String],
                         ets: java.sql.Timestamp)

  /** [[registerLww]] with the recall horizon made real — the
    * composition of the gate's two deployment dials (update-awareness
    * and bounded state) on ONE shared horizon, by construction: the
    * per-doc version registry is the ONLY ager. A document idle past
    * `ttl` of EVENT time (no arrival of ANY version for ttl) times out,
    * and the timeout itself EMITS the doc's 16 retire messages before
    * forgetting it — so the bucket ledger downstream is cleaned by the
    * exact mechanism updates already use, and registry memory dies in
    * the same kernel invocation that retires the claims it describes.
    * No forgot-the-memory corner exists: a claim can never outlive the
    * knowledge of how to retire it.
    *
    * The bucket stage stays [[applyLww]] UNCHANGED — NoTimeout, no
    * watermark, so a retire message can never be dropped as late (the
    * cliff an event-time-stateful bucket stage would face: timeout-
    * emitted retires carry no natural event time, and this chain has
    * pinned empirically that stateful stages drop input at/below their
    * watermark). Bucket state is bounded by retirement instead of by
    * its own timers: every claim is stripped either by its doc's next
    * version or by its doc's idle timeout, and a bucket whose last
    * claim leaves is removed whole.
    *
    * Verdict semantics, stated plainly: an arrival is flagged iff it
    * matches a claimant whose doc ARRIVED (any version) within the
    * horizon — a PER-DOC recall bound, strictly cleaner than
    * [[flagExpiring]]'s per-bucket granularity, where a claim survives
    * the horizon whenever unrelated traffic keeps its bucket hot. A
    * near-copy arriving after its class went idle past ttl re-claims
    * fresh and is ADMITTED (recall bounded by the horizon, exactly the
    * batch incremental family's index-vintage bound); a stale replay
    * re-arms its doc's idle clock but claims nothing.
    *
    * `src` must carry (doc_id, ver, text, ets); ets is the gate's
    * event clock and is excluded from the payload, every other column
    * enters it. `delay` is the ordinary lateness watermark. */
  def registerExpiringLww(src: DataFrame, ttlMs: Long,
      delay: String = "10 seconds"): Dataset[RegMsg] = {
    val spark = src.sparkSession
    import spark.implicits._
    val payloadCols = src.columns.filterNot(_ == "ets")
    val sigs = src
      .select(col("doc_id"), col("ver"), col("text"), col("ets"),
        to_json(struct(payloadCols.map(col): _*)).as("payload"))
      .as[(Long, Long, String, java.sql.Timestamp, String)]
      .mapPartitions(_.flatMap { case (id, ver, text, ets, payload) =>
        graft.operators.Dedup.sketchText(text)
          .map(mh => (id, ver, mh, payload, ets))
      })
      .toDF("doc_id", "ver", "mh", "payload", "ets")
      .withWatermark("ets", delay)
    val bandHashes = (0 until 16).map { b =>
      xxhash64(element_at(col("mh"), 4 * b + 1), element_at(col("mh"), 4 * b + 2),
        element_at(col("mh"), 4 * b + 3), element_at(col("mh"), 4 * b + 4))
    }
    sigs
      .select(col("doc_id"), col("ver"), col("mh"),
        array(bandHashes: _*).as("bhs"), col("payload"), col("ets"))
      .as[RegArrivalT]
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        regGroupT(ttlMs) _)
  }

  // private[streaming]: NearDupLwwPropertySpec drives the kernel
  // directly through TestGroupState across generated arrival histories
  private[streaming] def regGroupT(ttlMs: Long)(key: Long,
      rows: Iterator[RegArrivalT],
      state: GroupState[DocRegT]): Iterator[RegMsg] = {
    if (state.hasTimedOut) {
      // idle past the horizon: retire the doc's claims (ver+1 strips
      // claims with ver ≤ the registered one; a later re-arrival of
      // the SAME version claims fresh — retires apply first within a
      // bucket trigger, so even same-epoch ordering is safe), then
      // forget the doc
      val reg = state.get
      state.remove()
      Iterator.single(RegMsg(key, reg.ver + 1, reg.bhs,
        Array.empty, Array.empty, None))
    } else {
      val all = rows.toSeq
      val newest = all.maxBy(_.ver)
      val maxEts = all.iterator.map(_.ets.getTime).max
      val prev = state.getOption
      // the idle clock NEVER rewinds (round-17 ADVICE): an out-of-order
      // replay whose event time is older than the doc's stored
      // last-arrival (possible up to the full watermark delay — hours
      // in the chain's curationDelay config) re-arms FORWARD only —
      // lastEtsMs carries the max over everything ever seen, and the
      // timeout arms off that stored clock, so "idle for ttl" is
      // measured from the doc's LATEST arrival, as the contract states
      val lastEts = math.max(
        prev.map(_.lastEtsMs).getOrElse(Long.MinValue), maxEts)
      val out = Seq.newBuilder[RegMsg]
      if (prev.exists(_.ver >= newest.ver)) {
        // stale replay: claims nothing, but the doc DID arrive — its
        // idle clock re-arms (the horizon measures arrivals of the
        // doc, not of a specific version)
        val p = prev.get
        state.update(DocRegT(p.ver, p.bhs, lastEts))
      } else {
        out += RegMsg(key, newest.ver,
          prev.map(_.bhs).getOrElse(Array.empty[Long]), newest.bhs,
          newest.mh, newest.payload)
        state.update(DocRegT(newest.ver, newest.bhs, lastEts))
      }
      val wm = state.getCurrentWatermarkMs()
      state.setTimeoutTimestamp(math.max(wm, lastEts) + ttlMs)
      out.result().iterator
    }
  }

  // -------------------------------------------------------------------
  // Bounded-state form: idle buckets expire.
  // -------------------------------------------------------------------

  case class BandArrivalT(doc_id: Long, b: Int, bh: Long, mh: Array[Long],
                          ets: java.sql.Timestamp)

  /** [[flag]] with BOUNDED state — the 100 TB dial made real instead
    * of prose: a bucket that receives no arrival for `ttl` of EVENT
    * time is dropped whole (event-time timeout, armed per bucket at
    * `max(watermark, batch max ets) + ttl`), so state holds only the
    * buckets touched inside the sliding ttl window — the deployment
    * trade stated plainly: a near-dup arriving AFTER its class has
    * been idle past the horizon re-claims fresh buckets and is
    * ADMITTED (dedup recall bounded by the horizon, exactly like the
    * batch incremental family bounds it by the persisted index's
    * vintage). Within the horizon, verdicts are identical to
    * [[flag]]'s. `src` carries (doc_id, text, ets); `delay` is the
    * ordinary lateness watermark. */
  def flagExpiring(src: DataFrame, ttlMs: Long,
      delay: String = "10 seconds",
      tau64: Int = DefaultTau64): Dataset[NearDupBand] = {
    val spark = src.sparkSession
    import spark.implicits._
    val sigs = src.select(col("doc_id"), col("text"), col("ets"))
      .as[(Long, String, java.sql.Timestamp)]
      .mapPartitions(_.flatMap { case (id, text, ets) =>
        graft.operators.Dedup.sketchText(text).map(mh => (id, mh, ets))
      })
      .toDF("doc_id", "mh", "ets")
      .withWatermark("ets", delay)
    val bandStructs = (0 until 16).map { b =>
      struct(lit(b).as("b"),
        xxhash64(element_at(col("mh"), 4 * b + 1), element_at(col("mh"), 4 * b + 2),
          element_at(col("mh"), 4 * b + 3), element_at(col("mh"), 4 * b + 4)).as("bh"))
    }
    sigs
      .select(col("doc_id"), col("mh"), col("ets"),
        explode(array(bandStructs: _*)).as("band"))
      .select(col("doc_id"), col("band.b").as("b"), col("band.bh").as("bh"),
        col("mh"), col("ets"))
      .as[BandArrivalT]
      .groupByKey(r => (r.b, r.bh))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        expiringGroup(tau64, ttlMs) _)
  }

  private def expiringGroup(tau64: Int, ttlMs: Long)(key: (Int, Long),
      rows: Iterator[BandArrivalT],
      state: GroupState[BucketState]): Iterator[NearDupBand] = {
    if (state.hasTimedOut) {
      // idle past the horizon: the bucket's claimants age out whole —
      // nothing to emit, the next arrival re-claims fresh
      state.remove()
      Iterator.empty
    } else {
      var claimants = state.getOption.map(_.claimants).getOrElse(Seq.empty)
      val out = Seq.newBuilder[NearDupBand]
      var maxEts = Long.MinValue
      rows.toSeq.sortBy(_.doc_id).foreach { a =>
        maxEts = math.max(maxEts, a.ets.getTime)
        claimants.find(c => sim64(c.sig, a.mh) >= tau64) match {
          case Some(c) =>
            out += NearDupBand(a.doc_id, a.b, Some(c.id), sim64(c.sig, a.mh))
          case None =>
            val best =
              if (claimants.isEmpty) 0
              else claimants.iterator.map(c => sim64(c.sig, a.mh)).max
            claimants = claimants :+ Claimant(a.doc_id, a.mh)
            out += NearDupBand(a.doc_id, a.b, None, best)
        }
      }
      state.update(BucketState(claimants))
      val wm = state.getCurrentWatermarkMs()
      state.setTimeoutTimestamp(math.max(wm, maxEts) + ttlMs)
      out.result().iterator
    }
  }
}
