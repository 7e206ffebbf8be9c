package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.OplogEntry

/** The reference's one stateful operator, re-expressed on Spark's keyed
  * state: replica-quorum deduplication
  * (`reference:src/main/java/org/flinkmon/source/MongoDBOplogSource.java:116-128`).
  *
  * Semantics: each oplog op (key `h`) arrives once per replica-set
  * member; the op is *durable* once observed on ≥ `depth` members, and
  * must be emitted exactly once, at that moment.
  *
  * Two deliberate fixes over the reference (SURVEY.md §2.2, §7.4):
  *  - the reference keeps its counter map forever → keys from a dead
  *    replica (never reaching quorum) LEAK. Here state carries an
  *    event-time timeout: when the watermark passes an op's time the
  *    state is reaped.
  *  - the reference's counter is in-memory only → replayed ops after a
  *    crash re-emit (at-least-once). Here state lives in the state
  *    store, checkpointed with the offsets → exactly-once emission.
  *
  * REPLICA-SET RECONFIGURATION (round-11): the reference captures the
  * member count once at discovery (`MongoOplogTailMapper.java:64`) — if
  * a member then LEAVES, every op stuck one copy short of the old
  * quorum deadlocks forever. Here depth is swapped at restart (the same
  * moment a real deployment must restart anyway: the oplog connector
  * plans one InputPartition per member, so a membership change re-plans
  * the source), and the state machine RE-CHECKS quorum against the
  * current depth at timeout time:
  *  - depth DROP (N → N−1): a key buffered at `seen = N−1` under the
  *    old depth holds its first-arrived copy in state; on the first
  *    post-restart watermark advance its event-time timeout fires and
  *    the re-check `seen ≥ depth` now passes → the op emits (exactly
  *    once, from the retained copy). No stuck keys, no lost ops.
  *  - depth INCREASE (N → N+1): already-emitted ops STAY emitted (the
  *    `emitted` flag persists in the checkpointed state — quorum is a
  *    durability gate, not a retraction mechanism); not-yet-quorate
  *    keys simply need the deeper quorum before firing.
  *
  * Scale: state is partitioned by the op identity `(h, ts, tsInc)`
  * across executors (HDFSBackedStateStore /
  * RocksDB at cluster scale); per-key state is 12 bytes once emitted,
  * plus the retained first copy (one op) only while a key is BELOW
  * quorum — and the watermark bounds total state to the ops within the
  * lateness horizon either way.
  */
object QuorumDedup {

  /** The state-format id of the CURRENT grouping key — bumped whenever
    * the quorum state's key or shape changes incompatibly. v2 is the
    * round-17 identity re-key `(h, ts, tsInc)` (v1 keyed by `h` alone
    * and silently mis-grouped in-horizon updates). */
  val StateFormatId = "quorum-state-v2:(h,ts,tsInc)"
  private val FormatMarker = "_graft_quorum_state_format"

  /** FAIL-FAST checkpoint format guard (round-17 ask 3): the identity
    * re-key makes every pre-r17 quorum checkpoint semantically stale —
    * resuming over one would hand `h`-keyed state rows to the
    * three-field grouping. Spark's own state-schema checker is the
    * backstop for the KEY SCHEMA mismatch, but its message names
    * internal schema structs, not the upgrade; this guard applies the
    * gate-handoff discipline ([[NearDupStream.explodeBands]]'s format
    * raise) at query-start time with an actionable message instead.
    *
    * Protocol: a fresh checkpoint dir gets a `_graft_quorum_state_format`
    * marker stamped with [[StateFormatId]] BEFORE the query starts; a
    * dir that already committed offsets WITHOUT the marker is presumed
    * pre-upgrade (every build that HAS the guard stamps before its
    * first commit), and a marker carrying a different id is a future
    * incompatible bump — both raise. Hadoop FS API throughout, so the
    * guard holds on any checkpoint store, not just the local FS.
    *
    * KNOWN-FALSE-POSITIVE COHORT (round 19): a checkpoint written by a
    * build that already used the current grouping key but PREDATES the
    * marker protocol carries committed offsets and no marker — valid
    * state the inference above cannot distinguish from pre-re-key
    * state. For that cohort the default replay-from-scratch is safe
    * but wasteful, so an OPERATOR OVERRIDE exists: set the JVM system
    * property `graft.quorum.assumeStateFormat` (or the environment
    * variable `GRAFT_QUORUM_ASSUME_STATE_FORMAT`) to the exact
    * [[StateFormatId]] after manually verifying the checkpoint's
    * provenance, and the guard stamps the marker onto the
    * offsets-bearing checkpoint instead of refusing — once, loudly;
    * subsequent starts pass on the marker alone. The override value
    * must NAME the format id (not just be truthy) so a stale override
    * left in an init script can never wave through a FUTURE format
    * bump. */
  def ensureStateFormat(spark: SparkSession, checkpointDir: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(checkpointDir)
    val fs = dir.getFileSystem(conf)
    val marker = new org.apache.hadoop.fs.Path(dir, FormatMarker)
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val got =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      require(got == StateFormatId,
        s"graft quorum dedup: checkpoint $checkpointDir carries state " +
          s"format '$got' but this build expects '$StateFormatId'. The " +
          "grouping key changed incompatibly — resume from a fresh " +
          "checkpoint (replay the source range); refusing to mis-group " +
          "checkpointed quorum state.")
    } else {
      // no marker: committed progress means a pre-marker checkpoint —
      // either genuinely pre-re-key (h-keyed state: mis-grouping) or
      // the marker-less cohort written by a current-key build before
      // the guard existed (valid state the inference can't prove)
      val hasProgress = Seq("offsets", "commits").exists { sub =>
        val p = new org.apache.hadoop.fs.Path(dir, sub)
        fs.exists(p) && fs.listStatus(p)
          .exists(st => !st.getPath.getName.startsWith("."))
      }
      val assume = sys.props.get("graft.quorum.assumeStateFormat")
        .orElse(sys.env.get("GRAFT_QUORUM_ASSUME_STATE_FORMAT"))
      if (hasProgress && assume.contains(StateFormatId))
        // operator vouched for the marker-less cohort: stamp and go
        System.err.println(s"[quorum-guard] OVERRIDE: stamping " +
          s"'$StateFormatId' onto marker-less checkpoint $checkpointDir " +
          "on operator assertion (graft.quorum.assumeStateFormat)")
      else require(!hasProgress,
        s"graft quorum dedup: checkpoint $checkpointDir has committed " +
          "offsets but no state-format marker. Either it predates the " +
          s"'$StateFormatId' identity re-key (state keyed by h alone — " +
          "resuming would mis-group it) or it was written by a build " +
          "that already used the current key but predates the marker " +
          "protocol (valid state this guard cannot prove). Default: " +
          "resume from a fresh checkpoint (replay the source range). " +
          "If you have verified the checkpoint was written by a " +
          "current-key build, set -Dgraft.quorum.assumeStateFormat=" +
          s"'$StateFormatId' (or env GRAFT_QUORUM_ASSUME_STATE_FORMAT) " +
          "to stamp it and resume in place.")
      fs.mkdirs(dir)
      val out = fs.create(marker, true)
      try out.write(StateFormatId.getBytes("UTF-8")) finally out.close()
    }
  }

  /** per-key state: how many replicas reported, whether already
    * emitted, and — while NOT yet emitted — the first-arrived copy, so
    * a timeout-time quorum re-check (depth lowered at restart) has a
    * payload to emit. Dropped to None at emission: quorate keys cost
    * 12 bytes again. */
  final case class QuorumState(seen: Int, emitted: Boolean,
      pending: Option[OplogEntry] = None)

  /** pure per-event transition — unit-testable without a stream.
    * Returns (newState, emitNow). */
  private[graft] def step(st: QuorumState, depth: Int): (QuorumState, Boolean) = {
    val seen = st.seen + 1
    val fire = !st.emitted && seen >= depth
    (st.copy(seen = seen, emitted = st.emitted || fire), fire)
  }

  /** pure timeout-time decision (the reconfiguration re-check): the
    * retained first copy to emit, if the CURRENT depth — possibly
    * lower than the one the copies arrived under — is now satisfied
    * and nothing fired before. QuorumPropertySpec composes this with
    * [[step]] to prove exactly-once across random depth swaps. */
  private[graft] def timeoutFire(st: QuorumState, depth: Int): Option[OplogEntry] =
    if (!st.emitted && st.seen >= depth) st.pending else None

  private def quorumFn(depth: Int)(
      opId: (Long, Long, Int),
      events: Iterator[OplogEntry],
      state: GroupState[QuorumState]): Iterator[OplogEntry] = {
    if (state.hasTimedOut) {            // watermark passed: reap (leak fix)
      // reconfiguration recovery: with an unchanged depth a timed-out
      // key is always sub-quorum (a quorate key fired on arrival), but
      // after a restart that LOWERED depth the re-check passes for keys
      // the old deeper quorum left stuck — emit their retained first
      // copy now, exactly once, then reap. Emission happens at the
      // first watermark advance past the op's event time, so recovery
      // latency is bounded by the lateness horizon.
      val st = state.getOption.getOrElse(QuorumState(0, emitted = false))
      val out = timeoutFire(st, depth).iterator
      state.remove()
      out
    } else {
      var st = state.getOption.getOrElse(QuorumState(0, emitted = false))
      val out = scala.collection.mutable.ArrayBuffer.empty[OplogEntry]
      var firstTs: Option[java.sql.Timestamp] = None
      events.foreach { e =>
        if (firstTs.isEmpty) firstTs = Some(e.ts)
        if (!st.emitted && st.pending.isEmpty) st = st.copy(pending = Some(e))
        val (next, fire) = step(st, depth)
        st = next
        if (fire) out += e
      }
      if (st.emitted && st.pending.nonEmpty) st = st.copy(pending = None)
      state.update(st)
      // keep state until the watermark passes the op's event time, so
      // late replica copies of an already-emitted op are absorbed (not
      // re-counted into a fresh key) and never-quorate keys get reaped.
      // Clamped above the current watermark: a straggler copy arriving
      // with event time at/below the watermark would otherwise make
      // setTimeoutTimestamp throw ("timeout cannot be earlier than
      // watermark") and kill the whole query.
      firstTs.foreach(ts => state.setTimeoutTimestamp(
        math.max(ts.getTime + 1, state.getCurrentWatermarkMs() + 1)))
      out.iterator
    }
  }

  /** Streaming form: requires a watermark on `ts` upstream.
    *
    * KEYED BY THE FULL OP IDENTITY `(h, ts, tsInc)`, not `h` alone
    * (round-17 fix, found by the all-dials soak): the reference's `h`
    * is MongoDB's PER-OP hash, but the chain's fixtures (and real
    * apply-stage consumers) overload `h` as the document key — under
    * an `h`-only key a LATER op on the same document arriving while
    * the first op's state is still inside the lateness horizon was
    * absorbed as a "late replica copy" of the already-emitted op and
    * silently dropped (an update within the horizon never reached the
    * index). Replica copies of one op share all three fields, so copy
    * absorption, quorum counting, watermark reaping and the
    * reconfiguration re-check are unchanged; a new op on the same
    * document now reaches its own quorum and emits exactly once.
    * Checkpoint note: the grouping key changed — resume streams from
    * a fresh checkpoint when upgrading. */
  def apply(ds: Dataset[OplogEntry], depth: Int)(implicit spark: SparkSession): Dataset[OplogEntry] = {
    import spark.implicits._
    ds.groupByKey(e => (e.h, e.ts.getTime, e.tsInc))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(quorumFn(depth))
  }

  // ---------------------------------------------------------------------
  // LIVE RECONFIGURATION (round 12): depth change WITHOUT restart.
  // ---------------------------------------------------------------------

  /** an op tagged with the depth in force at its arrival; `ts` is
    * re-exposed top-level so the watermark column survives the tagging
    * map (the event-time attribute must sit directly under the state
    * operator for EventTimeTimeout's late-row handling). */
  final case class TaggedOp(op: OplogEntry, depth: Int, ts: java.sql.Timestamp)

  /** one live-form output row: `decided` = fired at arrival under the
    * event-carried depth; undecided rows are a timeout's retained
    * first copy whose quorum re-check is DEFERRED to the stateless
    * post-stage, which evaluates it against the depth in force at that
    * watermark advance — the one global read a keyed state function
    * cannot do for itself (a quiescent key sees no more events, so no
    * event can carry the new depth to it). */
  final case class QuorumOut(op: OplogEntry, seen: Int, decided: Boolean)

  /** The depth CONTROL CHANNEL: a directory of immutable one-line
    * version files ("version,depth"), highest version wins. Publish is
    * atomic (temp file + rename) so a reader never sees a torn value;
    * versions make late-arriving files harmless. In a deployment the
    * dir lives on the same shared storage as the checkpoint; here the
    * local FS plays that role. Reads happen once per TASK per
    * micro-batch — a handful of tiny file reads per trigger, nothing
    * per-row. */
  object DepthControl {
    import java.nio.file.{Files, Paths, StandardCopyOption}

    def publish(dir: String, version: Long, depth: Int): Unit = {
      val p = Paths.get(dir)
      Files.createDirectories(p)
      val tmp = Files.createTempFile(p, ".tmp-", "")
      Files.write(tmp, s"$version,$depth".getBytes("UTF-8"))
      Files.move(tmp, p.resolve(s"v$version"), StandardCopyOption.ATOMIC_MOVE)
      ()
    }

    def read(dir: String, default: Int): Int = {
      val p = Paths.get(dir)
      if (!Files.isDirectory(p)) return default
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(Files.list(p)) { stream =>
        val vs = stream.iterator().asScala
          .filter(_.getFileName.toString.startsWith("v"))
          .flatMap { f =>
            scala.util.Try {
              val Array(v, d) =
                new String(Files.readAllBytes(f), "UTF-8").trim.split(',')
              (v.toLong, d.toInt)
            }.toOption
          }.toSeq
        if (vs.isEmpty) default else vs.maxBy(_._1)._2
      }
    }
  }

  /** live transition: [[step]] at the EVENT-CARRIED depth (arrival
    * decisions use the depth in force when the copy arrived); a
    * timeout hands its retained sub-quorum copy downstream undecided
    * instead of deciding with a stale depth. */
  private def quorumLiveFn(
      opId: (Long, Long, Int),
      events: Iterator[TaggedOp],
      state: GroupState[QuorumState]): Iterator[QuorumOut] = {
    if (state.hasTimedOut) {
      val st = state.getOption.getOrElse(QuorumState(0, emitted = false))
      state.remove()
      st.pending match {
        case Some(op) if !st.emitted =>
          Iterator.single(QuorumOut(op, st.seen, decided = false))
        case _ => Iterator.empty
      }
    } else {
      var st = state.getOption.getOrElse(QuorumState(0, emitted = false))
      val out = scala.collection.mutable.ArrayBuffer.empty[QuorumOut]
      var firstTs: Option[java.sql.Timestamp] = None
      events.foreach { te =>
        if (firstTs.isEmpty) firstTs = Some(te.ts)
        if (!st.emitted && st.pending.isEmpty) st = st.copy(pending = Some(te.op))
        val (next, fire) = step(st, te.depth)
        st = next
        if (fire) out += QuorumOut(te.op, next.seen, decided = true)
      }
      if (st.emitted && st.pending.nonEmpty) st = st.copy(pending = None)
      state.update(st)
      firstTs.foreach(ts => state.setTimeoutTimestamp(
        math.max(ts.getTime + 1, state.getCurrentWatermarkMs() + 1)))
      out.iterator
    }
  }

  /** LIVE-DEPTH streaming form — quorum reconfiguration WITHOUT a
    * restart (the round-11 verdict's remaining reference-semantics
    * refinement; the reference can't do either form, it captures the
    * member count once at discovery, `MongoOplogTailMapper.java:64`).
    *
    * Semantics: **an op emits under the depth in force at its decision
    * time.**
    *  - An ARRIVAL decision (a copy lands) uses the depth published at
    *    that copy's micro-batch — carried on the event, so depth
    *    changes reach every still-active key through its own traffic.
    *  - A TIMEOUT decision (watermark passes a retained sub-quorum
    *    copy) is deferred: the state op emits the copy `undecided`,
    *    and the stateless post-stage admits it iff `seen ≥ depth` at
    *    THAT batch — so a depth DROP frees a stuck key at the next
    *    watermark advance, no restart, exactly once (state was removed
    *    with the handoff; the post-stage can only admit or drop).
    *  - A depth INCREASE retracts nothing (`emitted` persists); keys
    *    below the deeper quorum either collect more copies or hand
    *    their copy to the post-stage, which drops it (a never-quorate
    *    key reaped, as in the fixed-depth form).
    *
    * Why the handoff: Spark keys state by the op identity, so no event can carry a
    * new depth to a QUIESCENT key — its copies all arrived. The only
    * global rendezvous every key passes through is the OUTPUT, so the
    * one decision that needs the current depth after a key goes quiet
    * is made there, with the depth read in the deciding batch.
    *
    * Replay caveat (same class as stream-static joins and as the
    * restart form's own re-read): a batch replayed after a crash reads
    * the control dir again and may see a newer depth; the idempotent
    * index sink absorbs the difference. Recovery latency for a stuck
    * key is bounded by the lateness horizon, exactly like the restart
    * form.
    *
    * Scale: tagging is a stateless per-partition map (one tiny control
    * read per task per trigger, no shuffle added); the post-stage is a
    * stateless filter on the state op's output. State size and
    * partitioning are unchanged from [[apply]]. */
  def applyLive(
      ds: Dataset[OplogEntry],
      controlDir: String,
      defaultDepth: Int,
      watermark: String = "10 seconds")(
      implicit spark: SparkSession): Dataset[OplogEntry] = {
    import spark.implicits._
    val tagged = ds.mapPartitions { it =>
      val d = DepthControl.read(controlDir, defaultDepth)
      it.map(e => TaggedOp(e, d, e.ts))
    }.withWatermark("ts", watermark)
    tagged.groupByKey(t => (t.op.h, t.op.ts.getTime, t.op.tsInc))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(quorumLiveFn)
      .mapPartitions { it =>
        lazy val d = DepthControl.read(controlDir, defaultDepth)
        it.filter(q => q.decided || q.seen >= d).map(_.op)
      }
  }

  /** Batch form over a bounded Dataset (same emission rule: the first
    * record of each key reaching quorum) — used by tests and the
    * bounded analog query. */
  def batch(ds: Dataset[OplogEntry], depth: Int)(implicit spark: SparkSession): Dataset[OplogEntry] = {
    import spark.implicits._
    ds.groupByKey(e => (e.h, e.ts.getTime, e.tsInc))
      .flatMapGroups { (_, it) =>
        val buf = it.toSeq.sortBy(e => (e.ts.getTime, e.tsInc, e.sourceHost))
        if (buf.size >= depth) Iterator.single(buf.head) else Iterator.empty
      }
  }
}
