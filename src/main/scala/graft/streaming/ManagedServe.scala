package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** Self-refreshing restricted serve — the ServeFreshnessSpec pin made
  * operational. A running [[MmrServeStream.serveCorpus]] query answers
  * from the admission snapshot its STATIC side resolved at start (a
  * parquet relation lists its files at DataFrame creation), so new
  * admissions are invisible until the query restarts. This manager
  * owns that restart: a driver-side monitor polls the admitted
  * manifest's listing signature and BOUNCES the serve query over a
  * re-read snapshot when it changes. The query-vector stream rides the
  * same checkpoint across bounces, so already-answered queries are
  * never re-served and queries in flight at a bounce are served
  * exactly once (file-source offsets + parquet-sink commit log — the
  * standard Structured Streaming restart contract, here exercised on
  * purpose at every refresh).
  *
  * The refresh CADENCE is the freshness dial: admissions become
  * servable within one poll interval plus one query cold-start. The
  * poll is [[MmrServeStream.manifestVersion]] — for a sink-written
  * manifest that IS an epoch-pointer read (one small commit-log
  * listing, independent of data size), and only plain dirs fall back
  * to a file-signature walk.
  */
object ManagedServe {

  /** Running manager. [[drain]] settles the CURRENT query (bounces
    * included: it re-checks after each settle so a mid-drain refresh
    * still ends settled). [[bounces]] counts completed refreshes. */
  final class Handle private[ManagedServe] (
      restart: () => StreamingQuery,
      signature: () => String,
      pollMs: Long) {
    private val nBounces = new AtomicInteger(0)
    @volatile private var running = true
    @volatile private var bouncing = false
    // a bounce whose restart() threw left `current` STOPPED: until the
    // next poll's retry succeeds, the serve is down and a drain()
    // returning "settled" would be a lie (processAllAvailable on a
    // stopped query is a no-op) — the flag holds drain() open across
    // the retry window
    @volatile private var bounceFailed = false
    // signature BEFORE the first start: admissions landing between the
    // two would otherwise be baked into `sig` but invisible to the
    // started query's static listing — never bounced for, unservable
    // until some later manifest change. Captured first, such a landing
    // reads as a signature change on the next poll and bounces
    // normally (the same pre-restart capture order every bounce uses:
    // `s` is read before its restart, so a mid-restart landing costs
    // at most one spurious extra bounce, never a blind spot).
    @volatile private var sig: String = signature()
    @volatile private var current: StreamingQuery = restart()

    private val monitor = new Thread(() => {
      while (running) {
        Thread.sleep(pollMs)
        val s = try signature() catch { case _: Exception => sig }
        if (running && s != sig) synchronized {
          // flag BEFORE stop(): a drain()'s processAllAvailable can
          // throw the moment stop() lands, before nBounces increments
          // — without the flag that window rethrows as a spurious
          // hard failure. `sig` advances only on a SUCCESSFUL bounce:
          // a restart that throws (transient fault) leaves sig stale,
          // so the next poll retries the bounce instead of the
          // monitor thread dying with the serve stopped.
          bouncing = true
          try {
            current.stop()
            current = restart()
            sig = s
            nBounces.incrementAndGet()
            bounceFailed = false
            ()
          } catch { case e: Exception =>
            bounceFailed = true
            System.err.println(s"[managed-serve] bounce failed, will retry: $e")
          } finally bouncing = false
          ()
        }
      }
    }, "managed-serve-monitor")
    monitor.setDaemon(true)
    monitor.start()

    def bounces: Int = nBounces.get()

    /** Settle the chain: processAllAvailable on the current query,
      * repeated until no bounce interleaved — after this, every query
      * vector visible so far has been answered against the manifest in
      * force when its batch ran. */
    def drain(): Unit = {
      var settledAt = -1
      // `|| bouncing`: a swallowed mid-settle exception can reach the
      // re-check BEFORE the monitor increments nBounces — without the
      // flag the count looks settled and drain would return with the
      // replacement query never settled. `|| bounceFailed`: a failed
      // bounce leaves the serve STOPPED until the next poll's retry —
      // settling a stopped query is a no-op, so drain must wait for
      // the retry to succeed (guarded by `running` so stop() releases
      // a waiter instead of hanging it forever).
      while (settledAt != nBounces.get() || bouncing ||
          (bounceFailed && running)) {
        while ((bouncing || bounceFailed) && running) Thread.sleep(10)
        if (!running && bounceFailed) return
        settledAt = nBounces.get()
        val q = synchronized(current)
        // a bounce may stop `q` mid-settle: swallow only that race (the
        // loop re-settles on the replacement); real failures re-throw
        // from the replacement's own settle. `bouncing` covers the
        // stop→restart window BEFORE nBounces increments — an
        // exception landing there is still the bounce race, not a
        // hard failure (the flag is raised before stop() is called)
        try q.processAllAvailable()
        catch {
          case _: Exception if bouncing || nBounces.get() != settledAt => ()
        }
      }
    }

    /** Wait until at least `n` bounces have completed (spec helper). */
    def awaitBounces(n: Int, timeoutMs: Long = 30000): Boolean = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (nBounces.get() < n && System.nanoTime() < deadline) Thread.sleep(50)
      nBounces.get() >= n
    }

    def stop(): Unit = {
      running = false
      monitor.join(10000)
      synchronized(current).stop()
    }
  }

  /** Start the managed serve: query vectors stream from
    * `queryStreamDir` (schema from `schemaFrom`), candidates from
    * `vecDir`'s embeddings restricted to the doc_ids currently in
    * `admittedDir`, MMR hits appended to `outDir` parquet. One
    * checkpoint across all bounces. */
  def start(spark: SparkSession, queryStreamDir: String, schemaFrom: String,
      vecDir: String, admittedDir: String, checkpoint: String, outDir: String,
      nprobe: Int = 2, pollMs: Long = 1000L): Handle = {
    def signature(): String =
      MmrServeStream.manifestVersion(spark, admittedDir)
    def restart(): StreamingQuery = {
      val queries = graft.Tables.loadStream(
        spark, queryStreamDir, "embeddings", schemaFrom)
      // the guarded read, shared with the refreshed serve: before the
      // first admission (missing/empty dir) the query STARTS and
      // serves nothing instead of dying on schema inference; real
      // faults still propagate (no silent empty-corpus serve)
      val admitted = MmrServeStream.readAdmittedIds(spark, admittedDir)
      MmrServeStream.serveCorpus(queries, vecDir, admitted, nprobe = nprobe)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .format("parquet").option("path", outDir)
        .start()
    }
    new Handle(() => restart(), () => signature(), pollMs)
  }

  /** Spec seam: a Handle over explicit restart/signature thunks, so a
    * test can inject a restart that fails transiently (the
    * failed-bounce retry window is otherwise unreachable without a
    * real fault injector). */
  private[streaming] def startWith(restart: () => StreamingQuery,
      signature: () => String, pollMs: Long): Handle =
    new Handle(restart, signature, pollMs)
}
