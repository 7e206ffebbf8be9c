package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
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
  * servable within one poll interval plus one query cold-start. At
  * cluster scale the poll is an epoch-pointer read (the IndexSink
  * manifest pattern), not a directory listing.
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
    @volatile private var current: StreamingQuery = restart()
    @volatile private var sig: String = signature()

    private val monitor = new Thread(() => {
      while (running) {
        Thread.sleep(pollMs)
        val s = signature()
        if (running && s != sig) synchronized {
          current.stop()
          current = restart()
          sig = s
          nBounces.incrementAndGet()
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
      while (settledAt != nBounces.get()) {
        settledAt = nBounces.get()
        val q = synchronized(current)
        // a bounce may stop `q` mid-settle: swallow only that race (the
        // loop re-settles on the replacement); real failures re-throw
        // from the replacement's own settle
        try q.processAllAvailable()
        catch { case _: Exception if nBounces.get() != settledAt => () }
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
    def signature(): String = {
      val d = new java.io.File(admittedDir)
      Option(d.listFiles()).map(_.filter(_.getName.endsWith(".parquet"))
        .map(f => s"${f.getName}:${f.length}").sorted.mkString(","))
        .getOrElse("")
    }
    def restart(): StreamingQuery = {
      val queries = graft.Tables.loadStream(
        spark, queryStreamDir, "embeddings", schemaFrom)
      val admitted = spark.read.parquet(admittedDir)
        .select(col("doc_id").as("vec_id"))
      MmrServeStream.serveCorpus(queries, vecDir, admitted, nprobe = nprobe)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .format("parquet").option("path", outDir)
        .start()
    }
    new Handle(() => restart(), () => signature(), pollMs)
  }
}
