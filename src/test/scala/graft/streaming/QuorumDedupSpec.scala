package graft.streaming

import graft.SparkSuite
import graft.model.OplogEntry
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming semantics of the quorum dedup (SURVEY.md §5.2 #3):
  * exactly-once emission at depth, below-quorum suppression, duplicate
  * absorption after emission. */
class QuorumDedupSpec extends SparkSuite {

  private def entry(h: Long, host: String, sec: Int): OplogEntry =
    OplogEntry(new java.sql.Timestamp(1700000000000L + sec * 1000L), sec, h,
      "i", "test.grades", None, s"""{"_id":$h}""", None, host)

  test("pure step: fires exactly once at depth") {
    var st = QuorumDedup.QuorumState(0, emitted = false)
    val fires = (1 to 5).map { _ =>
      val (next, fire) = QuorumDedup.step(st, 3)
      st = next
      fire
    }
    assert(fires == Seq(false, false, true, false, false))
    assert(st.seen == 5 && st.emitted)
  }

  test("streaming: emits once per key only at quorum depth 3") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[OplogEntry]
    val deduped = QuorumDedup(input.toDS().withWatermark("ts", "10 seconds"), 3)
    val q = deduped.writeStream.format("memory").queryName("quorum_out")
      .outputMode(OutputMode.Append).start()
    try {
      // h=1 reaches quorum (3 replicas), h=2 stays below (2), h=3 over (4)
      input.addData(entry(1, "r1", 1), entry(2, "r1", 1), entry(3, "r1", 1))
      q.processAllAvailable()
      input.addData(entry(1, "r2", 2), entry(2, "r2", 2), entry(3, "r2", 2))
      q.processAllAvailable()
      input.addData(entry(1, "r3", 3), entry(3, "r3", 3), entry(3, "r4", 4))
      q.processAllAvailable()
      val out = spark.table("quorum_out").as[OplogEntry].collect()
      assert(out.map(_.h).sorted.toSeq == Seq(1L, 3L), s"got ${out.toSeq}")
      // late duplicate of an emitted key must NOT re-emit
      input.addData(entry(1, "r4", 4))
      q.processAllAvailable()
      assert(spark.table("quorum_out").count() == 2)
    } finally q.stop()
  }

  test("a replica copy arriving below the watermark cannot crash the query") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[OplogEntry]
    val deduped = QuorumDedup(input.toDS().withWatermark("ts", "2 seconds"), 3)
    val q = deduped.writeStream.format("memory").queryName("quorum_late_out")
      .outputMode(OutputMode.Append).start()
    try {
      // advance the watermark far past sec=1 with fresh keys
      input.addData(entry(7, "r1", 1000), entry(8, "r1", 2000))
      q.processAllAvailable()
      // straggler copy with event time way below the watermark: the
      // state timeout must clamp to watermark+1 (an unclamped
      // setTimeoutTimestamp(ts+1) throws and kills the whole query)
      input.addData(entry(9, "r1", 1))
      q.processAllAvailable()
      input.addData(entry(8, "r2", 2001))
      q.processAllAvailable()          // query still alive and progressing
      assert(q.isActive && q.exception.isEmpty,
        s"query died: ${q.exception}")
    } finally q.stop()
  }

  test("batch form matches set-of-quorate-keys semantics") {
    implicit val s = spark
    import s.implicits._
    val data = Seq(
      entry(10, "r1", 1), entry(10, "r2", 2), entry(10, "r3", 3),
      entry(20, "r1", 1), entry(20, "r2", 2),
      entry(30, "r1", 5), entry(30, "r2", 6), entry(30, "r3", 7), entry(30, "r1", 8))
    val out = QuorumDedup.batch(data.toDS(), 3).collect()
    assert(out.map(_.h).sorted.toSeq == Seq(10L, 30L))
    // emitted record is the first by (ts, tsInc, host)
    assert(out.find(_.h == 30).get.tsInc == 5)
  }
}
