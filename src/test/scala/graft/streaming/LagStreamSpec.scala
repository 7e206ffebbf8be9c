package graft.streaming

import graft.SparkSuite
import graft.model.OplogEntry
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The live replica-lag monitor: per-member counts/newest agree with a
  * driver replay after every batch, and a member going quiet shows its
  * lag GROWING and inherits the quorum-frontier flag mid-ingest. */
class LagStreamSpec extends SparkSuite {

  private def entry(host: String, sec: Int, h: Long): OplogEntry =
    OplogEntry(new java.sql.Timestamp(1700000000000L + sec * 1000L), sec, h,
      "i", "t.c", None, "{}", None, host)

  test("lag report tracks member maxima live; a quiet member becomes the frontier") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[OplogEntry]
    val q = LagStream.monitor(input.toDS())
      .writeStream.format("memory").queryName("lag_out")
      .outputMode("update").start()
    def rows() = spark.table("lag_out").as[LagReport].collect()
    try {
      // batch 1: all three members current (r3 newest)
      input.addData(entry("r1", 10, 1), entry("r2", 11, 1), entry("r3", 12, 1),
        entry("r1", 20, 2), entry("r2", 21, 2), entry("r3", 22, 2))
      q.processAllAvailable()
      val v1 = rows().filter(_.version == 1L).map(r => r.host -> r).toMap
      assert(v1.keySet == Set("r1", "r2", "r3"))
      assert(v1("r3").lag_us == 0L && v1("r1").is_quorum_frontier,
        s"r3 is newest, r1 (sec 20) the frontier: ${v1.values.toSeq}")
      assert(v1.values.forall(_.n_ops == 2L))
      // batch 2: r3 goes quiet — its lag must GROW and the frontier
      // flag must move to it, while the stream is still ingesting
      input.addData(entry("r1", 100, 3), entry("r2", 101, 3))
      q.processAllAvailable()
      val v2 = rows().filter(_.version == 2L).map(r => r.host -> r).toMap
      assert(v2("r3").n_ops == 2L && v2("r3").lag_us == (101L - 22L) * 1000000L,
        s"quiet member's lag must grow: ${v2("r3")}")
      assert(v2("r3").is_quorum_frontier && !v2("r1").is_quorum_frontier,
        s"frontier must move to the quiet member: ${v2.values.toSeq}")
      // cross-check the arriving-member rows against the batch rule
      assert(v2("r1").n_ops == 3L && v2("r1").lag_us == 1000000L,
        v2("r1").toString)
    } finally q.stop()
  }
}
