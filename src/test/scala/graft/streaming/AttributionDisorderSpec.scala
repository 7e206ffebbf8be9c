package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Cross-batch DISORDER for streaming attribution — the arrivals the
  * watermark delay exists to tolerate, which the time-split specs
  * never exercise:
  *   - a LATE TOUCH older than the buffered one must not steal credit
  *     from a later purchase (a single-cell "last touch" state
  *     overwrites and gets this wrong);
  *   - a LATE PURCHASE must credit the latest touch before ITSELF,
  *     not the newer touch already in state;
  * and the assignments must equal the batch rule replayed over the
  * fully-sorted log. Also checks the state buffer prune keeps the
  * one-plus-in-delay-window bound. */
class AttributionDisorderSpec extends SparkSuite {

  private case class Ev(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
                        event_type: String, value: Double)
  private def at(minute: Long) = new java.sql.Timestamp(minute * 60000L)

  test("late touches and late purchases credit exactly per the batch rule") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = AttributionStream.attribute(src.toDF(), delay = "30 days")
      .writeStream.format("memory").queryName("attr_disorder")
      .outputMode("append").start()
    try {
      // batch 1: click@600', purchase@640'
      src.addData(
        Ev(1L, at(600), 1L, "click", 5.0),
        Ev(1L, at(640), 2L, "purchase", 5.0))
      q.processAllAvailable()
      // batch 2 (all LATE, within the 30d delay): a view OLDER than
      // the buffered click, a purchase between them, a purchase after
      // the click
      src.addData(
        Ev(1L, at(540), 3L, "view", 1.0),
        Ev(1L, at(570), 4L, "purchase", 7.0),
        Ev(1L, at(620), 5L, "purchase", 9.0))
      q.processAllAvailable()
      // batch 3: in-order purchase — the buffer still holds the right
      // latest touch after absorbing the disorder
      src.addData(Ev(1L, at(660), 6L, "purchase", 11.0))
      q.processAllAvailable()

      val got = spark.table("attr_disorder").collect()
        .map(r => r.getLong(1) -> r.getString(3)).toMap
      // batch rule over the sorted log: view@540 < click@600;
      // p@570 → view (the only touch before it)
      // p@620 → click (NOT the late view — no overwrite)
      // p@640 → click
      // p@660 → click
      assert(got == Map(2L -> "click", 4L -> "view", 5L -> "click", 6L -> "click"),
        s"disordered assignments wrong: $got")
    } finally q.stop()
  }

  test("prune keeps one at-or-before-watermark touch plus the in-delay tail") {
    val t = List(TouchRec(100L, 1L, "view"), TouchRec(200L, 2L, "click"),
      TouchRec(300L, 3L, "view"), TouchRec(400L, 4L, "click"))
    // wm = 350: touches ≤ 350 collapse to the latest (300); 400 stays
    assert(AttributionStream.prune(t, 350L) ==
      List(TouchRec(300L, 3L, "view"), TouchRec(400L, 4L, "click")))
    // wm far past everything + 7d: all dropped
    val far = 400L + AttributionStream.SevenDaysUs + 1L
    assert(AttributionStream.prune(t, far).isEmpty)
    // wm before everything: nothing collapses, nothing dropped
    assert(AttributionStream.prune(t, 50L) == t)
    // the kept latest-at-or-before must still be inside the 7d horizon
    val old = List(TouchRec(0L, 1L, "view"))
    assert(AttributionStream.prune(old, AttributionStream.SevenDaysUs + 1L).isEmpty)
  }
}
