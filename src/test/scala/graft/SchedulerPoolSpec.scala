package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import scala.jdk.CollectionConverters._

/** Pins the mechanism the SCALING.md co-tenant isolation numbers rest
  * on: `spark.scheduler.pool` is a thread-local property, and a
  * STREAMING query started by a thread inherits that thread's pool onto
  * its micro-batch thread for the query's whole lifetime — including
  * batches triggered long after `GraftSession.inPool` returned and
  * restored the caller's property. The scheduler MODE (FAIR vs FIFO)
  * only changes how pools are weighted, not how the property propagates,
  * so the inheritance is assertable on the shared FIFO session; if a
  * Spark upgrade stopped capturing local properties at query start, the
  * FAIR dial would silently collapse to one pool — this spec flips
  * loudly instead. */
class SchedulerPoolSpec extends SparkSuite {

  test("a streaming query's jobs run in the pool of the thread that started it") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val jobs = new ConcurrentLinkedQueue[(String, String)]() // (jobGroup, pool)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val p = js.properties
        jobs.add((
          Option(p.getProperty("spark.jobGroup.id")).getOrElse(""),
          Option(p.getProperty("spark.scheduler.pool")).getOrElse("")))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val src = MemoryStream[Long]
    val q = GraftSession.inPool(spark, "serve") {
      src.toDF().writeStream.format("memory").queryName("pool_probe")
        .outputMode("append").start()
    }
    try {
      // inPool restored the caller's property the moment start()
      // returned — later batches must still carry the captured pool
      assert(spark.sparkContext.getLocalProperty("spark.scheduler.pool") == null)
      src.addData(1L, 2L)
      q.processAllAvailable()
      src.addData(3L)
      q.processAllAvailable()
      // streaming batches set the job group to the query's runId
      val run = q.runId.toString
      // listener delivery is async; poll until this query's jobs land
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      def mine() = jobs.asScala.toList.filter(_._1.contains(run))
      while (mine().isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      val pools = mine().map(_._2)
      assert(pools.nonEmpty, "no job-start events observed for the query")
      assert(pools.forall(_ == "serve"),
        s"expected every micro-batch job in pool 'serve', got: $pools")
    } finally {
      q.stop()
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("inPool nests and restores the previous pool on every exit path") {
    val sc = spark.sparkContext
    assert(sc.getLocalProperty("spark.scheduler.pool") == null)
    GraftSession.inPool(spark, "outer") {
      assert(sc.getLocalProperty("spark.scheduler.pool") == "outer")
      GraftSession.inPool(spark, "inner") {
        assert(sc.getLocalProperty("spark.scheduler.pool") == "inner")
      }
      assert(sc.getLocalProperty("spark.scheduler.pool") == "outer")
      intercept[RuntimeException] {
        GraftSession.inPool(spark, "inner") { throw new RuntimeException("boom") }
      }
      assert(sc.getLocalProperty("spark.scheduler.pool") == "outer")
    }
    assert(sc.getLocalProperty("spark.scheduler.pool") == null)
  }
}
