package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-query JOB-GRAIN profiler (optimization-guide §1: decide whether
  * wall time is executor compute, shuffle, or driver-side gaps before
  * touching anything). For each named query: run once cold, once warm
  * with a listener attached, then print every Spark job's wall span and
  * task-time sum plus the DRIVER GAPS between consecutive jobs — on a
  * 138-query fixture-scale bench the gaps (planning, localCheckpoint
  * sync barriers, collect-side work) are often the real cost, and no
  * per-stage metric shows them. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.builderDefaults(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-jobprofile"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class JobRec(id: Int, desc: String, start: Long,
        var end: Long = 0L, var taskTimeMs: Long = 0L, var tasks: Int = 0,
        var shuffleReadMB: Double = 0, var shuffleWriteMB: Double = 0,
        var stages: List[String] = Nil)
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stageToJob = mutable.Map.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs(e.jobId) = JobRec(e.jobId, desc.take(60), e.time)
        e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = jobs.synchronized {
        val si = e.stageInfo
        stageToJob.get(si.stageId).flatMap(jobs.get).foreach { j =>
          j.taskTimeMs += si.taskMetrics.executorRunTime
          j.tasks += si.numTasks
          j.shuffleReadMB += si.taskMetrics.shuffleReadMetrics.totalBytesRead / 1e6
          j.shuffleWriteMB += si.taskMetrics.shuffleWriteMetrics.bytesWritten / 1e6
          j.stages ::= s"${si.name.takeWhile(_ != '\n').take(40)}(${si.numTasks}t/${si.taskMetrics.executorRunTime}ms)"
        }
      }
    }

    args.foreach { name =>
      val q = graft.SparkEntry.queries(name)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      val t0 = System.nanoTime()
      q(spark, sfDir).count()   // cold
      val cold = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      jobs.clear(); stageToJob.clear()
      spark.sparkContext.addSparkListener(listener)
      val w0 = System.currentTimeMillis()
      val t1 = System.nanoTime()
      q(spark, sfDir).count()   // warm, profiled
      val warm = (System.nanoTime() - t1) / 1e9
      // listener events are posted async; give the bus a beat to drain
      // (listenerBus.waitUntilEmpty is private[spark]; a scratch
      // profiler doesn't justify a package-cheat accessor)
      Thread.sleep(1500)
      spark.sparkContext.removeSparkListener(listener)
      println(f"\n===== $name cold=$cold%.2fs warm=$warm%.2fs =====")
      val js = jobs.synchronized(jobs.values.toSeq.sortBy(_.start))
      val wallStart = w0
      var prevEnd = wallStart
      var gapSum = 0L
      js.foreach { j =>
        val gap = j.start - prevEnd
        gapSum += math.max(0L, gap)
        println(f"  job ${j.id}%3d +${j.start - wallStart}%6dms gap=${gap}%5dms " +
          f"span=${j.end - j.start}%5dms tasks=${j.tasks}%4d taskTime=${j.taskTimeMs}%6dms " +
          f"shR=${j.shuffleReadMB}%7.1fMB shW=${j.shuffleWriteMB}%7.1fMB  ${j.desc} " +
          j.stages.reverse.mkString("[", " ", "]"))
        prevEnd = math.max(prevEnd, j.end)
      }
      val spanSum = js.map(j => j.end - j.start).sum
      println(f"  jobs=${js.size} jobSpanSum=${spanSum}ms driverGapSum=${gapSum}ms " +
        f"taskTimeSum=${js.map(_.taskTimeMs).sum}ms")
    }
    spark.stop()
  }
}
