package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery
import graft.streaming.ShardTopology.ShardSet

/** Multi-shard CDC ingestion (reference operators O2+O9): one pipeline
  * per shard, each with its OWN replica-quorum depth, all landing in
  * the same index directory (union at the storage layer).
  *
  * Deviation from the reference, documented per SURVEY.md §7.3: the
  * reference captures `replicaDepth` from the FIRST shard only
  * (`reference:src/main/java/org/flinkmon/mongo/conn/MongoOplogTailMapper.java:64`)
  * — wrong for heterogeneous clusters. Here each shard's stream dedups
  * at its own depth.
  *
  * Independent queries (not one unioned plan) are deliberate: Spark
  * disallows multiple flatMapGroupsWithState branches in one streaming
  * query, and operationally per-shard pipelines give independent
  * checkpoints, backpressure and restart — the same reason the
  * reference tails each shard with its own cursor set.
  */
object ShardedOplogPipeline {

  /** @param sourceDirFor directory of oplog-shaped json rows per shard
    * @param depthControlDirFor per-shard [[QuorumDedup.DepthControl]]
    *        dir — when set, each shard's quorum runs the LIVE
    *        reconfigurable form (member death below quorum handled by
    *        publishing the new depth, no restart)
    * @return one running query per shard (caller owns lifecycle) */
  def run(
      spark: SparkSession,
      topology: Seq[ShardSet],
      sourceDirFor: String => String,
      indexDir: String,
      checkpointRoot: String,
      watermark: String = "10 seconds",
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None,
      depthControlDirFor: Option[String => String] = None,
      sinkCoalesce: Option[Int] = None): Seq[StreamingQuery] =
    topology.map { shard =>
      OplogPipeline.run(
        spark,
        sourceDir = sourceDirFor(shard.shard),
        indexDir = s"$indexDir/${shard.shard}",
        checkpointDir = s"$checkpointRoot/${shard.shard}",
        replicaDepth = shard.replicaDepth,
        watermark = watermark,
        trigger = trigger.getOrElse(
          org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second")),
        depthControlDir = depthControlDirFor.map(f => f(shard.shard)),
        sinkCoalesce = sinkCoalesce)
    }
}
