package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shard-topology discovery (reference operator O2,
  * `reference:src/main/java/org/flinkmon/mongo/conn/ShardSetFinder.java:44-78`):
  * parse `config.shards`-style descriptors `"s0/h1:p1,h2:p2,h3:p3"`
  * into per-replica member rows.
  *
  * Deviation from the reference (documented per SURVEY.md §7.3): the
  * reference takes the replica depth from the FIRST shard only
  * (`MongoOplogTailMapper.java:64`); we compute depth per shard, which
  * is correct for heterogeneous clusters.
  */
object ShardTopology {

  final case class Member(shard: String, host: String, port: Int)
  final case class ShardSet(shard: String, members: Seq[Member]) {
    def replicaDepth: Int = members.size
  }

  /** pure parser for one descriptor — the unit the connector's
    * `planInputPartitions` would consume (one InputPartition per member). */
  def parseDescriptor(descriptor: String): ShardSet = {
    val Array(shard, hosts) = descriptor.split("/", 2)
    val members = hosts.split(",").toSeq.map { hp =>
      val idx = hp.lastIndexOf(':')
      Member(shard, hp.substring(0, idx), hp.substring(idx + 1).toInt)
    }
    ShardSet(shard, members)
  }

  /** relational form over a DataFrame of `(_id, host)` topology docs:
    * split on '/' then explode the comma list — one row per member. */
  def explodeMembers(topology: DataFrame): DataFrame =
    topology
      .withColumn("members", split(element_at(split(col("host"), "/", 2), 2), ","))
      .select(
        col("_id").as("shard"),
        explode(col("members")).as("hostport"))
      .withColumn("member_host", substring_index(col("hostport"), ":", 1))
      .withColumn("member_port", substring_index(col("hostport"), ":", -1).cast("int"))
      .drop("hostport")
}
