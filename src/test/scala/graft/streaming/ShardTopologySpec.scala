package graft.streaming

import graft.SparkSuite

/** O2 parsing (reference `ShardSetFinder.java:72-78` behavior). */
class ShardTopologySpec extends SparkSuite {

  test("parses a sharded descriptor into members") {
    val ss = ShardTopology.parseDescriptor("s0/localhost:27018,localhost:27019,localhost:27020")
    assert(ss.shard == "s0")
    assert(ss.replicaDepth == 3)
    assert(ss.members.map(_.port) == Seq(27018, 27019, 27020))
    assert(ss.members.forall(_.host == "localhost"))
  }

  test("relational explode matches the pure parser") {
    import spark.implicits._
    val topo = Seq(
      ("s0", "s0/h1:27018,h2:27019"),
      ("s1", "s1/h3:27021,h4:27022,h5:27023")).toDF("_id", "host")
    val rows = ShardTopology.explodeMembers(topo)
      .select("shard", "member_host", "member_port")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(rows == Set(
      ("s0", "h1", 27018), ("s0", "h2", 27019),
      ("s1", "h3", 27021), ("s1", "h4", 27022), ("s1", "h5", 27023)))
  }
}
