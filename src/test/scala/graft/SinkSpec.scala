package graft

import org.apache.spark.sql.functions._

/** File-sink coverage beyond the JSON-lines index sink: partitioned
  * parquet output — the layout a 100 TB curation job writes so that
  * downstream readers get partition pruning for free. */
class SinkSpec extends SparkSuite {

  test("partitioned parquet sink: hive layout, round-trip, partition pruning") {
    val out = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val ev = Tables.load(spark, sf0001, "events")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(out)

    // hive-style layout: one directory per partition value
    val subdirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    val types = ev.select("event_type").distinct()
      .collect().map(r => s"event_type=${r.getString(0)}").toSet
    assert(subdirs == types, s"layout $subdirs vs $types")

    // lossless round-trip (partition column restored from the path)
    val back = spark.read.parquet(out)
    assert(back.count() == ev.count())
    assert(back.select(sum(col("event_id"))).head().getLong(0) ==
      ev.select(sum(col("event_id"))).head().getLong(0))

    // partition PRUNING: a filter on the partition column must reach the
    // file index (PartitionFilters), not scan every directory
    val pruned = back.filter(col("event_type") === "click")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"),
      s"no partition pruning in:\n$plan")
    assert(pruned.count() == ev.filter(col("event_type") === "click").count())
  }
}
