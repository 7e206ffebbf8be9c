package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the union-schema apply: the fixture's drifting
  * change log, staged across three content-addressed micro-batches (so
  * user histories straddle batch boundaries out of order), must fold to
  * exactly the batch `cdc_schema_evolution` rows; plus the pure-fold
  * order-independence that makes that guarantee hold for ANY order. */
class SchemaEvolutionStreamSpec extends SparkSuite {

  test("pure fold is order-independent across permutations") {
    def ch(id: Long, ts: Long, op: String, k: Option[Long],
        tag: Option[String], ms: Option[String]) =
      EvoChange(1L, id, new java.sql.Timestamp(ts / 1000L), ts, op, k, tag, ms)
    val changes = Seq(
      ch(1, 1000L, "i", Some(1L), None, None),
      ch(2, 2000L, "u", Some(2L), Some("a"), None),
      ch(3, 3000L, "u", None, None, Some("cdc")),
      ch(4, 3000L, "u", Some(4L), Some("b"), None),   // ts tie with id 3
      ch(5, 5000L, "u", Some(5L), None, None))
    val base = EvoState(0L, 0L, "", Long.MinValue, Long.MinValue,
      None, Long.MinValue, Long.MinValue, None, Long.MinValue, Long.MinValue,
      None, Long.MinValue, Long.MinValue, 0L)
    val orders = Seq(changes, changes.reverse,
      changes.sortBy(_.event_id % 3), changes.sortBy(c => -(c.event_id % 2)))
    val folded = orders.map(_.foldLeft(base)(SchemaEvolutionStream.fold))
    assert(folded.distinct.size == 1,
      s"fold must be a semilattice merge: ${folded.distinct}")
    val s = folded.head
    assert(s.k == Some(5L) && s.tag == Some("b") && s.meta_src == Some("cdc")
      && s.last_op == "u" && s.n_changes == 5L && s.n_with_tag == 2L, s.toString)
  }

  test("streamed fold over out-of-order batches equals the batch query") {
    import spark.implicits._
    val expected = graft.operators.CdcApply.schemaEvolution.run(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        Option(r.getString(6)), Option(r.getString(7)))))
      .toMap

    val parsed = graft.operators.CdcApply.evolutionChanges(
      graft.Tables.load(spark, sf0001, "events"))
    val in = java.nio.file.Files.createTempDirectory("graft-evo-in")
    val scratch = java.nio.file.Files.createTempDirectory("graft-evo-scr")
    try {
      // content-addressed three-way split: user histories straddle the
      // batch boundary and arrive out of (ts, event_id) order
      val h = substring(md5($"event_id".cast("string")), 2, 1)
      def stage(pred: org.apache.spark.sql.Column, name: String): Unit = {
        val tmp = scratch.resolve(name)
        parsed.filter(pred).coalesce(1).write.parquet(tmp.toString)
        val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.copy(part.toPath, in.resolve(s"$name.parquet"))
      }
      stage(h >= "8", "b0")                 // newer-hash half first
      stage(h >= "4" && h < "8", "b1")
      stage(h < "4", "b2")
      val src = spark.readStream.schema(parsed.schema)
        .option("maxFilesPerTrigger", "1").parquet(in.toString)
      val q = SchemaEvolutionStream(
          src.withWatermark("ts", "3650 days").as[EvoChange])
        .writeStream.format("memory").queryName("evo_out")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()

      val all = spark.table("evo_out").as[EvoRow].collect()
      assert(all.map(_.version).max >= 2L,
        "no user straddled a batch boundary — the split is broken")
      val lastV = all.groupBy(_.user_id).view.mapValues(_.map(_.version).max).toMap
      val got = all.filter(r => r.version == lastV(r.user_id) && r.last_op != "d")
        .map(r => r.user_id -> ((r.n_changes, r.n_with_tag, r.last_op,
          r.last_ts_us, r.k, r.tag, r.meta_src)))
        .toMap
      assert(got == expected,
        s"missing=${(expected.keySet -- got.keySet).take(4)} " +
          s"extra=${(got.keySet -- expected.keySet).take(4)} " +
          s"diff=${expected.collect { case (k, v) if got.get(k).exists(_ != v) => (k, v, got(k)) }.take(2)}")
    } finally {
      new scala.reflect.io.Directory(in.toFile).deleteRecursively()
      new scala.reflect.io.Directory(scratch.toFile).deleteRecursively()
    }
  }

  test("per-field registers survive a restart: a pre-restart field joins post-restart state") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-evo-resume")
    def ch(uid: Long, id: Long, sec: Int, op: String, k: Option[Long],
        tag: Option[String]) =
      EvoChange(uid, id, new java.sql.Timestamp(1700000000000L + sec * 1000L),
        1700000000000000L + sec * 1000000L, op, k, tag, None)
    def stage(rows: Seq[EvoChange], name: String): Unit = {
      val tmp = root.resolve(s"scr-$name")
      rows.toDS().coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, root.resolve(s"in/$name.parquet"))
    }
    java.nio.file.Files.createDirectory(root.resolve("in"))
    val schema = Seq.empty[EvoChange].toDS().schema
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[EvoRow]()
    def start() = {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(root.resolve("in").toString)
      SchemaEvolutionStream(src.withWatermark("ts", "3650 days").as[EvoChange])
        .writeStream
        .option("checkpointLocation", root.resolve("ckpt").toString)
        .outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[EvoRow], _: Long) =>
          b.collect().foreach(emitted.add); ()
        }
        .start()
    }
    try {
      // phase 1: the tag arrives (only here — never again)
      stage(Seq(ch(7L, 1L, 1, "i", Some(1L), Some("sticky"))), "b0")
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      // phase 2 (restart): a later change WITHOUT the tag — the folded
      // state must still carry the pre-restart register's value
      stage(Seq(ch(7L, 2L, 2, "u", Some(2L), None)), "b1")
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      import scala.jdk.CollectionConverters._
      val rows = emitted.asScala.toArray
        .filter(_.user_id == 7L).sortBy(_.version)
      assert(rows.map(_.version).toSeq == Seq(1L, 2L), rows.toSeq.toString)
      val last = rows.last
      assert(last.k == Some(2L) && last.tag == Some("sticky") &&
        last.n_changes == 2L,
        s"restored register lost across restart: $last")
    } finally {
      new scala.reflect.io.Directory(root.toFile).deleteRecursively()
      ()
    }
  }
}
