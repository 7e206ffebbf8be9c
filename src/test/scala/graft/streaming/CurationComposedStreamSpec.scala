package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** The round-5 composition ask: quality gate → content dedup
  * (`dropDuplicatesWithinWatermark`) → per-source stateful cap, ONE
  * streaming query ([[CurationStream.curate]]), proven stage-by-stage
  * against the batch flagship `curation_e2e` on the same corpus.
  *
  * Determinism design: streaming first-arrival dedup equals batch
  * min-doc_id dedup only for arrivals in doc_id order ACROSS
  * micro-batches — within a batch the survivor pick is
  * partition-order-dependent (observed: doc 82 beating doc 0 inside
  * one batch). So the fixture places same-fingerprint docs in
  * DIFFERENT files (chunk = rank within fp class; rank-1 docs spread
  * over 4 doc_id-ordered files, later ranks in later files), making
  * every dedup decision a deterministic cross-batch one. The cap
  * stage's per-source CARDINALITY then equals batch (min(cap,
  * survivors)); member identity is exact for sources the cap never
  * truncates, and for truncated sources cardinality is the invariant
  * — a streaming cap can't reproduce a corpus-global content rank
  * without seeing the future.
  */
class CurationComposedStreamSpec extends SparkSuite {

  // survivor spread is 16..25 per source: 18 leaves both capped and
  // uncapped sources, so both cap-state branches are exercised
  private val Cap = 18

  /** mirror of curation_e2e's stages in batch mode (same expressions) */
  private def batchStages(df: DataFrame) = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val base = df.select($"doc_id", $"source", $"lang",
        size(TextFns.tokens($"text")).cast("long").as("n_tokens"),
        TextFns.fingerprint($"text").as("fp"),
        md5($"doc_id".cast("string")).as("mh"))
      .filter($"n_tokens" >= CurationStream.QualityMinTokens)
    val dedup = base
      .withColumn("dup_rk", row_number().over(Window.partitionBy($"fp").orderBy($"doc_id")))
      .filter($"dup_rk" === 1)
    val capped = dedup
      .withColumn("cap_rk", row_number().over(
        Window.partitionBy($"source").orderBy($"mh", $"doc_id")))
      .filter($"cap_rk" <= Cap)
    (dedup, capped)
  }

  /** class-aware chunking: rank-1 (future dedup survivors + singletons)
    * over 4 doc_id-ordered files, rank k ≥ 2 in file 3 + k — no two
    * same-fp docs ever share a micro-batch at maxFilesPerTrigger=1 */
  private def writeFixture(docs: DataFrame, dir: java.nio.file.Path): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rk = docs.select($"doc_id", TextFns.fingerprint($"text").as("fp"),
        size(TextFns.tokens($"text")).as("n_tokens"))
      .filter($"n_tokens" >= CurationStream.QualityMinTokens)
      .withColumn("rk", row_number().over(Window.partitionBy($"fp").orderBy($"doc_id")))
      .select($"doc_id", $"rk").as[(Long, Int)].collect().toMap
    val rank1 = rk.filter(_._2 == 1).keys.toSeq.sorted
    val quartile = rank1.zipWithIndex.map { case (id, i) =>
      id -> i * 4 / rank1.length }.toMap
    val chunkOf: Long => Int = id => rk.get(id) match {
      case None => 0                       // gated out in-stream anyway
      case Some(1) => quartile(id)
      case Some(k) => 3 + k - 1            // rank 2 → file 4, ...
    }
    val nChunks = chunkOf(rank1.head).max(
      rk.values.max match { case m if m >= 2 => 3 + m - 1; case _ => 3 }) + 1
    val ids = docs.select($"doc_id").as[Long].collect()
    (0 until nChunks).foreach { c =>
      val keep = ids.filter(chunkOf(_) == c).toSet
      val f = dir.resolve(f"chunk-$c%02d")
      docs.filter($"doc_id".isInCollection(keep)).orderBy($"doc_id")
        .coalesce(1).write.parquet(f.toString)
      f.toFile.listFiles.foreach(_.setLastModified(1700000000000L + c * 60000L))
      f.toFile.setLastModified(1700000000000L + c * 60000L)
    }
  }

  private def runStream(dir: java.nio.file.Path, schema: org.apache.spark.sql.types.StructType,
      name: String, mfpt: Int): Array[(Long, String, String, Long, String)] = {
    val q = CurationStream.curate(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", mfpt).parquet(s"$dir/chunk-*"),
        cap = Cap)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getString(4)))
  }

  test("one-query stream gate→dedup→cap matches curation_e2e's stages") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft-curation-stream")
    try {
      writeFixture(docs, dir)
      val out = runStream(dir, docs.schema, "curation_composed", mfpt = 1)

      val (dedup, capped) = batchStages(docs)
      val dedupRows = dedup.select($"doc_id", $"source", $"lang", $"n_tokens")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      val dedupById = dedupRows.map(t => t._1 -> t).toMap
      val dedupBySource = dedupRows.groupBy(_._2).map { case (s, v) => s -> v.length }
      val cappedBySource = capped.groupBy($"source").count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap

      // distinct survivors, each the batch dedup-stage survivor for its
      // class, columns exact — proves gate+dedup composed exactly
      assert(out.map(_._1).distinct.length == out.length)
      out.foreach { case (id, src, lang, nTok, _) =>
        val d = dedupById.getOrElse(id, fail(s"doc $id not a batch dedup survivor"))
        assert((d._2, d._3, d._4) == (src, lang, nTok), s"doc $id stage columns drifted")
      }
      // per-source cardinality == batch curation_e2e cardinality
      val outBySource = out.groupBy(_._2).map { case (s, v) => s -> v.length.toLong }
      assert(outBySource == cappedBySource,
        s"per-source cap cardinality drifted: $outBySource vs $cappedBySource")
      // uncapped sources: exact member equality with the batch output
      val cappedIds = capped.select($"doc_id", $"source").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val uncapped = dedupBySource.filter(_._2 <= Cap).keys.toSeq
      assert(uncapped.nonEmpty && uncapped.size < dedupBySource.size,
        "fixture must exercise BOTH cap branches (some sources capped, some not)")
      uncapped.foreach { s =>
        assert(out.filter(_._2 == s).map(_._1).toSet ==
          cappedIds.filter(_._2 == s).map(_._1).toSet, s"uncapped source $s drifted")
      }
      // split assignment is content-addressed — exact per row
      out.foreach { case (id, _, _, _, split) =>
        val h2 = java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .take(1).map("%02x".format(_)).mkString
        val want = if (h2 < "cd") "train" else if (h2 < "e6") "val" else "test"
        assert(split == want, s"doc $id split $split != $want")
      }
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir.toFile).deleteRecursively()
    }
  }

  test("stream output is batching-invariant where it must be (mfpt=2)") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft-curation-mfpt2")
    try {
      writeFixture(docs, dir)
      // chunks pair up per trigger; same-class docs are still in
      // distinct files whose PAIRING keeps rank-1 before rank-2 (ranks
      // 1 live in files 0-3, rank 2 in file 4) — dedup decisions stay
      // cross-batch and deterministic, only cap batching changes
      val out = runStream(dir, docs.schema, "curation_mfpt2", mfpt = 2)
      val (dedup, capped) = batchStages(docs)
      val outBySource = out.groupBy(_._2).map { case (s, v) => s -> v.length.toLong }
      val cappedBySource = capped.groupBy($"source").count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(outBySource == cappedBySource,
        s"mfpt=2 cap cardinality drifted: $outBySource vs $cappedBySource")
      val dedupIds = dedup.select($"doc_id").as[Long].collect().toSet
      assert(out.forall(r => dedupIds.contains(r._1)),
        "mfpt=2 emitted a non-survivor")
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir.toFile).deleteRecursively()
    }
  }
}
