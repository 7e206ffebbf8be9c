package graft.streaming

import graft.SparkSuite
import java.nio.file.Files

/** The streaming-throughput bench chain (file source with
  * maxFilesPerTrigger admission → O3 filter → quorum dedup → apply)
  * drains the fixture exactly once, in multiple admission-paced
  * micro-batches, with sane metering output. */
class StreamBenchSpec extends SparkSuite {

  // captured by the file-mode test, compared by the connector-mode test:
  // applied_rows is now defined as the FINAL live materialized key count,
  // which must be identical across admission pacings and source modes
  private var fileModeApplied: Long = -1L

  test("stream bench drains the corpus once under admission pacing") {
    val scratch = Files.createTempDirectory("graft-sbench").toFile.getAbsolutePath
    try {
      val (r, ops) = StreamBench.bench(
        spark, sf0001, scratch, files = 8, replicas = 3, maxFilesPerTrigger = 2)
      assert(ops > 0)
      // every fanned-out replica copy was ingested exactly once
      assert(r.inputRows == ops * 3, s"input=${r.inputRows} ops=$ops")
      // 8 files / 2 per trigger → ~4 batches: admission actually paced
      assert(r.batches >= 3, s"batches=${r.batches}")
      // live materialized keys: positive, bounded by the op count, and
      // strictly fewer emissions than ops would imply is impossible
      assert(r.appliedRows > 0 && r.appliedRows <= ops, s"applied=${r.appliedRows}")
      assert(r.emittedRows >= r.appliedRows, "state-change log at least one row per live key")
      assert(r.rowsPerSec > 0 && r.elapsedSec > 0)
      assert(r.batchMsMax >= r.batchMsP50 && r.batchMsP50 > 0)
      fileModeApplied = r.appliedRows
    } finally {
      scala.reflect.io.Directory(new java.io.File(scratch)).deleteRecursively()
      ()
    }
  }

  test("connector-mode stream bench drains every member copy exactly once") {
    val scratch = Files.createTempDirectory("graft-sbench-conn").toFile.getAbsolutePath
    try {
      val (r, ops) = StreamBench.benchConnector(
        spark, sf0001, scratch, filesPerMember = 4, replicas = 3, maxFilesPerTrigger = 3)
      assert(ops > 0)
      // each member holds a full copy: 3 × ops source rows, once each
      assert(r.inputRows == ops * 3, s"input=${r.inputRows} ops=$ops")
      // 12 member files / 3 per trigger → several admission-paced batches
      assert(r.batches >= 3, s"batches=${r.batches}")
      // every op reaches quorum across batches
      assert(r.appliedRows > 0 && r.appliedRows <= ops, s"applied=${r.appliedRows}")
      assert(r.rowsPerSec > 0 && r.elapsedSec > 0)
      // the round-5 finding: emission counts differ across modes/pacing,
      // so the reported metric is the final live-key count — and THAT
      // must be identical between file mode and connector mode
      if (fileModeApplied >= 0)
        assert(r.appliedRows == fileModeApplied,
          s"connector applied=${r.appliedRows} != file applied=$fileModeApplied")
    } finally {
      scala.reflect.io.Directory(new java.io.File(scratch)).deleteRecursively()
      ()
    }
  }

  test("serve bench answers every fanned query under admission pacing") {
    val scratch = Files.createTempDirectory("graft-sbench-serve").toFile.getAbsolutePath
    try {
      val r = StreamBench.benchServe(
        spark, sf0001, scratch, files = 8, fanout = 2, maxFilesPerTrigger = 2)
      val n = graft.Tables.load(spark, sf0001, "embeddings").count()
      // every fanned query vector entered exactly once...
      assert(r.inputRows == n * 2, s"input=${r.inputRows} n=$n")
      // ...and every one of them was served (distinct qids answered)
      assert(r.appliedRows == n * 2, s"served=${r.appliedRows}")
      // 5 MMR steps per served query
      assert(r.emittedRows == r.appliedRows * 5,
        s"hits=${r.emittedRows} served=${r.appliedRows}")
      // 8 files / 2 per trigger → admission actually paced the drain
      assert(r.batches >= 3, s"batches=${r.batches}")
      assert(r.rowsPerSec > 0 && r.batchMsP50 > 0)
    } finally {
      scala.reflect.io.Directory(new java.io.File(scratch)).deleteRecursively()
      ()
    }
  }

  test("near-dup gate bench sketches every doc and flags the planted mass") {
    val scratch = Files.createTempDirectory("graft-sbench-neardup").toFile.getAbsolutePath
    try {
      val r = StreamBench.benchNearDup(
        spark, sf0001, scratch, files = 8, maxFilesPerTrigger = 2)
      val n = graft.Tables.load(spark, sf0001, "documents").count()
      // every document entered exactly once
      assert(r.inputRows == n, s"input=${r.inputRows} n=$n")
      // sketchable docs emit 16 band rows each (short/null docs drop)
      assert(r.emittedRows > 0 && r.emittedRows % 16 == 0 &&
        r.emittedRows <= n * 16, s"band_rows=${r.emittedRows}")
      // the corpus's planted near-dups get flagged, but not everything
      assert(r.appliedRows > 0 && r.appliedRows < n,
        s"flagged=${r.appliedRows} of $n")
      // 8 files / 2 per trigger → admission actually paced the drain
      assert(r.batches >= 3, s"batches=${r.batches}")
      assert(r.rowsPerSec > 0 && r.batchMsP50 > 0)
    } finally {
      scala.reflect.io.Directory(new java.io.File(scratch)).deleteRecursively()
      ()
    }
  }
}
