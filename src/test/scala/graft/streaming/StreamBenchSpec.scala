package graft.streaming

import graft.SparkSuite
import java.nio.file.Files

/** The streaming-throughput bench chain (file source with
  * maxFilesPerTrigger admission → O3 filter → quorum dedup → apply)
  * drains the fixture exactly once, in multiple admission-paced
  * micro-batches, with sane metering output. */
class StreamBenchSpec extends SparkSuite {

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
      // apply emits ≥1 row per changed key and never more than one per op
      assert(r.appliedRows > 0 && r.appliedRows <= ops, s"applied=${r.appliedRows}")
      assert(r.rowsPerSec > 0 && r.elapsedSec > 0)
      assert(r.batchMsMax >= r.batchMsP50 && r.batchMsP50 > 0)
    } finally {
      scala.reflect.io.Directory(new java.io.File(scratch)).deleteRecursively()
      ()
    }
  }
}
