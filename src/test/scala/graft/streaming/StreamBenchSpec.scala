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
      // every op reaches quorum across batches; apply emits ≥ 1 row per
      // changed key per batch, never more than one per op
      assert(r.appliedRows > 0 && r.appliedRows <= ops, s"applied=${r.appliedRows}")
      assert(r.rowsPerSec > 0 && r.elapsedSec > 0)
    } finally {
      scala.reflect.io.Directory(new java.io.File(scratch)).deleteRecursively()
      ()
    }
  }
}
