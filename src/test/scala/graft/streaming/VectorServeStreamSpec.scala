package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Stream ≡ batch for ANN serving: query vectors arriving across two
  * micro-batches get EXACTLY the batch `vector_ann_ivf_flat` answer —
  * same probe cells, same candidates, bit-identical cosines, same
  * tie-broken ranks. */
class VectorServeStreamSpec extends SparkSuite {

  test("streamed IVF top-k equals the batch ANN answer across two batches") {
    import spark.implicits._
    val expected = graft.operators.VectorSearch.annIvfFlat.run(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

    val in = java.nio.file.Files.createTempDirectory("graft-vserve")
    val scratch = java.nio.file.Files.createTempDirectory("graft-vservescratch")
    def addFile(pred: org.apache.spark.sql.Column, name: String): Unit = {
      val tmp = scratch.resolve(name)
      spark.read.parquet(s"$sf0001/embeddings.parquet").filter(pred)
        .coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, in.resolve(s"$name.parquet"))
    }
    try {
      val stream = graft.Tables.loadStream(
        spark, in.toString, "embeddings", s"$sf0001/embeddings.parquet")
      val q = VectorServeStream.serve(stream, sf0001)
        .writeStream.format("memory").queryName("vserve_out")
        .outputMode("append").start()
      try {
        addFile(col("vec_id") < 4, "b1")
        q.processAllAvailable()
        addFile(col("vec_id") >= 4 && col("vec_id") < 8, "b2")
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("vserve_out").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got == expected,
        s"served ${got.size} rows != batch ${expected.size}")
    } finally {
      new scala.reflect.io.Directory(in.toFile).deleteRecursively()
      new scala.reflect.io.Directory(scratch.toFile).deleteRecursively()
    }
  }
}
