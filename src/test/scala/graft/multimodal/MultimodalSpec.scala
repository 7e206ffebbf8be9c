package graft.multimodal

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {

  test("binary plumbing: blob bytes round-trip the text") {
    import spark.implicits._
    val df = Multimodal.withBlob(Seq((1L, "hello world")).toDF("doc_id", "text"))
    val row = df.head()
    assert(new String(row.getAs[Array[Byte]]("blob"), "UTF-8") == "hello world")
    assert(row.getAs[org.apache.spark.sql.Row]("media_meta").getAs[Int]("n_bytes") == 11)
  }

  test("stubbed decode emits deterministic schema'd features") {
    val feats = Multimodal.features.run(spark, sf0001)
    assert(feats.columns.toSeq == Seq("doc_id", "width", "height", "channels", "mean_byte"))
    assert(feats.count() == 500)
    assert(feats.filter(col("channels") =!= 3).count() == 0)
    // determinism: same input → same features
    val a = feats.collect().map(_.toSeq)
    val b = Multimodal.features.run(spark, sf0001).collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("frame sampling strides the blob") {
    val frames = Multimodal.frames.run(spark, sf0001)
    assert(frames.count() > 0)
    assert(frames.filter(col("frame_idx") > 3).count() == 0)
  }
}
