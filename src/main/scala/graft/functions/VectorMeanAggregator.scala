package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` computing an element-wise mean
  * vector (centroid) — the third extension surface alongside the
  * native Catalyst expression (DotProduct) and mapPartitions kernels
  * (MinHash sketch): use an Aggregator when the state is a small
  * fixed-size buffer that merges associatively, because Spark then
  * runs it as a partial aggregation (map-side combine) — each
  * partition ships one (sum, count) buffer per group, not its rows.
  * That property is what makes a centroid over 100 TB of embeddings a
  * shuffle of kilobytes.
  */
class VectorMeanAggregator(dim: Int)
    extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.fill(dim)(0.0), 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    var i = 0
    val arr = b._1
    val n = math.min(dim, v.length)
    while (i < n) { arr(i) += v(i); i += 1 }
    (arr, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    var i = 0
    while (i < dim) { a._1(i) += b._1(i); i += 1 }
    (a._1, a._2 + b._2)
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.fill(dim)(0.0) else r._1.map(_ / r._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
