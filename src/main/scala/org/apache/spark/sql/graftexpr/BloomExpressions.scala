package org.apache.spark.sql.graftexpr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst membership test against a pre-built
  * `org.apache.spark.util.sketch.BloomFilter`, with whole-stage codegen.
  *
  * This is the prefilter primitive for incremental-ingest dedup
  * (`dedup_incremental_bloom`): the historical corpus's fingerprint set
  * is tree-reduced into one Bloom filter on the driver, and the new
  * batch is filtered by this expression INSIDE the scan's codegen stage
  * — rows the filter rejects are guaranteed absent from history (Bloom
  * filters have no false negatives) and never reach a shuffle. Spark's
  * own runtime row-level filtering uses the same sketch via internal
  * expressions (`BloomFilterMightContain`); those are not part of the
  * public surface, hence this out-of-tree twin in the same
  * `org.apache.spark.sql` packaging as [[DotProduct]].
  *
  * The filter rides the generated code as a codegen reference object
  * (`ctx.addReferenceObj`), so each executor deserializes it once per
  * task-set, not per row. Null input → null result, matching built-in
  * predicate behavior.
  */
case class BloomMightContainString(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainString(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef =
      ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$bloomRef.mightContainString($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomFunctions {

  /** Serialize a Bloom filter to the byte form the expression carries. */
  def toBytes(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** membership test of a string column against a serialized Bloom
    * filter (codegen'd; no false negatives). */
  def bloom_might_contain(c: Column, bloomBytes: Array[Byte]): Column =
    ExpressionUtils.column(
      BloomMightContainString(ExpressionUtils.expression(c), bloomBytes))
}
