package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSessionExtensions

/** Wiring check for the extensions class (the end-to-end path — a fresh
  * session with `spark.sql.extensions` set — needs its own JVM and is
  * covered by `tools.ExtensionsSmoke`; extensions cannot re-apply to
  * the suite's already-created shared session). */
class GraftExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions applies cleanly and builds the expression") {
    new GraftExtensions().apply(new SparkSessionExtensions)
  }

  private def builders: Map[String,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression] = {
    var built = Map.empty[String,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression]
    val capture = new SparkSessionExtensions {
      override def injectFunction(fd: FunctionDescription): Unit = {
        built += fd._1.funcName -> fd._3
        super.injectFunction(fd)
      }
    }
    new GraftExtensions().apply(capture)
    built
  }

  test("injected builder arity-checks and constructs DotProduct") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val b = builders("dot_product")
    val e = b(Seq(Literal(Array(1.0, 2.0)), Literal(Array(3.0, 4.0))))
    assert(e.isInstanceOf[org.apache.spark.sql.graftexpr.DotProduct])
    assertThrows[IllegalArgumentException](b(Seq(Literal(1))))
  }

  test("injected bloom builder requires a foldable binary sketch") {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Literal}
    import org.apache.spark.sql.types.{BinaryType, StringType}
    val b = builders("bloom_might_contain")
    val bf = org.apache.spark.util.sketch.BloomFilter.create(16, 0.01)
    bf.putString("k")
    val bytes = org.apache.spark.sql.graftexpr.BloomFunctions.toBytes(bf)
    val e = b(Seq(Literal.create("k", StringType), Literal.create(bytes, BinaryType)))
    assert(e.isInstanceOf[org.apache.spark.sql.graftexpr.BloomMightContainString])
    // non-foldable sketch argument is rejected at build time
    assertThrows[IllegalArgumentException](b(Seq(
      Literal.create("k", StringType),
      AttributeReference("sketch", BinaryType)())))
    assertThrows[IllegalArgumentException](b(Seq(Literal.create("k", StringType))))
  }
}
