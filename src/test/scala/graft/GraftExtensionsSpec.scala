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

  test("injected builder arity-checks and constructs DotProduct") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val ext = new GraftExtensions
    // reuse the builder through a capturing extensions instance
    var built: Option[Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
      org.apache.spark.sql.catalyst.expressions.Expression] = None
    val capture = new SparkSessionExtensions {
      override def injectFunction(fd: FunctionDescription): Unit = {
        built = Some(fd._3)
        super.injectFunction(fd)
      }
    }
    ext.apply(capture)
    val b = built.get
    val e = b(Seq(Literal(Array(1.0, 2.0)), Literal(Array(3.0, 4.0))))
    assert(e.isInstanceOf[org.apache.spark.sql.graftexpr.DotProduct])
    assertThrows[IllegalArgumentException](b(Seq(Literal(1))))
  }
}
