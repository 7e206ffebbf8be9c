package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftexpr.{BloomMightContainString, DotProduct}

/** Library packaging for the engine's custom expression surface: inject
  * `dot_product` into any session with
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * — no code-side `register()` call needed, SQL text and views can use
  * the function immediately, and the registration survives
  * `newSession()`. This is the standard out-of-tree extension path
  * (`SparkSessionExtensions.injectFunction`); `VectorFunctions.register`
  * remains for ad-hoc sessions created without the conf.
  *
  * Exercised end-to-end by `tools.ExtensionsSmoke` (own session with the
  * conf set) and wiring-checked by GraftExtensionsSpec.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"dot_product expects 2 arguments, got ${exprs.length}")
        DotProduct(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[BloomMightContainString].getName, "bloom_might_contain"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"bloom_might_contain expects 2 arguments, got ${exprs.length}")
        // the sketch rides the expression as a literal byte payload, so
        // SQL callers pass a foldable binary (e.g. a column-less literal
        // from a config table); per-row sketch args are not meaningful
        require(exprs(1).foldable,
          "bloom_might_contain expects a foldable BINARY sketch as argument 2")
        exprs(1).eval() match {
          case bytes: Array[Byte] => BloomMightContainString(exprs.head, bytes)
          case other => throw new IllegalArgumentException(
            s"bloom_might_contain sketch must be BINARY, got $other")
        }
      }))
  }
}
