package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftexpr.DotProduct

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
  }
}
