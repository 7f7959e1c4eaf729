package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Spark extensions entry point: registers graft's native expressions at
  * session build time, so a cluster deploy enables them with
  *
  * {{{
  * spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  *
  * and plain SQL can call `graft_dot(a, b)` / `graft_l2norm(a)` with no
  * code. [[VectorExprs.register]] remains the in-process equivalent for
  * sessions built without the config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[VectorExprs.DotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VectorExprs.DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_l2norm"),
      new ExpressionInfo(classOf[VectorExprs.L2Norm].getName, "graft_l2norm"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VectorExprs.L2Norm(exprs(0))))
  }
}
