package graft

import graft.functions.FloatDotProduct
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point: install with
  * `spark.sql.extensions=graft.GraftExtensions` (cluster config path)
  * to make the native expressions SQL-callable in every session built
  * from that config. `SqlMacros.install` registers the same functions
  * at runtime for an already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // declarative HOF dot products -> native codegen'd FloatDotProduct
    // (flag-gated per query: spark.graft.rewriteHofDot)
    ext.injectOptimizerRule(_ => graft.plans.RewriteHofDotProduct)
    // catalog-face graft scans: surface the manifest-true size the
    // V1ScanWrapper hides, as a conservative broadcast hint
    ext.injectOptimizerRule(_ => graft.plans.BroadcastFromManifest)
  }
}

object GraftExtensions {

  /** (identifier, info, builder) triples for every native expression. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_fdot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "graft_fdot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_fdot expects exactly 2 arguments")
        FloatDotProduct(exprs.head, exprs(1))
      }))
}
