package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: injects the graft native
  * functions into every session built with
  *
  *   spark.sql.extensions=graft.functions.GraftExtensions
  *
  * — the deployment-grade alternative to the per-session
  * `NativeFunctions.register`/`MinHashSignature.register` calls (which
  * remain for ad-hoc sessions and tests). Injected functions resolve in
  * `spark.sql(...)` text and via `call_function`, on every session of
  * the cluster, with no per-session setup — on a 1000-executor
  * deployment this is the only registration path that survives session
  * cloning (e.g. thrift server, structured streaming restarts).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // same registry the per-session register() consumes — one list,
    // two registration paths, no drift
    NativeFunctions.registry.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage),
        (exprs: Seq[Expression]) => builder(exprs)))
    }
    // materialized-aggregate rewrite: a no-op map probe per Aggregate
    // until a summary is registered (MaterializedAgg.register)
    ext.injectOptimizerRule(_ => graft.plans.MaterializedAgg.Rewrite)
  }
}
