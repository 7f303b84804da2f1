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
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two array<double>"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_intersect_count"),
      info("graft_intersect_count",
        "graft_intersect_count(a, b) - |A∩B| of two sorted arrays"),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_jaccard"),
      info("graft_jaccard",
        "graft_jaccard(a, b) - Jaccard similarity of two sorted distinct arrays"),
      (exprs: Seq[Expression]) => SortedJaccard(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_lsh_bits"),
      info("graft_lsh_bits",
        "graft_lsh_bits(v, nbits) - packed sign-bit LSH signature of array<double>"),
      (exprs: Seq[Expression]) => LshSignBits(exprs.head,
        exprs(1).eval().asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig",
        "graft_minhash_sig(token, k) - k-element MinHash signature aggregate"),
      (exprs: Seq[Expression]) => MinHashSignature(exprs.head,
        exprs(1).eval().asInstanceOf[Int])))
  }
}
