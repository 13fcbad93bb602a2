package graft

import graft.functions.{CosineSimExpr, Gunzip64Expr, Gzip64Expr, MinhashSigExpr, PolyFingerprintExpr, ShingleHashesExpr, Simhash63Expr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions registering graft's native expressions as SQL
  * functions, so `spark.sql("... graft_cosine(a, b) ...")` works anywhere
  * the DataFrame API does. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.WindowTopKRule)
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimExpr].getName, "graft_cosine"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimExpr(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShingleHashesExpr].getName, "graft_shingles"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ShingleHashesExpr(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[Simhash63Expr].getName, "graft_simhash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Simhash63Expr(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinhashSigExpr].getName, "graft_minhash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinhashSigExpr(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[PolyFingerprintExpr].getName, "graft_fingerprint"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PolyFingerprintExpr(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_gzip64"),
      new ExpressionInfo(classOf[Gzip64Expr].getName, "graft_gzip64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Gzip64Expr(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_gunzip64"),
      new ExpressionInfo(classOf[Gunzip64Expr].getName, "graft_gunzip64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Gunzip64Expr(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_winnow_fps"),
      new ExpressionInfo(classOf[graft.functions.WinnowFpsExpr].getName, "graft_winnow_fps"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 3)
          throw new IllegalArgumentException(
            s"graft_winnow_fps(text, w, k) takes 3 arguments, got ${children.length}")
        // window sizes must be compile-time constants: they fix the
        // deque bound the codegen emits
        def lit(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
          e match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"graft_winnow_fps(text, w, k): w/k must be integer literals, got $other")
          }
        graft.functions.WinnowFpsExpr(children.head, lit(children(1)), lit(children(2)))
      }))
  }
}
