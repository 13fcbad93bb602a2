package graft

import graft.functions.{CosineSimExpr, Gunzip64Expr, Gzip64Expr, MinhashSigExpr, PolyFingerprintExpr, ShingleHashesExpr, Simhash63Expr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions registering graft's native expressions as SQL
  * functions, so `spark.sql("... graft_cosine(a, b) ...")` works anywhere
  * the DataFrame API does — plus TABLE functions for the top production
  * operators, so a pure-SQL user can drive the engine end-to-end
  * (`SELECT * FROM graft_clean_corpus('/data/corpus')`). Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.types.StringType

  /** A table function over literal arguments: the builder runs at
    * resolution time on the driver, constructs the operator's DataFrame
    * against the ACTIVE session, and splices its analyzed plan into the
    * outer query — so the SQL surface gets exactly the Scala surface's
    * plan (pushdown, hints, native expressions included), never a
    * re-implementation.
    *
    * Arity is a RANGE (round 12): trailing arguments are the operator's
    * tuning knobs with the Scala surface's defaults, so a pure-SQL user
    * can tune k/caps/thresholds without leaving SQL
    * (`graft_filtered_knn('/data', 5)`). Literals only — the values
    * parameterize plan CONSTRUCTION (a knob is a plan shape decision,
    * not a runtime column). Integer literals arrive as Int/Long,
    * fractional ones as Decimal/Double; [[TvfArgs]] normalizes. */
  private def tvf(name: String, usage: String, minArity: Int, maxArity: Int)(
      build: (SparkSession, TvfArgs) => org.apache.spark.sql.DataFrame)
    : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      (args: Seq[Expression]) => {
        if (args.length < minArity || args.length > maxArity)
          throw new IllegalArgumentException(
            s"$name takes $minArity to $maxArity literal argument(s) — " +
              s"$usage — got ${args.length}")
        val vals = args.map {
          case Literal(v, StringType) if v != null => v.toString
          case Literal(v: java.lang.Integer, _) => v
          case Literal(v: java.lang.Long, _) => v
          case Literal(v: org.apache.spark.sql.types.Decimal, _) => v
          case Literal(v: java.lang.Double, _) => v
          case other => throw new IllegalArgumentException(
            s"$name arguments must be string/integer/decimal literals ($usage), got $other")
        }
        build(SparkSession.active, new TvfArgs(name, usage, vals)).queryExecution.analyzed
      })

  /** Positional literal accessors with Scala-surface defaults. */
  private final class TvfArgs(name: String, usage: String, vals: Seq[Any]) {
    def str(i: Int): String = vals(i) match {
      case s: String => s
      case other => throw new IllegalArgumentException(
        s"$name argument ${i + 1} must be a string literal ($usage), got $other")
    }
    def int(i: Int, default: Int): Int =
      if (i >= vals.length) default
      else vals(i) match {
        case v: java.lang.Integer => v.intValue
        case v: java.lang.Long if v.longValue.isValidInt => v.intValue
        case other => throw new IllegalArgumentException(
          s"$name argument ${i + 1} must be an integer literal ($usage), got $other")
      }
    def long(i: Int, default: Long): Long =
      if (i >= vals.length) default
      else vals(i) match {
        case v: java.lang.Integer => v.longValue
        case v: java.lang.Long => v.longValue
        case other => throw new IllegalArgumentException(
          s"$name argument ${i + 1} must be an integer literal ($usage), got $other")
      }
    def dbl(i: Int, default: Double): Double =
      if (i >= vals.length) default
      else vals(i) match {
        case v: java.lang.Integer => v.doubleValue
        case v: java.lang.Long => v.doubleValue
        case v: java.lang.Double => v.doubleValue
        case v: org.apache.spark.sql.types.Decimal => v.toDouble
        case other => throw new IllegalArgumentException(
          s"$name argument ${i + 1} must be a numeric literal ($usage), got $other")
      }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.WindowTopKRule)
    // ───── SQL table functions: the operator library for pure-SQL users ─────
    Seq(
      tvf("graft_clean_corpus",
        "graft_clean_corpus(corpusDir[, minTokens, minQuality])", 1, 3)(
        (s, a) => operators.Pipelines.cleanCorpus(s, a.str(0),
          operators.Pipelines.CleanLangs,
          a.int(1, operators.Pipelines.CleanMinTokens),
          a.dbl(2, operators.Pipelines.CleanMinQuality))),
      tvf("graft_filtered_knn", "graft_filtered_knn(corpusDir[, k])", 1, 2)(
        (s, a) => operators.Similarity.s18FilteredKnn(s, a.str(0), a.int(1, 3))),
      tvf("graft_score_sample", "graft_score_sample(corpusDir)", 1, 1)(
        (s, a) => operators.Sampling.p13ScoreSample(s, a.str(0))),
      tvf("graft_knn_graph", "graft_knn_graph(corpusDir[, k])", 1, 2)(
        (s, a) => operators.Similarity.s19KnnGraph(s, a.str(0), a.int(1, 3))),
      tvf("graft_corpus_datasheet", "graft_corpus_datasheet(corpusDir)", 1, 1)(
        (s, a) => operators.Pipelines.p21CorpusDatasheet(s, a.str(0))),
      tvf("graft_release_datasheet",
        "graft_release_datasheet(corpusDir, workDir[, minTokens, minQuality, repairTau]) " +
          "— the staged p20 release's datasheet (knobs pinned in workDir)", 2, 5)(
        (s, a) => operators.Pipelines.p21ReleaseDatasheet(s, a.str(0), a.str(1),
          operators.Pipelines.P20Knobs(
            a.int(2, operators.Pipelines.CleanMinTokens),
            a.dbl(3, operators.Pipelines.CleanMinQuality),
            a.dbl(4, operators.Pipelines.RepairTau)))),
      tvf("graft_d18_probe",
        "graft_d18_probe(indexPath, arrivalsPath[, maxDf, batchMaxDf]) — " +
          "arrivals parquet needs (doc_id, text)", 2, 4)(
        (s, a) => operators.Dedup.d18FromIndex(s, a.str(0),
          s.read.parquet(a.str(1)).select(
            org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.col("text")),
          a.long(2, operators.Dedup.NoDfCap),
          a.long(3, operators.Dedup.NoDfCap))),
      // the one operator a data team most plausibly runs AD HOC ("is
      // MMLU in my corpus?") — d16's production entry made SQL-reachable
      // (r13): benchmark parquet needs (bench_id, text)
      tvf("graft_benchmark_decontam",
        "graft_benchmark_decontam(corpusDir, benchPath[, tau, bloomItems])", 2, 4)(
        (s, a) => operators.Dedup.d16BenchmarkDecontam(s, a.str(0),
          s.read.parquet(a.str(1)).select(
            org.apache.spark.sql.functions.col("bench_id"),
            org.apache.spark.sql.functions.col("text")),
          a.dbl(2, 0.3), a.long(3, 0L)))
    ).foreach(ext.injectTableFunction)
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
