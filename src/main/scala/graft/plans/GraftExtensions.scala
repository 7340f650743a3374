package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.Bridge

import graft.functions.{DeflateRatioExpr, DotProduct, FreqBoundExpr,
  FreqItemsAgg, FreqMergeAgg, JaroWinklerExpr,
  KllDoublesAgg, KllMergeAgg, KllQuantileExpr, KllRankExpr,
  MinHashBands64Expr, NfcNormalizeExpr, SimHash60Expr, ThetaBound,
  ThetaEstimate, ThetaSetEstimate, ThetaSketchAgg, ThetaUnionAgg, TopKAgg}

/** The library's SQL surface for its native Catalyst expressions —
  * `SparkSessionExtensions` so a user session built with
  * `.withExtensions(GraftExtensions)` (or
  * `spark.sql.extensions=graft.plans.GraftExtensions`) can call them
  * from plain SQL, plus [[registerAll]] for sessions the library is
  * handed after construction (Verify/Bench, notebooks).
  *
  * This is rung (c) of the extension ladder the engine uses: compose
  * built-ins where possible (ColFns), drop to a native codegen
  * `Expression` where per-row cost dominates (SimHash60Expr,
  * MinHashBands64Expr, DotProduct), and register those through the
  * public extension point so the SQL-only user gets the same
  * operators the DataFrame API has. */
object GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (name, info, builder) for every exposed native expression. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_simhash60"),
      new ExpressionInfo(classOf[SimHash60Expr].getName, "graft_simhash60"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_simhash60(tokens: array<string>)")
        SimHash60Expr(args.head)
      }),
    (FunctionIdentifier("graft_minhash_bands"),
      new ExpressionInfo(classOf[MinHashBands64Expr].getName,
        "graft_minhash_bands"),
      (args: Seq[Expression]) => args match {
        case Seq(sh) => MinHashBands64Expr(sh, 32, 8)
        case Seq(sh, k, b) =>
          MinHashBands64Expr(sh, intLit(k, "k"), intLit(b, "bands"))
        case _ => throw new IllegalArgumentException(
          "graft_minhash_bands(shingles[, k, bands])")
      }),
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot(a: array<float>, b: array<float>)")
        DotProduct(args(0), args(1))
      }),
    (FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName, "graft_nfc"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_nfc(s: string)")
        NfcNormalizeExpr(args.head)
      }),
    (FunctionIdentifier("graft_deflate_ratio"),
      new ExpressionInfo(classOf[DeflateRatioExpr].getName,
        "graft_deflate_ratio"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_deflate_ratio(s: string)")
        DeflateRatioExpr(args.head)
      }),
    // sketch aggregates return the AggregateFunction directly — the
    // analyzer wraps resolved AggregateFunctions in AggregateExpression
    // (same contract as Spark's own hll_sketch_agg registry row)
    (FunctionIdentifier("graft_theta_agg"),
      new ExpressionInfo(classOf[ThetaSketchAgg].getName, "graft_theta_agg"),
      (args: Seq[Expression]) => args match {
        case Seq(key) => ThetaSketchAgg(key)
        case Seq(key, lgk) =>
          ThetaSketchAgg(key, intLit(lgk, "lgNomEntries"))
        case _ => throw new IllegalArgumentException(
          "graft_theta_agg(key[, lgNomEntries])")
      }),
    (FunctionIdentifier("graft_theta_union_agg"),
      new ExpressionInfo(classOf[ThetaUnionAgg].getName,
        "graft_theta_union_agg"),
      (args: Seq[Expression]) => args match {
        case Seq(sk) => ThetaUnionAgg(sk)
        case Seq(sk, lgk) => ThetaUnionAgg(sk, intLit(lgk, "lgNomEntries"))
        case _ => throw new IllegalArgumentException(
          "graft_theta_union_agg(sketch[, lgNomEntries])")
      }),
    (FunctionIdentifier("graft_theta_estimate"),
      new ExpressionInfo(classOf[ThetaEstimate].getName,
        "graft_theta_estimate"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_theta_estimate(sketch)")
        ThetaEstimate(args.head)
      }),
    (FunctionIdentifier("graft_theta_lb"),
      new ExpressionInfo(classOf[ThetaBound].getName, "graft_theta_lb"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_theta_lb(sketch, numStdDev)")
        ThetaBound(args(0), intLit(args(1), "numStdDev"), upper = false)
      }),
    (FunctionIdentifier("graft_theta_ub"),
      new ExpressionInfo(classOf[ThetaBound].getName, "graft_theta_ub"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_theta_ub(sketch, numStdDev)")
        ThetaBound(args(0), intLit(args(1), "numStdDev"), upper = true)
      }),
    (FunctionIdentifier("graft_theta_intersect_est"),
      new ExpressionInfo(classOf[ThetaSetEstimate].getName,
        "graft_theta_intersect_est"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_theta_intersect_est(a, b)")
        ThetaSetEstimate(args(0), args(1), intersect = true)
      }),
    (FunctionIdentifier("graft_theta_anotb_est"),
      new ExpressionInfo(classOf[ThetaSetEstimate].getName,
        "graft_theta_anotb_est"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_theta_anotb_est(a, b)")
        ThetaSetEstimate(args(0), args(1), intersect = false)
      }),
    (FunctionIdentifier("graft_kll_agg"),
      new ExpressionInfo(classOf[KllDoublesAgg].getName, "graft_kll_agg"),
      (args: Seq[Expression]) => args match {
        case Seq(x) => KllDoublesAgg(x)
        case Seq(x, k) => KllDoublesAgg(x, intLit(k, "k"))
        case _ => throw new IllegalArgumentException("graft_kll_agg(x[, k])")
      }),
    (FunctionIdentifier("graft_kll_merge_agg"),
      new ExpressionInfo(classOf[KllMergeAgg].getName, "graft_kll_merge_agg"),
      (args: Seq[Expression]) => args match {
        case Seq(sk) => KllMergeAgg(sk)
        case Seq(sk, k) => KllMergeAgg(sk, intLit(k, "k"))
        case _ => throw new IllegalArgumentException(
          "graft_kll_merge_agg(sketch[, k])")
      }),
    (FunctionIdentifier("graft_kll_quantile"),
      new ExpressionInfo(classOf[KllQuantileExpr].getName,
        "graft_kll_quantile"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_kll_quantile(sketch, q)")
        KllQuantileExpr(args(0), args(1))
      }),
    (FunctionIdentifier("graft_kll_rank"),
      new ExpressionInfo(classOf[KllRankExpr].getName, "graft_kll_rank"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_kll_rank(sketch, v)")
        KllRankExpr(args(0), args(1))
      }),
    (FunctionIdentifier("graft_freq_agg"),
      new ExpressionInfo(classOf[FreqItemsAgg].getName, "graft_freq_agg"),
      (args: Seq[Expression]) => args match {
        case Seq(item) => FreqItemsAgg(item)
        case Seq(item, m) => FreqItemsAgg(item, intLit(m, "maxMapSize"))
        case _ => throw new IllegalArgumentException(
          "graft_freq_agg(item[, maxMapSize])")
      }),
    (FunctionIdentifier("graft_freq_merge_agg"),
      new ExpressionInfo(classOf[FreqMergeAgg].getName,
        "graft_freq_merge_agg"),
      (args: Seq[Expression]) => args match {
        case Seq(sk) => FreqMergeAgg(sk)
        case Seq(sk, m) => FreqMergeAgg(sk, intLit(m, "maxMapSize"))
        case _ => throw new IllegalArgumentException(
          "graft_freq_merge_agg(sketch[, maxMapSize])")
      }),
    (FunctionIdentifier("graft_freq_lb"),
      new ExpressionInfo(classOf[FreqBoundExpr].getName, "graft_freq_lb"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_freq_lb(sketch, item)")
        FreqBoundExpr(args(0), args(1), 0)
      }),
    (FunctionIdentifier("graft_freq_estimate"),
      new ExpressionInfo(classOf[FreqBoundExpr].getName,
        "graft_freq_estimate"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_freq_estimate(sketch, item)")
        FreqBoundExpr(args(0), args(1), 1)
      }),
    (FunctionIdentifier("graft_freq_ub"),
      new ExpressionInfo(classOf[FreqBoundExpr].getName, "graft_freq_ub"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_freq_ub(sketch, item)")
        FreqBoundExpr(args(0), args(1), 2)
      }),
    (FunctionIdentifier("graft_topk_agg"),
      new ExpressionInfo(classOf[TopKAgg].getName, "graft_topk_agg"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_topk_agg(expr, k)")
        TopKAgg(args(0), intLit(args(1), "k"))
      }),
    (FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerExpr].getName,
        "graft_jaro_winkler"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_jaro_winkler(a, b)")
        JaroWinklerExpr(args(0), args(1))
      }))

  /** Session-build-time path (`.withExtensions(GraftExtensions)`). */
  override def apply(e: SparkSessionExtensions): Unit = {
    functions.foreach { case (id, info, builder) =>
      e.injectFunction((id, info, builder))
    }
    // rung (c): the opt-in approximate-distinct optimizer rule —
    // dormant until spark.graft.approxDistinct=true
    e.injectOptimizerRule(_ => ApproxDistinctRule)
  }

  /** Post-construction path: light up the SQL names on an existing
    * session (idempotent — re-registration replaces the same builder). */
  def registerAll(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      Bridge.registerFunction(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
        id.funcName, info, builder)
    }
}
