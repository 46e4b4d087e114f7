package graft.sql

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CoerceNumeric, DotProduct, HdrHistogram, KmvSketch, MinHashSignatures, MisraGries, PyToJson, SimHashFingerprint, SquaredL2, TopKBy, WinnowFingerprints, WordNgrams}

/** Engine extensions, installed via `spark.sql.extensions` (set by
  * [[graft.core.GraftSession]]): registers the native expressions so
  * they resolve by name in both the DataFrame API (`call_function`)
  * and SQL text.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("py_to_json"),
      new ExpressionInfo(classOf[PyToJson].getName, "py_to_json"),
      (children: Seq[Expression]) => PyToJson(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("coerce_numeric"),
      new ExpressionInfo(classOf[CoerceNumeric].getName, "coerce_numeric"),
      (children: Seq[Expression]) => CoerceNumeric(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (children: Seq[Expression]) => WinnowFingerprints(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("simhash_fingerprint"),
      new ExpressionInfo(classOf[SimHashFingerprint].getName, "simhash_fingerprint"),
      (children: Seq[Expression]) =>
        SimHashFingerprint(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("minhash_signatures"),
      new ExpressionInfo(classOf[MinHashSignatures].getName, "minhash_signatures"),
      (children: Seq[Expression]) =>
        MinHashSignatures(children.head, children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("squared_l2"),
      new ExpressionInfo(classOf[SquaredL2].getName, "squared_l2"),
      (children: Seq[Expression]) => SquaredL2(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      (children: Seq[Expression]) => WordNgrams(children.head, children(1))))
    def intLit(e: Expression, fn: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$fn k must be an INT literal, got $other")
    }
    ext.injectFunction((
      new FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketch].getName, "kmv_sketch"),
      (children: Seq[Expression]) =>
        KmvSketch(children.head, intLit(children(1), "kmv_sketch"))))
    ext.injectFunction((
      new FunctionIdentifier("topk_by"),
      new ExpressionInfo(classOf[TopKBy].getName, "topk_by"),
      (children: Seq[Expression]) =>
        TopKBy(children.head, children(1), intLit(children(2), "topk_by"))))
    ext.injectFunction((
      new FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[MisraGries].getName, "misra_gries"),
      (children: Seq[Expression]) =>
        MisraGries(children.head, intLit(children(1), "misra_gries"))))
    ext.injectFunction((
      new FunctionIdentifier("hdr_histogram"),
      new ExpressionInfo(classOf[HdrHistogram].getName, "hdr_histogram"),
      (children: Seq[Expression]) => HdrHistogram(children.head)))
    // v2 view-catalog SQL routing (vanilla 4.1 throws
    // MISSING_CATALOG_ABILITY for view DDL on non-session catalogs):
    // DDL is intercepted at PARSE time, reads by a resolution rule —
    // see GraftViewSupport
    ext.injectParser((session, delegate) =>
      new GraftViewSqlParser(session, delegate))
    ext.injectResolutionRule(session => GraftViewSubstitution(session))
    // conf-gated (spark.graft.rangeJoin.bucketWidth): rewrites non-equi
    // interval joins to bucketed equi joins — see RangeJoinRule
    ext.injectOptimizerRule(session => graft.plans.RangeJoinRule(session))
    // conf-gated (spark.graft.mv.specs): serves matching fact-table
    // aggregates from registered materialized rollups — see MvRewriteRule
    ext.injectOptimizerRule(session => graft.plans.MvRewriteRule(session))
    // stats-proven eager aggregation (partial agg pushed below a join
    // whose dim key is ANALYZE-verified unique and fingerprint-fresh);
    // opt-in per session: spark.graft.eagerAgg.enabled
    ext.injectOptimizerRule(session => graft.plans.EagerAggregation(session))
    // same opt-in + evidence: COUNT/SUM(DISTINCT x) collapse to their
    // non-distinct forms when x is PROVEN output-unique — composes
    // with the eager-agg pre-shrink to eliminate the multi-distinct
    // Expand entirely (see DistinctCollapse)
    ext.injectOptimizerRule(session => graft.plans.DistinctCollapse(session))
    // conf-gated (spark.graft.rangeJoin.broadcast): plans small-interval
    // range joins as the binary-search broadcast physical operator
    ext.injectPlannerStrategy(session =>
      new graft.plans.BroadcastRangeJoinStrategy(session))
  }
}
