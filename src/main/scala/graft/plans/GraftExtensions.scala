package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{And, Expression, ExpressionInfo, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.{DurationMillis, Haversine}

/** Session extensions (`spark.sql.extensions=graft.plans.GraftExtensions`):
  * the engine's Catalyst integration point, mirroring the reference's
  * global FunctionRegistry additions (`core/src/main/com/thymeflow/rdf/
  * repository/RepositoryFactory.scala:248-251`) plus one optimizer rule.
  *
  * [[HaversineRadiusPrefilter]] rewrites `haversine_m(lat, lon, LAT0, LON0)
  * <= R` (literal anchor/radius) by conjoining a latitude band
  * `lat BETWEEN LAT0 ± R/earth` — a *necessary* condition of the distance
  * bound, so results are unchanged. When `lat` is a scan column the band is
  * a plain comparison that pushes into the parquet reader and prunes row
  * groups before any trigonometry runs — the classic bounding-box trick as
  * a `Rule[LogicalPlan]` (SURVEY §7.3's custom-Catalyst path).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("haversine_m"),
      new ExpressionInfo(classOf[Haversine].getName, "haversine_m"),
      (exprs: Seq[Expression]) => Haversine(exprs(0), exprs(1), exprs(2), exprs(3))))
    ext.injectFunction((
      FunctionIdentifier("duration_ms"),
      new ExpressionInfo(classOf[DurationMillis].getName, "duration_ms"),
      (exprs: Seq[Expression]) => DurationMillis(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[graft.functions.SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => graft.functions.SimHash64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("xxhash64_tokens"),
      new ExpressionInfo(classOf[graft.functions.TokenHashes].getName, "xxhash64_tokens"),
      (exprs: Seq[Expression]) => graft.functions.TokenHashes(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[graft.functions.WordShingles].getName, "word_shingles"),
      (exprs: Seq[Expression]) => graft.functions.WordShingles(exprs(0),
        exprs(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("word_window_hashes"),
      new ExpressionInfo(classOf[graft.functions.WordWindowHashes].getName,
        "word_window_hashes"),
      (exprs: Seq[Expression]) => graft.functions.WordWindowHashes(exprs(0),
        exprs(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[graft.functions.MinHashSigs].getName, "minhash_sigs"),
      (exprs: Seq[Expression]) => graft.functions.MinHashSigs(exprs(0),
        exprs(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[graft.functions.SortedIntersectSize].getName,
        "sorted_intersect_size"),
      (exprs: Seq[Expression]) => graft.functions.SortedIntersectSize(
        exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((
      FunctionIdentifier("sorted_no_common_below"),
      new ExpressionInfo(classOf[graft.functions.SortedNoCommonBelow].getName,
        "sorted_no_common_below"),
      (exprs: Seq[Expression]) => graft.functions.SortedNoCommonBelow(
        exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((
      FunctionIdentifier("simhash_md5"),
      new ExpressionInfo(classOf[graft.functions.Md5SimHash].getName, "simhash_md5"),
      (exprs: Seq[Expression]) => graft.functions.Md5SimHash(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("repetition_profile"),
      new ExpressionInfo(classOf[graft.functions.RepetitionProfile].getName,
        "repetition_profile"),
      (exprs: Seq[Expression]) => graft.functions.RepetitionProfile(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash_combo_keys"),
      new ExpressionInfo(classOf[graft.functions.SimHashComboKeys].getName,
        "simhash_combo_keys"),
      (exprs: Seq[Expression]) => graft.functions.SimHashComboKeys(exprs(0),
        exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("vincenty_m"),
      new ExpressionInfo(classOf[graft.functions.Vincenty].getName, "vincenty_m"),
      (exprs: Seq[Expression]) => graft.functions.Vincenty(
        exprs(0), exprs(1), exprs(2), exprs(3))))
    ext.injectFunction((
      FunctionIdentifier("geodesic_m"),
      new ExpressionInfo(classOf[graft.functions.GeodesicExact].getName, "geodesic_m"),
      (exprs: Seq[Expression]) => graft.functions.GeodesicExact(
        exprs(0), exprs(1), exprs(2), exprs(3))))
    ext.injectFunction((
      FunctionIdentifier("lang_id"),
      new ExpressionInfo(classOf[graft.text.LangIdExpr].getName, "lang_id"),
      (exprs: Seq[Expression]) => graft.text.LangIdExpr(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("soft_tfidf"),
      new ExpressionInfo(classOf[graft.functions.SoftTfIdfScore].getName, "soft_tfidf"),
      (exprs: Seq[Expression]) => graft.functions.SoftTfIdfScore(
        exprs(0), exprs(1), exprs(2), exprs(3),
        exprs(4).eval().asInstanceOf[Double], exprs(5).eval().asInstanceOf[Double])))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[graft.operators.BloomMightContain].getName,
        "bloom_might_contain"),
      (exprs: Seq[Expression]) => graft.operators.BloomMightContain(exprs(0),
        // bits arrive as a foldable array literal — unpacked ONCE at plan
        // time into the long[] the codegen references
        exprs(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toLongArray(),
        exprs(2).eval().asInstanceOf[Int])))
    def literalStrings(e: Expression): Seq[String] =
      e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
    ext.injectFunction((
      FunctionIdentifier("blocklist_any"),
      new ExpressionInfo(classOf[graft.text.BlocklistAny].getName, "blocklist_any"),
      (exprs: Seq[Expression]) =>
        graft.text.BlocklistAny(exprs(0), literalStrings(exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("blocklist_hits"),
      new ExpressionInfo(classOf[graft.text.BlocklistHits].getName, "blocklist_hits"),
      (exprs: Seq[Expression]) =>
        graft.text.BlocklistHits(exprs(0), literalStrings(exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("gopher_stats"),
      new ExpressionInfo(classOf[graft.functions.GopherStats].getName, "gopher_stats"),
      (exprs: Seq[Expression]) =>
        graft.functions.GopherStats(exprs(0), literalStrings(exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("quality_stats"),
      new ExpressionInfo(classOf[graft.functions.QualityStats].getName, "quality_stats"),
      (exprs: Seq[Expression]) =>
        graft.functions.QualityStats(exprs(0), literalStrings(exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("zorder_key"),
      new ExpressionInfo(classOf[graft.functions.ZOrderKey].getName, "zorder_key"),
      (exprs: Seq[Expression]) => graft.functions.ZOrderKey(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[graft.functions.WinnowFps].getName,
        "winnow_fps"),
      (exprs: Seq[Expression]) => graft.functions.WinnowFps(exprs(0),
        exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("linear_score"),
      new ExpressionInfo(classOf[graft.functions.LinearScore].getName,
        "linear_score"),
      (exprs: Seq[Expression]) => graft.functions.LinearScore(exprs(0),
        exprs(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toDoubleArray(),
        exprs(2).eval().asInstanceOf[Double])))
    ext.injectFunction((
      FunctionIdentifier("html_text"),
      new ExpressionInfo(classOf[graft.text.HtmlTextExpr].getName, "html_text"),
      (exprs: Seq[Expression]) => graft.text.HtmlTextExpr(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("unicode_nfc"),
      new ExpressionInfo(classOf[graft.functions.UnicodeNfc].getName, "unicode_nfc"),
      (exprs: Seq[Expression]) => graft.functions.UnicodeNfc(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("fold_marks"),
      new ExpressionInfo(classOf[graft.functions.FoldMarks].getName, "fold_marks"),
      (exprs: Seq[Expression]) => graft.functions.FoldMarks(exprs.head)))
    ext.injectOptimizerRule(_ => HaversineRadiusPrefilter)
    ext.injectOptimizerRule(_ => BinnedRangeJoinRewrite)
  }
}

object HaversineRadiusPrefilter extends Rule[LogicalPlan] {

  /** Conservative latitude half-band in degrees for a radius in meters:
    * the meridian arc is the shortest way to change latitude, padded 0.1%. */
  private def latBandDegrees(radiusMeters: Double): Double =
    math.toDegrees(radiusMeters / Haversine.EarthRadiusMeters) * 1.001

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** The two band conjuncts implied by one haversine-radius conjunct. */
  private def bandFor(conjunct: Expression): Seq[Expression] = conjunct match {
    case LessThanOrEqual(Haversine(lat, _, Literal(lat0: Double, DoubleType),
        Literal(_, DoubleType)), Literal(radius: Double, DoubleType)) =>
      val d = latBandDegrees(radius)
      Seq(GreaterThanOrEqual(lat, Literal(lat0 - d)), LessThanOrEqual(lat, Literal(lat0 + d)))
    case LessThan(Haversine(lat, _, Literal(lat0: Double, DoubleType),
        Literal(_, DoubleType)), Literal(radius: Double, DoubleType)) =>
      val d = latBandDegrees(radius)
      Seq(GreaterThanOrEqual(lat, Literal(lat0 - d)), LessThanOrEqual(lat, Literal(lat0 + d)))
    case _ => Seq.empty
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjuncts(cond)
      val wanted = conjuncts.flatMap(bandFor)
      // idempotent: only add band conjuncts not already present
      val missing = wanted.filterNot(b => conjuncts.exists(_.semanticEquals(b)))
      if (missing.isEmpty) f
      else Filter(And(missing.reduce(And), cond), child)
  }
}
