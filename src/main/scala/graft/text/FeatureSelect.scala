package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Chi-square feature selection over document terms — the classic
  * term/class association test used to pick classifier vocabulary
  * (and, in a curation pipeline, to surface the terms that most
  * distinguish one source/domain from the rest before fitting a
  * quality or domain classifier on hashed features).
  *
  * For each term, form the 2×2 presence contingency table against a
  * binary document class:
  *
  *   a = class docs containing the term,   b = other docs containing it,
  *   c = class docs without it,            d = other docs without it,
  *
  * and score `chi2 = N(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))`.
  *
  * The statistic is a ratio of integers, so it is computed EXACTLY in
  * centi-units with `decimal(38,0)` intermediates (`100·N·(ad−bc)²`
  * tops out near 10²¹ at web scale — past int64, far inside decimal38)
  * and an integral `div` — bit-identical on any engine, same rationale
  * as the KS/TVD/meanAD family. Degenerate margins (a term present in
  * every document, or a class spanning all docs) make a zero
  * denominator; those rows carry no signal and are dropped.
  *
  * Scale shape: one explode → distinct (doc, term) shuffle, one
  * per-term count aggregation, and a one-row totals broadcast. No
  * per-class shuffle of the corpus.
  */
object FeatureSelect {

  /** Per-term presence contingency counts and exact chi2 (centi-units)
    * against `positive` (a boolean document-class predicate).
    * Output: (term, a, b, c, d, chi2_centi). */
  def chiSquare(docs: DataFrame, idCol: String, textCol: String,
      positive: Column): DataFrame = {
    val flagged = docs.select(col(idCol).as("_doc"),
      col(textCol).as("_text"), positive.cast("int").as("_pos"))
    val docTerm = flagged
      .select(col("_doc"), col("_pos"),
        explode(split(col("_text"), " ")).as("term"))
      .where(col("term") =!= "")
      .distinct()
    val counts = docTerm.groupBy("term").agg(
      sum(col("_pos")).cast("long").as("a"),
      sum(lit(1) - col("_pos")).cast("long").as("b"))
    val totals = flagged.agg(
      count(lit(1)).cast("long").as("_n"),
      sum(col("_pos")).cast("long").as("_npos"))
    counts.crossJoin(broadcast(totals))
      .withColumn("c", col("_npos") - col("a"))
      .withColumn("d", col("_n") - col("_npos") - col("b"))
      .where(col("a") + col("b") > 0 && col("c") + col("d") > 0 &&
        col("_npos") > 0 && col("_n") - col("_npos") > 0)
      // every product promotes to decimal BEFORE multiplying: a*d, b*c
      // and (a+b)*(c+d) typed BIGINT would wrap silently past ~3e9×3e9
      // docs, exactly the web-scale counts decimal38 is here to protect
      .withColumn("chi2_centi", expr(
        """(cast(100 as decimal(38,0)) * _n
          |   * (cast(a as decimal(38,0))*d - cast(b as decimal(38,0))*c)
          |   * (cast(a as decimal(38,0))*d - cast(b as decimal(38,0))*c))
          | div ((cast(a as decimal(38,0)) + b) * (cast(c as decimal(38,0)) + d)
          |       * cast(_npos as decimal(38,0)) * (_n - _npos))""".stripMargin))
      .select(col("term"), col("a"), col("b"), col("c"), col("d"),
        col("chi2_centi").cast("long").as("chi2_centi"))
  }
}
