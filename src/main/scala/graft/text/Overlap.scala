package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Modified n-gram precision (the BLEU numerator) between paired
  * candidate/reference texts — the corpus-scale shape of generation
  * evaluation: score a model's outputs against references, or a
  * rewritten/decontaminated corpus against its originals, millions of
  * pairs at a time. `p_n = Σ_g min(count_cand(g), count_ref(g)) /
  * Σ_g count_cand(g)` with counts CLIPPED at the reference count, so
  * a candidate repeating one reference word does not score 1.0.
  *
  * Exact rationals reported in ppm (`1e6·hit div total`) — no floats,
  * bit-identical anywhere. The geometric-mean/brevity-penalty BLEU
  * roll-up is a two-float postprocess the caller can apply; the
  * engine-side work is the clipped-count join, and that is what needs
  * to scale.
  *
  * Scale shape: ONE scan — both sides' n-grams explode from the same
  * row as (gram, side) pairs — one (pair, gram) shuffle with map-side
  * combine (hot grams split fine because the pair id is in the key),
  * and a per-pair sum. No join between the sides, no text moves after
  * the explode; total work is O(tokens).
  */
object Overlap {

  /** Per-pair clipped n-gram overlap. Input must carry (idCol,
    * candCol, refCol); output is (idCol, hit, tot, p_ppm) with
    * `p_ppm = 1e6·hit div tot` exact. Pairs whose candidate has fewer
    * than `n` tokens have tot = 0 and are dropped (no n-grams to
    * score — BLEU's smoothing question, left to the caller). */
  def modifiedPrecision(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String, n: Int): DataFrame = {
    require(n >= 1, "n-gram order must be >= 1")
    def grams(c: String) =
      if (n == 1) split(col(c), " ")
      // guard short texts: sequence(0, neg) would count DOWN, not empty
      else expr(s"""case when size(split($c, ' ')) < $n then array()
        | else transform(sequence(0, size(split($c, ' ')) - $n),
        |   i -> concat_ws(' ', slice(split($c, ' '), i + 1, $n))) end""".stripMargin)
    // both sides leave the row through one explode of a tagged union,
    // so the candidate/reference alignment needs no join at all:
    // grams only in the reference have cc = 0 and contribute nothing
    val tagged = pairs.select(col(idCol), explode(concat(
        transform(grams(candCol), g => struct(g.as("g"), lit(1).as("c"))),
        transform(grams(refCol), g => struct(g.as("g"), lit(0).as("c")))))
      .as("t"))
    tagged
      .groupBy(col(idCol), col("t.g"))
      .agg(sum(col("t.c")).as("cc"), sum(lit(1) - col("t.c")).as("rc"))
      .groupBy(col(idCol))
      .agg(sum(least(col("cc"), col("rc"))).as("hit"),
        sum(col("cc")).as("tot"))
      .where(col("tot") > 0)
      .select(col(idCol), col("hit").cast("long").as("hit"),
        col("tot").cast("long").as("tot"),
        expr("(1000000 * hit) div tot").as("p_ppm"))
  }
}
