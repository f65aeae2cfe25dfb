package graft.enrich

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PARIS-style probabilistic instance alignment (reference
  * `thymeflow/src/main/com/thymeflow/enricher/entityresolution/
  * ParisEnricher.scala:189-275`, after Suchanek et al., "PARIS:
  * Probabilistic Alignment of Relations, Instances, and Schema", VLDB'12 —
  * public algorithm): iteratively estimate instance-equivalence
  * probabilities from shared statements, weighting evidence by the inverse
  * functionality of each predicate, with probability products computed as
  * exp(sum(log ...)) — the LogNum discipline
  * (`mathematics/src/main/com/thymeflow/mathematics/LogNum.scala:10-171`)
  * done columnar.
  *
  * Each iteration is: candidate pairs from shared (p, o) evidence (an
  * equi-join, never a cross product) -> per-pair aggregate
  * 1 - Π(1 - invFun(p) · eqObj) -> threshold. Object equivalence feeds the
  * next round, so matches propagate through linked entities.
  */
object Paris {

  /** Inverse functionality per predicate: invFun(p) =
    * #distinct objects of p / #(s,o) statements of p — a predicate whose
    * value pins down its subject (email) scores near 1; a broad one
    * (country) near 0. */
  def inverseFunctionality(statements: DataFrame): DataFrame =
    statements.select("s", "p", "o").distinct() // duplicated assertions are not extra evidence
      .groupBy("p")
      .agg((countDistinct(col("o")).cast("double") / count(lit(1))).as("inv_fun"))

  /** @param left  statements (s, p, o) of the first instance set
    * @param right statements (s, p, o) of the second
    * @param iterations fixpoint rounds (reference default 10)
    * @return (s1, s2, prob) alignment probabilities >= threshold */
  def align(
      left: DataFrame,
      right: DataFrame,
      iterations: Int = 10,
      threshold: Double = 0.5): DataFrame = {
    val spark = left.sparkSession
    val all = left.unionByName(right)
    val invFun = broadcast(inverseFunctionality(all))

    // literal-equality seeds: objects equal as terms have eqObj = 1
    def round(objEq: Option[DataFrame]): DataFrame = {
      val l = left.alias("l")
      val r = right.alias("r")
      // evidence rows: statements agreeing on p with equivalent objects
      val direct = l.join(r, col("l.p") === col("r.p") && col("l.o") === col("r.o"))
        .select(col("l.s").as("s1"), col("r.s").as("s2"), col("l.p").as("p"),
          lit(1.0).as("eq_obj"))
      val viaEq = objEq match {
        case Some(eq) =>
          l.join(eq.alias("e"), col("l.o") === col("e.s1"))
            .join(r, col("l.p") === col("r.p") && col("r.o") === col("e.s2"))
            .select(col("l.s").as("s1"), col("r.s").as("s2"), col("l.p").as("p"),
              col("e.prob").as("eq_obj"))
        case None => direct.limit(0)
      }
      direct.unionByName(viaEq)
        .join(invFun, Seq("p"))
        // per pair: prob = 1 - Π (1 - invFun·eqObj), product via sum of logs
        .groupBy(col("s1"), col("s2"))
        .agg((lit(1.0) - exp(sum(log(
          greatest(lit(1e-12), lit(1.0) - col("inv_fun") * col("eq_obj"))))))
          .as("prob"))
    }

    var eq = round(None).where(col("prob") >= threshold).localCheckpoint()
    for (_ <- 2 to iterations) {
      eq = round(Some(eq)).where(col("prob") >= threshold).localCheckpoint()
    }
    eq
  }
}
