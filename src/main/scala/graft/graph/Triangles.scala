package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed triangle counting via degree-ordered edge orientation
  * (the MPS / "compact-forward" scheme: Latapy, TCS 2008; Suri &
  * Vassilvitskii, WWW 2011). Each undirected edge is oriented from the
  * endpoint that is smaller under the total order (degree, id); every
  * triangle then has exactly ONE vertex with out-degree 2 within it, so
  * enumerating wedges around out-neighbors and closing them against the
  * oriented edge list counts each triangle exactly once.
  *
  * Why orientation matters at scale: the naive wedge join fans out as
  * Σ deg(v)² — a single celebrity vertex with degree 10⁷ yields 10¹⁴
  * wedges. Orienting by degree caps every out-degree at O(√m), so the
  * wedge volume is O(m^{3/2}) — the output-optimal bound — and the hub's
  * wedges are charged to its (many, low-degree) neighbors instead of to
  * the hub's own partition: the skew never lands on one task.
  *
  * No global rank/sort is used anywhere: vertex order is compared as the
  * (degree, id) tuple directly, so the plan is three key-partitioned
  * joins + one aggregation, each shuffle-bounded by its inputs.
  */
object Triangles {

  /** Per-vertex triangle counts: one row (vertex, n_tri) per vertex that
    * closes at least one triangle. Input edges are taken as undirected;
    * duplicates, reversed duplicates, and self-loops are dropped. */
  def perVertex(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // und feeds the degree count AND the orientation join; oriented is
    // read three times (both wedge sides + the closing probe). Lazy
    // local checkpoints materialize each ONCE — without them every
    // reader re-executes the caller's whole edge derivation (q134's
    // edge list alone is a lineitem self-join + distinct-count; the
    // static plan showed it 3x).
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(false)

    val deg = und.select(col("u").as("x"))
      .unionAll(und.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d"))

    // (degree, id) total order decides direction; both endpoint degrees
    // ride along so downstream comparisons need no extra join.
    val withDeg = und
      .join(deg.select(col("x").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("d").as("dv")), "v")
    def ltTuple(d1: Column, v1: Column, d2: Column, v2: Column): Column =
      (d1 < d2) || (d1 === d2 && v1 < v2)
    val oriented = withDeg.select(
      when(ltTuple(col("du"), col("u"), col("dv"), col("v")),
        struct(col("u").as("s"), col("v").as("t"), col("dv").as("dt")))
        .otherwise(
          struct(col("v").as("s"), col("u").as("t"), col("du").as("dt")))
        .as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"), col("e.dt").as("dt"))
      .localCheckpoint(false)

    // Wedges around each source's out-neighborhood, ordered so the
    // closing edge — if present — is oriented a→b by construction.
    val wedges = oriented.alias("e1")
      .join(oriented.alias("e2"),
        col("e1.s") === col("e2.s") &&
          ltTuple(col("e1.dt"), col("e1.t"), col("e2.dt"), col("e2.t")))
      .select(col("e1.s").as("w"), col("e1.t").as("a"), col("e2.t").as("b"))

    val tris = wedges.join(oriented.alias("e3"),
      col("a") === col("e3.s") && col("b") === col("e3.t"))
      .select(col("w"), col("a"), col("b"))

    tris.select(explode(array(col("w"), col("a"), col("b"))).as("vertex"))
      .groupBy("vertex").agg(count(lit(1)).as("n_tri"))
  }
}
