package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed graph operators expressed as iterative DataFrame plans.
  *
  * The reference runs these in-memory on the driver
  * (`graph/src/main/com/thymeflow/graph/ConnectedComponents.scala:9-36` —
  * BFS over a neighbor function) which caps at driver heap. Here both
  * closure and components are semi-naive fixpoint loops over DataFrames:
  * each iteration is a shuffle join, lineage is cut with localCheckpoint so
  * plans stay O(1) deep, and convergence is detected with cheap counts.
  * At cluster scale the per-iteration joins shuffle-partition on the join
  * key and benefit from AQE; label propagation uses pointer-jumping so long
  * paths converge in O(log n) rounds, not O(n).
  */
object GraphOps {

  /** Re-alias every column so the plan's output attributes get fresh
    * expression ids. Unions of plans that share attribute ids (which happens
    * when both sides descend from the same localCheckpoint) trip Catalyst's
    * Union constraint rewriting — fresh aliases keep the children disjoint. */
  private def refreshed(df: DataFrame): DataFrame =
    df.select(df.columns.map(c => col(c).as(c)): _*)

  /** Transitive closure of a directed edge set (`src`, `dst`): all pairs
    * (a, b) such that b is reachable from a in >= 1 step. Semi-naive
    * evaluation: only the newly-discovered frontier is re-joined per round.
    * Mirrors SPARQL property-path `p*` semantics (SURVEY Q9/G2) minus the
    * reflexive pairs (add them trivially if needed).
    */
  def transitiveClosure(edges: DataFrame, maxIterations: Int = 50): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    var closure = e
    var frontier = e
    var i = 0
    var done = false
    while (!done && i < maxIterations) {
      val next = frontier.alias("f")
        .join(e.alias("e"), col("f.dst") === col("e.src"))
        .select(col("f.src").as("src"), col("e.dst").as("dst"))
        .distinct()
        .join(closure, Seq("src", "dst"), "left_anti")
        .localCheckpoint()
      if (next.isEmpty) done = true
      else {
        closure = refreshed(closure).union(refreshed(next)).localCheckpoint()
        frontier = next
      }
      i += 1
    }
    closure
  }

  /** Connected components of an undirected graph. Input `edges` (`src`,
    * `dst`), optional extra `vertices` (`id`) for isolated nodes. Output
    * (`id`, `component`) where component = min vertex id in the component.
    *
    * Min-label propagation plus a pointer-jumping step per round
    * (label := label-of-label), so path graphs converge in O(log n) rounds.
    */
  def connectedComponents(
      edges: DataFrame,
      vertices: Option[DataFrame] = None,
      maxIterations: Int = 50): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    val edgeVerts = sym.select(col("src").as("id")).distinct()
    val allVerts = vertices
      .map(v => edgeVerts.union(v.select(col("id"))).distinct())
      .getOrElse(edgeVerts)

    var labels = allVerts.withColumn("component", col("id")).localCheckpoint()
    var changed = true
    var i = 0
    while (changed && i < maxIterations) {
      val lookup = labels
        .select(col("id").as("cid"), col("component").as("ccomp"))
      def jump(df: DataFrame): DataFrame = df.alias("a")
        .join(lookup.alias("b"), col("a.component") === col("b.cid"), "left")
        .select(col("a.id").as("id"), col("a.old").as("old"),
          least(col("a.component"), coalesce(col("b.ccomp"), col("a.component")))
            .as("component"))
      val nbrMin = sym
        .join(labels, sym("dst") === labels("id"))
        .groupBy(sym("src").as("id"))
        .agg(min(col("component")).as("nmin"))
      val propagated = labels.alias("l")
        .join(nbrMin.alias("n"), Seq("id"), "left")
        .select(
          col("id"), col("l.component").as("old"),
          least(col("l.component"), coalesce(col("n.nmin"), col("l.component"))).as("component"))
      // two pointer-jump rounds (component := component-of-component) halve
      // long-path diameters faster; the carried `old` column makes the
      // convergence check a filter on the materialized result, not a join
      val next = jump(jump(propagated)).localCheckpoint()
      changed = !next.where(col("component") =!= col("old")).isEmpty
      labels = next.select(col("id"), col("component"))
      i += 1
    }
    labels
  }
}
