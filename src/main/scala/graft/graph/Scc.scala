package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Strongly connected components of a DIRECTED graph — mutual
  * reachability, the directed sibling of [[GraphOps.connectedComponents]]
  * (which answers the undirected question): link-graph analysis (the
  * web's bow-tie structure, crawl-frontier cores), dependency-cycle
  * detection, and collapsing a graph to its acyclic condensation before
  * DAG-only algorithms. Output labels each vertex with the MINIMUM
  * member id of its SCC — deterministic on any engine and partitioning.
  *
  * Same adaptive shape as the components operator: a byte-gated driver
  * fast path (iterative Tarjan — one pass, exact) for graphs that fit
  * one machine, and a distributed forward-backward coloring loop
  * (Orzan/Slota-style) past the gate:
  *
  *   1. TRIM: vertices with no in- or no out-edge in the remaining
  *      graph are singleton SCCs — peeled iteratively (absorbs DAG
  *      tails and, round by round, trivial-SCC chains).
  *   2. COLOR: fixpoint `color(v) = min(v, colors of predecessors,
  *      color(color(v)))` — min id that can REACH v. The third term is
  *      pointer jumping (reachability is transitive), so chains
  *      converge in O(log diameter) rounds, the components-operator
  *      trick carried over.
  *   3. PEEL: for each root (`color(v) = v`), its SCC is the color-v
  *      vertices that can reach v — a backward fixpoint confined to
  *      each color class, all roots in parallel. Members are labeled
  *      and removed; repeat from 1.
  *
  * Rounds scale with the depth of the condensation DAG after min-id
  * collapse — small for real link graphs (bow-tie: a few giant layers),
  * linear only for adversarial trivial-SCC chains, which TRIM absorbs.
  * Every fixpoint table is localCheckpointed per round (bounded
  * lineage), and edges are re-confined by semi-joins so later rounds
  * shrink with the remaining graph.
  */
object Scc {

  /** Edges (src, dst), integral ids (dictionary-encode strings
    * upstream). Output: (id, scc) for every vertex appearing in any
    * edge, `scc` = min member id. */
  def decompose(edges: DataFrame, maxIterations: Int = 100,
      smallGraphThreshold: Long = 1000000,
      maxDriverBytes: Long = 256L << 20): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e0 = edges.select(col("src").cast("long"), col("dst").cast("long"))
    // driver fast path, gated on rows AND the collected heap footprint
    // (same 128 B/row budget as the components gate)
    val capL = math.min(
      math.min(smallGraphThreshold, Int.MaxValue.toLong - 2),
      maxDriverBytes / 128)
    val probe = e0.take((capL + 1).toInt)
    if (probe.length <= capL)
      return spark.createDataFrame(
        tarjan(probe.map(r => (r.getLong(0), r.getLong(1)))).toSeq)
        .toDF("id", "scc")

    var remaining = e0.distinct().localCheckpoint()
    var verts = remaining.select(col("src").as("id"))
      .union(remaining.select(col("dst").as("id")))
      .distinct().localCheckpoint()
    var done = spark.emptyDataset[(Long, Long)].toDF("id", "scc")

    var round = 0
    while (verts.take(1).nonEmpty && round < maxIterations) {
      round += 1
      // 1. trim loop: no-in or no-out vertices are singleton SCCs
      var trimming = true
      while (trimming && verts.take(1).nonEmpty) {
        val core = verts
          .join(remaining.select(col("src").as("id")), Seq("id"), "left_semi")
          .join(remaining.select(col("dst").as("id")), Seq("id"), "left_semi")
          .localCheckpoint()
        val trimmed = verts.join(core, Seq("id"), "left_anti")
        if (trimmed.take(1).isEmpty) trimming = false
        else {
          done = done.union(trimmed.select(col("id"), col("id").as("scc")))
            .localCheckpoint()
          verts = core
          remaining = remaining
            .join(verts.select(col("id").as("src")), Seq("src"), "left_semi")
            .join(verts.select(col("id").as("dst")), Seq("dst"), "left_semi")
            .localCheckpoint()
        }
      }
      if (verts.take(1).isEmpty) return done

      // 2. color fixpoint with pointer jumping
      var color = verts.withColumn("color", col("id")).localCheckpoint()
      var changed = true
      var iter = 0
      while (changed && iter < maxIterations) {
        iter += 1
        val viaEdge = remaining
          .join(color.withColumnRenamed("id", "src"), Seq("src"))
          .groupBy(col("dst").as("id")).agg(min(col("color")).as("c1"))
        val viaJump = color
          .join(color.select(col("id").as("color"),
            col("color").as("c2")), Seq("color"))
          .select(col("id"), col("c2"))
        val next = color
          .join(viaEdge, Seq("id"), "left")
          .join(viaJump, Seq("id"), "left")
          .select(col("id"), least(col("color"),
            coalesce(col("c1"), col("color")),
            coalesce(col("c2"), col("color"))).as("color"))
          .localCheckpoint()
        changed = next.alias("n")
          .join(color.alias("o"), Seq("id"))
          .where(col("n.color") =!= col("o.color"))
          .take(1).nonEmpty
        color = next
      }

      // 3. backward containment per color class, all roots in parallel
      var member = color.where(col("color") === col("id"))
        .select(col("id"), col("color").as("scc")).localCheckpoint()
      var growing = true
      while (growing) {
        val preds = remaining
          .join(member.withColumnRenamed("id", "dst"), Seq("dst"))
          .select(col("src").as("id"), col("scc"))
          .join(color, Seq("id"))
          .where(col("color") === col("scc"))
          .select(col("id"), col("scc"))
          .distinct()
        val fresh = preds.join(member, Seq("id"), "left_anti")
          .localCheckpoint()
        if (fresh.take(1).isEmpty) growing = false
        else member = member.union(fresh).localCheckpoint()
      }

      done = done.union(member).localCheckpoint()
      verts = verts.join(member, Seq("id"), "left_anti").localCheckpoint()
      remaining = remaining
        .join(verts.select(col("id").as("src")), Seq("src"), "left_semi")
        .join(verts.select(col("id").as("dst")), Seq("dst"), "left_semi")
        .localCheckpoint()
    }
    // safety: label anything left by itself (maxIterations exceeded)
    done.union(verts.select(col("id"), col("id").as("scc")))
  }

  /** Iterative Tarjan (explicit stacks — no recursion depth limit),
    * returning id -> min-member-id. Exposed for the spec's differential
    * check against the distributed path. */
  def tarjan(edgeList: Array[(Long, Long)]): Map[Long, Long] = {
    val ids = (edgeList.map(_._1) ++ edgeList.map(_._2)).distinct.sorted
    val idx = ids.zipWithIndex.toMap
    val n = ids.length
    val adj = Array.fill(n)(List.empty[Int])
    edgeList.foreach { case (s, d) => adj(idx(s)) ::= idx(d) }
    val index = Array.fill(n)(-1)
    val low = new Array[Int](n)
    val onStack = new Array[Boolean](n)
    val stack = scala.collection.mutable.ArrayBuffer[Int]()
    val comp = new Array[Int](n)
    var counter = 0
    var nComp = 0
    for (start <- 0 until n if index(start) < 0) {
      // work stack of (vertex, remaining adjacency)
      var work = List((start, adj(start)))
      index(start) = counter; low(start) = counter; counter += 1
      stack += start; onStack(start) = true
      while (work.nonEmpty) {
        val (v, rest) = work.head
        rest match {
          case w :: tail =>
            work = (v, tail) :: work.tail
            if (index(w) < 0) {
              index(w) = counter; low(w) = counter; counter += 1
              stack += w; onStack(w) = true
              work = (w, adj(w)) :: work
            } else if (onStack(w)) low(v) = math.min(low(v), index(w))
          case Nil =>
            work = work.tail
            work match {
              case (p, _) :: _ => low(p) = math.min(low(p), low(v))
              case Nil =>
            }
            if (low(v) == index(v)) {
              var done = false
              while (!done) {
                val w = stack.remove(stack.length - 1)
                onStack(w) = false
                comp(w) = nComp
                if (w == v) done = true
              }
              nComp += 1
            }
        }
      }
    }
    // scc label = min member id
    val minOf = new Array[Long](nComp)
    java.util.Arrays.fill(minOf, Long.MaxValue)
    for (i <- 0 until n) minOf(comp(i)) = math.min(minOf(comp(i)), ids(i))
    ids.indices.map(i => ids(i) -> minOf(comp(i))).toMap
  }
}
