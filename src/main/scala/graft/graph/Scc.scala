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
  * one machine, and a distributed divide-and-conquer loop (DCSC,
  * Coppersmith et al. 2003/2005; the Multistep refinement adds the trim)
  * past the gate. Round 8 shipped a min-label COLORING loop here; the
  * round-9 scc4M probe (100 chains × 10k ring-SCCs) proved that design
  * non-terminating in practice — coloring peels only the SCCs of the
  * graph's prefix-minima roots per round (≈ln n of them), so a deep
  * condensation chain needs Θ(n/ln n) rounds. DCSC with random pivots
  * splits every subproblem three ways per round instead, for expected
  * O(log n) rounds on exactly that shape:
  *
  *   1. TRIM: vertices with no in- or no out-edge inside their part are
  *      singleton SCCs — peeled iteratively (absorbs DAG tails and
  *      trivial-SCC chains).
  *   2. LABEL: every active part picks the pivot `m` = its minimum
  *      vertex under a fixed hash key (a uniformly random position, so
  *      splits balance regardless of id order). Two reach-min fixpoints
  *      run over ALL parts at once — B(v) = min key over vertices that
  *      reach v, F(v) = min key over vertices v reaches — each with
  *      pointer jumping (label(v) folds in label(label-owner(v)); min
  *      composes transitively), so they converge in O(log diameter)
  *      rounds, the components-operator trick carried over. Within a
  *      part, B(v) = key(m) iff m reaches v and F(v) = key(m) iff v
  *      reaches m, because m is the part's unique key-minimum.
  *   3. SPLIT: SCC(m) = { v : B(v) = F(v) = key(m) } is emitted (min
  *      member id as the label). The rest of the part moves to one of
  *      three NEW parts — descendants (B hit, F miss), ancestors (F
  *      hit, B miss), remainder (neither) — which all recurse in
  *      parallel as data. Any SCC not containing the pivot lies wholly
  *      inside one region (mutual reachability would otherwise route
  *      through m), so cross-region edges can be dropped.
  *
  * Every part loses at least its pivot's SCC per round, so termination
  * is unconditional; random pivots make the recursion quicksort-like.
  * Fixpoint tables are localCheckpointed per iteration (bounded
  * lineage) and the superseded checkpoint RDDs are unpersisted
  * immediately — a multi-hundred-iteration run holds O(1) generations
  * of state, not O(rounds).
  */
object Scc {

  /** Edges (src, dst), integral ids (dictionary-encode strings
    * upstream). Output: (id, scc) for every vertex appearing in any
    * edge, `scc` = min member id. `onRound` fires once per outer
    * divide-and-conquer round (probe instrumentation). */
  def decompose(edges: DataFrame, maxIterations: Int = 100,
      smallGraphThreshold: Long = 1000000,
      maxDriverBytes: Long = 256L << 20,
      onRound: Int => Unit = _ => ()): DataFrame = {
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

    val sc = spark.sparkContext
    // checkpoint bookkeeping: cp() returns the materialized frame plus
    // the persistent-RDD ids it pinned; free() drops a superseded
    // generation. Only ids WE pinned are ever freed, so concurrent
    // caches elsewhere in the session are untouched.
    def cp(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet.toSet
      // capped-stats checkpoint: this loop self-joins its state ~9 ways
      // per iteration, and Spark 4's origin-stats inheritance would
      // compound sizeInBytes estimates to millions of digits within ~8
      // iterations (BigInt stats math then dominates planning)
      val out = org.apache.spark.sql.GraftSparkInternals
        .localCheckpointCapped(df)
      (out, sc.getPersistentRDDs.keySet.toSet -- before)
    }
    def free(ids: Set[Int]): Unit = ids.foreach(i =>
      sc.getPersistentRDDs.get(i).foreach(_.unpersist(blocking = false)))

    // live state: intra-part edge list, (id, part) actives, emitted SCCs
    var (remaining, remainingIds) = cp(e0.distinct())
    var (verts, vertsIds) = cp(
      remaining.select(col("src").as("id"))
        .union(remaining.select(col("dst").as("id")))
        .distinct().withColumn("part", lit(0L)))
    var done = spark.emptyDataset[(Long, Long)].toDF("id", "scc")
    var doneIds = Set.empty[Int]

    var round = 0
    while (verts.take(1).nonEmpty && round < maxIterations) {
      round += 1
      onRound(round)

      // 1. trim loop: no-in or no-out vertices (within their part —
      // edges are already intra-part) are singleton SCCs. Trim is an
      // ACCELERATOR, not a correctness requirement — the label split
      // resolves trivial-SCC chains in O(log) rounds by prefix-minima
      // fragmentation — so it is capped per round: a deep DAG chain
      // would otherwise peel one layer per trim iteration (Θ(depth)
      // iterations, observed on a 100k-deep tendril probe).
      var trimming = true
      var trimIter = 0
      while (trimming && trimIter < 3 && verts.take(1).nonEmpty) {
        trimIter += 1
        val (core, coreIds) = cp(verts
          .join(remaining.select(col("src").as("id")), Seq("id"), "left_semi")
          .join(remaining.select(col("dst").as("id")), Seq("id"), "left_semi"))
        val trimmed = verts.join(core, Seq("id"), "left_anti")
        if (trimmed.take(1).isEmpty) { trimming = false; free(coreIds) }
        else {
          val (d2, dIds) = cp(done.union(
            trimmed.select(col("id"), col("id").as("scc"))))
          free(doneIds); done = d2; doneIds = dIds
          free(vertsIds); verts = core; vertsIds = coreIds
          val (r2, rIds) = cp(remaining
            .join(verts.select(col("id").as("src")), Seq("src"), "left_semi")
            .join(verts.select(col("id").as("dst")), Seq("dst"), "left_semi"))
          free(remainingIds); remaining = r2; remainingIds = rIds
        }
      }
      if (verts.take(1).isEmpty) {
        free(remainingIds); free(vertsIds)
        return done
      }

      // 2. forward/backward reach-min fixpoints with pointer jumping.
      // key(v) = (xxhash64(id), id) — the id tie-break makes the min
      // unique even under hash collisions. b = min key reaching v,
      // f = min key reachable from v; owners bo/fo carry the pointer
      // for the jump step.
      val key = struct(xxhash64(col("id")).as("k"), col("id").as("o"))
      var (state, stateIds) = cp(verts.select(col("id"), col("part"),
        key.as("b"), key.as("f")))
      // run to CONVERGENCE, not to a cap: the split below is only
      // correct on fully-converged labels (a capped fixpoint silently
      // fragments SCCs — observed: a 3000-vertex cycle needs ~33
      // iterations, a 7700-vertex bow-tie >100, both well past any
      // tempting "log n" budget). Termination is guaranteed — labels
      // decrease monotonically over a finite key set. The huge cap
      // exists only to fail LOUDLY if that invariant is ever broken.
      var changed = true
      var iter = 0
      while (changed) {
        iter += 1
        if (iter > 100000) throw new IllegalStateException(
          "SCC label fixpoint failed to converge in 100000 iterations — " +
            "monotonicity invariant broken, refusing to split on " +
            "non-converged labels")
        val viaEdgeB = remaining
          .join(state.select(col("id").as("src"), col("b")), Seq("src"))
          .groupBy(col("dst").as("id")).agg(min(col("b")).as("eb"))
        val viaEdgeF = remaining
          .join(state.select(col("id").as("dst"), col("f")), Seq("dst"))
          .groupBy(col("src").as("id")).agg(min(col("f")).as("ef"))
        val viaJumpB = state.select(col("id"), col("b.o").as("bo"))
          .join(state.select(col("id").as("bo"), col("b").as("jb")), Seq("bo"))
          .select(col("id"), col("jb"))
        val viaJumpF = state.select(col("id"), col("f.o").as("fo"))
          .join(state.select(col("id").as("fo"), col("f").as("jf")), Seq("fo"))
          .select(col("id"), col("jf"))
        val nb = least(col("b"), coalesce(col("eb"), col("b")),
          coalesce(col("jb"), col("b")))
        val nf = least(col("f"), coalesce(col("ef"), col("f")),
          coalesce(col("jf"), col("f")))
        // convergence is read off a `chg` column materialized WITH the
        // new state (old b/f are in scope pre-projection) — no extra
        // compare join per iteration, just a take(1) over the
        // checkpointed rows
        val (next, nextIds) = cp(state
          .join(viaEdgeB, Seq("id"), "left")
          .join(viaEdgeF, Seq("id"), "left")
          .join(viaJumpB, Seq("id"), "left")
          .join(viaJumpF, Seq("id"), "left")
          .select(col("id"), col("part"), nb.as("nb"), nf.as("nf"),
            (nb =!= col("b") || nf =!= col("f")).as("chg"))
          .withColumnRenamed("nb", "b").withColumnRenamed("nf", "f"))
        changed = next.where(col("chg")).take(1).nonEmpty
        if (sys.env.contains("GRAFT_SCC_DEBUG") && iter % 10 == 0)
          println(s"SCCDBG   iter=$iter changedByRange=" +
            next.where(col("chg")).groupBy((col("id") / 1000000).cast("int").as("m"))
              .count().orderBy(col("m")).collect().map(r => s"${r.get(0)}:${r.get(1)}").mkString(","))
        free(stateIds)
        state = next.drop("chg"); stateIds = nextIds
      }
      if (sys.env.contains("GRAFT_SCC_DEBUG"))
        println(s"SCCDBG round=$round innerIters=$iter " +
          s"verts=${verts.count()} parts=${state.select("part").distinct().count()} " +
          s"pivotSccSizes=${state.join(state.groupBy(col("part")).agg(min(col("b")).as("pm")), Seq("part"))
            .where(col("b") === col("pm") && col("f") === col("pm")).count()}")

      // 3. split: pivot key per part = min b (the part's key-minimum
      // vertex reaches at least itself); emit SCC(pivot), route the
      // rest to parts derived from the (B-owner, F-owner) label PAIR.
      // SCC members share B and F exactly (mutual reachability ⟹
      // identical reaching and reachable sets), so the pair split
      // never severs an SCC; it refines the classic D/U/R regions
      // (descendants all carry B = pivot, ancestors F = pivot, the
      // remainder neither — the pair distinguishes all three), and —
      // crucially — it fragments DISCONNECTED remainders into
      // independent parts in one round at zero extra cost: a bag of k
      // mutually-unreachable components would otherwise shed one
      // pivot SCC per round (Θ(k) rounds — observed on the bow-tie
      // probe's 20k in-rings before this refinement). Hash collisions
      // between part ids only MERGE two edge-disjoint subproblems —
      // the merged pivot's split strands the other subgraph in its
      // own label class, so correctness is unaffected.
      val pm = state.groupBy(col("part")).agg(min(col("b")).as("pm"))
      val labeled = state.join(pm, Seq("part"))
      val members = labeled
        .where(col("b") === col("pm") && col("f") === col("pm"))
        .select(col("part"), col("id"))
      val sccLabel = members.groupBy(col("part")).agg(min(col("id")).as("scc"))
      val (d2, dIds) = cp(done.union(
        members.join(sccLabel, Seq("part")).select(col("id"), col("scc"))))
      free(doneIds); done = d2; doneIds = dIds

      val (v2, vIds) = cp(labeled
        .where(col("b") =!= col("pm") || col("f") =!= col("pm"))
        .select(col("id"),
          xxhash64(col("part"), col("b.o"), col("f.o")).as("part")))
      free(vertsIds); free(stateIds); verts = v2; vertsIds = vIds

      val (r2, rIds) = cp(remaining
        .join(verts.select(col("id").as("src"), col("part").as("ps")), Seq("src"))
        .join(verts.select(col("id").as("dst"), col("part").as("pd")), Seq("dst"))
        .where(col("ps") === col("pd"))
        .select(col("src"), col("dst")))
      free(remainingIds); remaining = r2; remainingIds = rIds
    }
    // maxIterations bounds OUTER rounds only; exceeding it means the
    // recursion is pathologically unbalanced (expected depth is
    // logarithmic — every part sheds its pivot's SCC per round). Wrong
    // labels must never ship silently, so this fails loudly.
    if (verts.take(1).nonEmpty) throw new IllegalStateException(
      s"SCC divide-and-conquer did not finish within $maxIterations " +
        "rounds; raise maxIterations")
    done
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
