package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar-quantized (int8) vector search — the memory side of the ANN
  * portfolio: full-precision float32 embeddings at 10¹¹ × 768 dims are
  * ~300 TB; int8 cuts scan/cache volume 4× and turns the inner loop
  * into integer multiply-adds. Search runs quantized to produce a
  * candidate pool, then the top `rerank·k` candidates are re-scored on
  * the exact float vectors — the standard two-stage shape (quantized
  * recall, exact precision) used by every production vector store.
  *
  * Quantization: per-DIMENSION affine int8 (one distributed min/max
  * aggregation over the corpus → a broadcast (d × 2) scale table).
  * Per-dimension beats one global scale because embedding dimensions
  * have wildly different ranges, and the scale table is tiny state.
  *
  * Scale shape: encode is a map-only pass; search is the same
  * broadcast-probe partition-local kernel as `Ann.bruteForceTopK`
  * (no row explosion, integer loops) + a small exact rerank join.
  * Composes with IVF (quantize within lists) when n demands it.
  */
object Quantized {

  /** Per-dimension (lo, hi) ranges → the broadcastable scale table. */
  def fitScales(corpus: DataFrame, vecCol: String): Array[(Float, Float)] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy(col("dim"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .orderBy(col("dim"))
      .select(col("lo").cast("float"), col("hi").cast("float"))
      .as[(Float, Float)].collect()
  }

  private[similarity] def quantize(v: Array[Float],
      scales: Array[(Float, Float)]): Array[Byte] = {
    val out = new Array[Byte](v.length)
    var i = 0
    while (i < v.length) {
      val (lo, hi) = scales(i)
      val q =
        if (hi <= lo) 0
        else math.round((v(i) - lo) / (hi - lo) * 255f) - 128
      out(i) = math.max(-128, math.min(127, q)).toByte
      i += 1
    }
    out
  }

  /** (id, qvec binary): map-only int8 encode against a fitted scale
    * table. */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
      scales: Array[(Float, Float)]): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val scalesB = spark.sparkContext.broadcast(scales)
    corpus.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, quantize(v, scalesB.value)) }
      .toDF("id", "qvec")
  }

  /** IVF × SQ composition: centroid routing confines each probe to
    * `nprobe` lists (the IVF candidate cut), the confined candidates are
    * scored on their int8 codes (the SQ memory cut — the shuffled list
    * payload is 1 byte/dim plus an 8-byte id), and the top `rerank·k`
    * pool is re-scored exactly on full floats. Both approximations
    * compose multiplicatively on cost and their error sources stay
    * independent: routing loss is bounded by nprobe, scoring loss by the
    * quantization step and the rerank pool. */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 0, nprobe: Int = 4,
      rerank: Int = 4): DataFrame = {
    require(k > 0 && nprobe >= 1 && rerank >= 1)
    val spark = corpus.sparkSession
    import spark.implicits._
    val scales = fitScales(corpus, vecCol)
    val scalesB = spark.sparkContext.broadcast(scales)
    val lists = if (nlist > 0) nlist else Ann.autoNlist(corpus.count())
    val cents = Ann.kmeansCentroids(corpus, idCol, vecCol, lists, 1)
    // corpus lists carry int8 codes, not floats
    val assignedQ = Ann.assignNearest(corpus, idCol, vecCol, cents)
      .select(col("cent_id"), col("id"), col("v"))
      .as[(Long, Long, Array[Float])]
      .map { case (cid, id, v) => (cid, id, quantize(v, scalesB.value)) }
      .toDF("cent_id", "neighbor_id", "qvec")
    val probed = Ann.probeLists(cents, probes, idCol, vecCol, nprobe)
    val cands = probed.join(assignedQ, "cent_id")
      .where(col("probe_id") =!= col("neighbor_id"))
      .dropDuplicates("probe_id", "neighbor_id")
      .select(col("probe_id"), col("probe_id_vec"), col("neighbor_id"),
        col("qvec"))
      .as[(Long, Array[Float], Long, Array[Byte])]
      .mapPartitions { it =>
        val sc = scalesB.value
        val steps = sc.map { case (lo, hi) =>
          if (hi <= lo) 0f else (hi - lo) / 255f }
        it.map { case (pid, pv, nid, cq) =>
          var dot = 0.0; var pn = 0.0; var cn = 0.0
          var d = 0
          while (d < cq.length) {
            val x = sc(d)._1 + (cq(d) + 128) * steps(d)
            dot += pv(d) * x; pn += pv(d).toDouble * pv(d).toDouble
            cn += x * x; d += 1
          }
          // zero-norm → 0.0, the kernel-wide rule (a NaN qsim would sort
          // FIRST under Spark's NaN-largest ordering and hijack the pool)
          (pid, nid, if (pn == 0 || cn == 0) 0.0
            else dot / (math.sqrt(pn) * math.sqrt(cn)))
        }
      }.toDF("probe_id", "neighbor_id", "qsim")
    val poolW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id"))
      .orderBy(col("qsim").desc, col("neighbor_id"))
    val pool = cands.withColumn("r", row_number().over(poolW))
      .where(col("r") <= k * rerank)
      .select(col("probe_id"), col("neighbor_id"))
    exactRerank(corpus, probes, idCol, vecCol, pool, k)
  }

  /** Exact float rerank of a (probe_id, neighbor_id) pool to top-k. */
  private def exactRerank(corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, pool: DataFrame, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val pMap = spark.sparkContext.broadcast(
      probes.select(col(idCol).cast("long"), col(vecCol))
        .as[(Long, Array[Float])].collect().toMap)
    val exact = pool
      .join(corpus.select(col(idCol).cast("long").as("neighbor_id"),
        col(vecCol).as("cvec")), "neighbor_id")
      .as[(Long, Long, Array[Float])]
      .map { case (nid, pid, cv) =>
        val pv = pMap.value(pid)
        var dot = 0.0; var pn = 0.0; var cn = 0.0
        var d = 0
        while (d < pv.length) {
          dot += pv(d).toDouble * cv(d).toDouble
          pn += pv(d).toDouble * pv(d).toDouble
          cn += cv(d).toDouble * cv(d).toDouble
          d += 1
        }
        (pid, nid, if (pn == 0 || cn == 0) 0.0 // zero-norm kernel rule
          else dot / (math.sqrt(pn) * math.sqrt(cn)))
      }.toDF("probe_id", "neighbor_id", "sim")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("rank"))
  }

  // ---------------------------------------------------------------- PQ

  /** Product-quantization codebooks (Jégou et al., TPAMI 2011): the
    * vector is split into `m` contiguous subspaces and each subvector is
    * k-means-clustered independently; a vector is then stored as `m`
    * one-byte codeword ids — 768 dims × 4 bytes → `m` bytes (vs int8
    * SQ's 1 byte/dim), the memory point between SQ and raw floats that
    * production stores (FAISS IVFPQ) run at billion scale.
    *
    * Training reuses [[Ann.kmeansCentroids]] per subspace on sliced
    * subvectors — m small distributed k-means runs; the finished
    * codebook is m × ksub × (d/m) doubles of broadcast state.
    * Returns codebook(sub)(code) = centroid subvector, with codes
    * re-numbered 0..ksub-1 in a deterministic order. */
  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iterations: Int = 2): Array[Array[Array[Double]]] = {
    require(m >= 1 && ksub >= 1 && ksub <= 256, "need 1 <= ksub <= 256")
    val dimRow = corpus.select(size(col(vecCol))).take(1)
    require(dimRow.nonEmpty, "pqTrain needs a non-empty corpus")
    val dim = dimRow(0).getInt(0)
    require(dim % m == 0, s"dim $dim must be divisible by m=$m")
    val dsub = dim / m
    (0 until m).map { j =>
      val sub = corpus.select(col(idCol).cast("long").as("id"),
        slice(col(vecCol), j * dsub + 1, dsub).as("v"))
      Ann.kmeansCentroids(sub, "id", "v", ksub, iterations)
        .orderBy(col("cent_id"))
        .collect()
        .map(_.getAs[Seq[Double]]("cent_vec").toArray)
    }.toArray
  }

  private[similarity] def pqCode(v: Array[Float],
      book: Array[Array[Array[Double]]]): Array[Byte] = {
    val m = book.length
    val dsub = v.length / m
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val words = book(j)
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < words.length) {
        var d2 = 0.0; var t = 0
        while (t < dsub) {
          val diff = v(j * dsub + t) - words(c)(t)
          d2 += diff * diff; t += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  /** (id, codes binary): map-only PQ encode against a trained codebook. */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      book: Array[Array[Array[Double]]]): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bookB = spark.sparkContext.broadcast(book)
    corpus.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, pqCode(v, bookB.value)) }
      .toDF("id", "codes")
  }

  /** PQ top-k via asymmetric distance computation: each probe
    * precomputes, per (subspace, codeword), the partial dot with its own
    * full-precision subvector and the codeword's partial squared norm —
    * an m×ksub lookup table. Scanning a corpus vector is then m table
    * lookups and adds (no per-dimension work), approximating cosine as
    *   dot ≈ Σ_j T_dot[j][code_j],  ‖c‖² ≈ Σ_j T_norm[j][code_j].
    * The top rerank·k pool per probe is re-scored on exact floats —
    * same two-stage recall/precision shape as [[topK]].
    *
    * SERVING-ONLY CONTRACT: probes are collected + broadcast; for
    * corpus-as-probes batch workloads use [[graft.similarity.Ann.knnJoin]]
    * (co-partitioned, zero driver materialization). */
  def pqTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 8, ksub: Int = 32,
      rerank: Int = 4, iterations: Int = 2): DataFrame = {
    require(k > 0 && rerank >= 1)
    val spark = corpus.sparkSession
    import spark.implicits._
    val book = pqTrain(corpus, idCol, vecCol, m, ksub, iterations)
    val bookB = spark.sparkContext.broadcast(book)
    val probeRows = probes.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val probeB = spark.sparkContext.broadcast(probeRows)

    val cands = corpus.select(col(idCol).cast("long"), col(vecCol))
      .repartition(spark.sparkContext.defaultParallelism * 2)
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val bk = bookB.value
        val mm = bk.length
        val ps = probeB.value
        // per-probe ADC tables, built once per partition
        // codebooks can be jagged (k-means drops empty clusters)
        val tables = ps.map { case (pid, pv) =>
          val dsub = pv.length / mm
          val tDot = Array.tabulate(mm)(j => new Array[Double](bk(j).length))
          var j = 0
          while (j < mm) {
            var c = 0
            while (c < bk(j).length) {
              var d = 0.0; var t = 0
              while (t < dsub) {
                d += pv(j * dsub + t) * bk(j)(c)(t); t += 1
              }
              tDot(j)(c) = d; c += 1
            }
            j += 1
          }
          var pn = 0.0; var i = 0
          while (i < pv.length) { pn += pv(i).toDouble * pv(i).toDouble; i += 1 }
          (pid, tDot, math.sqrt(pn))
        }
        val tNorm = {
          val tn = Array.tabulate(mm)(j => new Array[Double](bk(j).length))
          var j = 0
          while (j < mm) {
            var c = 0
            while (c < bk(j).length) {
              var n2 = 0.0; var t = 0
              while (t < bk(j)(c).length) {
                n2 += bk(j)(c)(t) * bk(j)(c)(t); t += 1
              }
              tn(j)(c) = n2; c += 1
            }
            j += 1
          }
          tn
        }
        it.flatMap { case (nid, cv) =>
          val code = pqCode(cv, bk)
          var cn2 = 0.0
          var j = 0
          while (j < mm) { cn2 += tNorm(j)(code(j) & 0xff); j += 1 }
          val cNorm = math.sqrt(cn2)
          tables.iterator.filter(_._1 != nid).map { case (pid, tDot, pNorm) =>
            var dot = 0.0
            var jj = 0
            while (jj < mm) { dot += tDot(jj)(code(jj) & 0xff); jj += 1 }
            // guard BOTH norms (a zero-norm PROBE was still 0/0 = NaN)
            (pid, nid, if (cNorm == 0.0 || pNorm == 0.0) 0.0
              else dot / (pNorm * cNorm))
          }
        }
      }.toDF("probe_id", "neighbor_id", "qsim")
    val poolW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id"))
      .orderBy(col("qsim").desc, col("neighbor_id"))
    val pool = cands.withColumn("r", row_number().over(poolW))
      .where(col("r") <= k * rerank)
      .select(col("probe_id"), col("neighbor_id"))
    exactRerank(corpus, probes, idCol, vecCol, pool, k)
  }

  /** Two-stage top-k: quantized integer scan → top rerank·k candidates
    * per probe → exact float rerank. Output (probe_id, neighbor_id,
    * rank) with the same tie rule as the exact search (sim desc, id).
    *
    * SERVING-ONLY CONTRACT: probes are collected + broadcast — the right
    * shape for a bounded query batch, a driver bottleneck when the probe
    * set IS the corpus. Batch workloads (SemDeDup, full-set hard-negative
    * mining) go through [[graft.similarity.Ann.knnJoin]] instead. */
  def topK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int, rerank: Int = 4): DataFrame = {
    require(k > 0 && rerank >= 1)
    val spark = corpus.sparkSession
    import spark.implicits._
    val scales = fitScales(corpus, vecCol)
    val scalesB = spark.sparkContext.broadcast(scales)
    val probeRows = probes.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val probeB = spark.sparkContext.broadcast(probeRows)

    // stage 1: approximate kernel over the quantized corpus — the
    // corpus side is dequantized from its int8 codes (x̂ = lo +
    // (q+128)·step), so ranking error is bounded by the quantization
    // step while the corpus-side state stays 1 byte/dim; the probes
    // (tiny, broadcast) keep full precision. A shifted-code integer dot
    // is NOT a valid proxy here: per-dimension affine offsets make it
    // non-monotone in the true similarity.
    val cands = corpus.select(col(idCol).cast("long"), col(vecCol))
      .repartition(spark.sparkContext.defaultParallelism * 2)
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val ps = probeB.value
        val sc = scalesB.value
        val steps = sc.map { case (lo, hi) =>
          if (hi <= lo) 0f else (hi - lo) / 255f }
        it.flatMap { case (nid, cv) =>
          val cq = quantize(cv, sc)
          val deq = new Array[Double](cq.length)
          var cn = 0.0
          var d = 0
          while (d < cq.length) {
            deq(d) = sc(d)._1 + (cq(d) + 128) * steps(d)
            cn += deq(d) * deq(d)
            d += 1
          }
          val cNorm = math.sqrt(cn)
          ps.iterator.filter(_._1 != nid).map { case (pid, pq) =>
            var dot = 0.0; var pn = 0.0
            var j = 0
            while (j < pq.length) {
              dot += pq(j) * deq(j); pn += pq(j).toDouble * pq(j).toDouble
              j += 1
            }
            (pid, nid, if (pn == 0 || cNorm == 0) 0.0 // zero-norm rule
              else dot / (math.sqrt(pn) * cNorm))
          }
        }
      }.toDF("probe_id", "neighbor_id", "qdot")
    val poolW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id"))
      .orderBy(col("qdot").desc, col("neighbor_id"))
    val pool = cands.withColumn("r", row_number().over(poolW))
      .where(col("r") <= k * rerank)
      .select(col("probe_id"), col("neighbor_id"))

    // stage 2: exact rerank of the pool on full floats
    val pMap = spark.sparkContext.broadcast(probeRows.toMap)
    val exact = pool
      .join(corpus.select(col(idCol).cast("long").as("neighbor_id"),
        col(vecCol).as("cvec")), "neighbor_id")
      .as[(Long, Long, Array[Float])]
      .map { case (nid, pid, cv) =>
        val pv = pMap.value(pid)
        var dot = 0.0; var pn = 0.0; var cn = 0.0
        var d = 0
        while (d < pv.length) {
          dot += pv(d).toDouble * cv(d).toDouble
          pn += pv(d).toDouble * pv(d).toDouble
          cn += cv(d).toDouble * cv(d).toDouble
          d += 1
        }
        (pid, nid, if (pn == 0 || cn == 0) 0.0 // zero-norm kernel rule
          else dot / (math.sqrt(pn) * math.sqrt(cn)))
      }.toDF("probe_id", "neighbor_id", "sim")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("rank"))
  }

  /** BATCH kNN join through the IVF index with int8 list payloads — the
    * corpus-as-probes shape ([[graft.similarity.Ann.knnJoin]]) with the
    * SQ memory/shuffle cut composed in: the routed corpus side ships
    * 1 byte/dim codes instead of 4-byte floats, probes keep full
    * precision (asymmetric scoring — corpus values are dequantized
    * x̂ = lo + (q+128)·step, so ranking error is bounded by the
    * quantization step), the per-probe pool keeps `rerank·k`
    * candidates, and a DISTRIBUTED exact-rerank join on full floats
    * bounds the loss — neither side is ever collected to the driver,
    * unlike [[topK]]/[[pqTopK]], whose broadcast probes are the
    * query-SERVING configuration.
    *
    * Hot-list splitting: the same task caps as [[Ann.knnJoin]] (shared
    * [[Ann.hotListSalts]] planner) tile an oversized list's work into
    * bounded probe-salt × corpus-salt tasks; a per-(probe, list) pool
    * trim across salts restores the single-heap pool semantics exactly,
    * so results are identical for any salt counts. The |probes| ×
    * |corpus| gate keeps small joins on the zero-overhead path. */
  def knnJoinSq(index: Ann.IvfIndex, probes: DataFrame, idCol: String,
      vecCol: String, k: Int, nprobe: Int = 4, rerank: Int = 4,
      maxPairsPerTask: Long = Ann.DefaultMaxPairsPerTask,
      maxProbesPerTask: Int = Ann.DefaultMaxProbesPerTask): DataFrame = {
    require(k > 0 && nprobe > 0 && rerank >= 1)
    val spark = probes.sparkSession
    import spark.implicits._
    val corpusVecs = index.assigned.select(col("neighbor_id").cast("long"),
      col("neighbor_id_vec").cast("array<float>").as("cvec"))
    val scales = fitScales(corpusVecs, "cvec")
    val scalesB = spark.sparkContext.broadcast(scales)

    val dim = index.centroids
      .select(org.apache.spark.sql.functions.size(col("cent_vec")))
      .head().getInt(0)
    val effPairs = Ann.effectivePairCap(maxPairsPerTask, dim)
    // gate on the caller's cap; tiles on the flop-normalized budget
    // (see Ann.knnJoin — serving-sized joins stay zero-overhead)
    val splittable = Ann.saltGateTrips(probes.count(), index.assigned.count(),
      maxPairsPerTask, maxProbesPerTask)
    val routedRaw = Ann.assignNearestK(probes, idCol, vecCol, index.centroids,
      nprobe).as[(Long, Long, Array[Float], Double)]
    val lists = index.assigned.select(col("cent_id").cast("long"),
        col("neighbor_id").cast("long"),
        col("neighbor_id_vec").cast("array<float>"))
      .as[(Long, Long, Array[Float])]
      .map { case (c, nid, v) => (c, nid, quantize(v, scalesB.value)) }

    val poolSize = k * rerank
    val worstFirst =
      Ordering.by[(Double, Long), (Double, Long)](t => (-t._1, t._2))
    // shared asymmetric-scoring kernel: per-probe bounded pool heaps over
    // one stream of quantized corpus rows; emits (pid, nid, approx sim)
    def poolHeaps(pb: Array[(Long, Array[Float], Double)],
        cs: Iterator[(Long, Array[Byte])]): Iterator[(Long, Long, Double)] =
      if (pb.isEmpty) Iterator.empty
      else {
        val sc = scalesB.value
        val steps = sc.map { case (lo, hi) =>
          if (hi <= lo) 0f else (hi - lo) / 255f }
        val heaps = Array.fill(pb.length)(
          new scala.collection.mutable.PriorityQueue[(Double, Long)]()(
            worstFirst))
        cs.foreach { case (nid, cq) =>
          val deq = new Array[Double](cq.length)
          var cn = 0.0
          var d = 0
          while (d < cq.length) {
            deq(d) = sc(d)._1 + (cq(d) + 128) * steps(d)
            cn += deq(d) * deq(d)
            d += 1
          }
          val cNorm = math.sqrt(cn)
          var j = 0
          while (j < pb.length) {
            val (pid, pv, pNorm) = pb(j)
            if (pid != nid) {
              require(pv.length == cq.length,
                s"embedding dim ${pv.length} != corpus dim ${cq.length}")
              var dot = 0.0; var i = 0
              while (i < pv.length) { dot += pv(i) * deq(i); i += 1 }
              val sim = if (pNorm == 0 || cNorm == 0) 0.0
                else dot / (pNorm * cNorm)
              val h = heaps(j)
              if (h.size < poolSize) h.enqueue((sim, nid))
              else {
                val (wSim, wId) = h.head
                if (sim > wSim || (sim == wSim && nid < wId)) {
                  h.dequeue(); h.enqueue((sim, nid))
                }
              }
            }
            j += 1
          }
        }
        pb.indices.iterator.flatMap { j =>
          val pid = pb(j)._1
          heaps(j).iterator.map { case (s, nid) => (pid, nid, s) }
        }
      }

    // plan from the raw routing; a REAL salt plan filters rows by
    // cent_id, so it is rebuilt from a pinned (localCheckpoint) routing
    // the join then reads — same contract and rationale as Ann.knnJoin
    // (balanced joins keep the verbatim unpinned plan)
    val centIdsOnly =
      index.assigned.select(col("cent_id").cast("long")).toDF("cent_id")
    val (routed, plan) =
      Ann.hotListSalts(splittable, routedRaw.toDF(), centIdsOnly,
        effPairs, maxProbesPerTask) match {
        case None => (routedRaw, None)
        case Some(_) =>
          val pinned = routedRaw.localCheckpoint()
          (pinned, Ann.hotListSalts(splittable, pinned.toDF(), centIdsOnly,
            effPairs, maxProbesPerTask))
      }
    val pool = plan match {
      case None =>
        routed.groupByKey(_._1).cogroup(lists.groupByKey(_._1)) {
          (_, ps, cs) =>
            poolHeaps(ps.map(p => (p._2, p._3, p._4)).toArray,
              cs.map(c => (c._2, c._3)))
        }.toDF("probe_id", "neighbor_id", "sim")
          .select(col("probe_id"), col("neighbor_id"))
      case Some(saltB) =>
        val routedS = Ann.saltExpand(routed, saltB, probeSide = true)(
          _._1, _._2, (r, p, c) => (r._1, p, c, r._2, r._3, r._4))
        val listsS = Ann.saltExpand(lists, saltB, probeSide = false)(
          _._1, _._2, (l, p, c) => (l._1, p, c, l._2, l._3))
        val partial = routedS.groupByKey(r => (r._1, r._2, r._3))
          .cogroup(listsS.groupByKey(r => (r._1, r._2, r._3))) {
            case ((cid, _, _), ps, cs) =>
              poolHeaps(ps.map(p => (p._4, p._5, p._6)).toArray,
                cs.map(c => (c._4, c._5)))
                .map(t => (t._1, cid, t._2, t._3))
          }.toDF("probe_id", "cent_id", "neighbor_id", "sim")
        // pool trim: per (probe, list) keep poolSize across the salts —
        // restores the single-heap pool semantics exactly (same
        // sim-desc/nid-asc order the heap replacement rule encodes), so
        // the rerank sees an identical candidate set for any salt counts
        val wPool = org.apache.spark.sql.expressions.Window
          .partitionBy(col("probe_id"), col("cent_id"))
          .orderBy(col("sim").desc, col("neighbor_id"))
        partial.withColumn("pr", row_number().over(wPool))
          .where(col("pr") <= poolSize)
          .select(col("probe_id"), col("neighbor_id"))
    }

    // distributed exact rerank: full-float vectors join in from both
    // sides (no driver materialization), sims rounded like knnJoin's
    // for deterministic tie-breaks
    val exact = pool
      .join(corpusVecs, "neighbor_id")
      .join(probes.select(col(idCol).cast("long").as("probe_id"),
        col(vecCol).cast("array<float>").as("pvec")), "probe_id")
      .select(col("probe_id"), col("neighbor_id"), col("pvec"), col("cvec"))
      .as[(Long, Long, Array[Float], Array[Float])]
      .map { case (pid, nid, pv, cv) =>
        var dot = 0.0; var pn = 0.0; var cn = 0.0
        var d = 0
        while (d < pv.length) {
          dot += pv(d).toDouble * cv(d).toDouble
          pn += pv(d).toDouble * pv(d).toDouble
          cn += cv(d).toDouble * cv(d).toDouble
          d += 1
        }
        val raw = if (pn == 0 || cn == 0) 0.0
          else dot / (math.sqrt(pn) * math.sqrt(cn))
        // bit-identical HALF_UP without the per-pair BigDecimal chain
        (pid, nid, Ann.round9(raw))
      }.toDF("probe_id", "neighbor_id", "sim")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("rank"))
  }
}
