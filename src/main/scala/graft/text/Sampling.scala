package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified corpus sampling — the "mixture weights" step
  * of training-data pipelines (per-source / per-quality sampling rates:
  * The Pile's per-subset epochs, Dolma's source mixing). Each document
  * draws a reproducible uniform from a Knuth multiplicative hash of its
  * integer id — plain 64-bit arithmetic `(id * 2654435761) mod 2^32`, so
  * the draw is identical in ANY engine (no RNG state, no hash-function
  * coupling), and differential tests against a SQL oracle are exact.
  * A document is kept iff its draw < rate(bucket)·2^32.
  *
  * Scale shape: per-row projection + filter, shuffle-free; safe for ids
  * up to ~3.4e9 before the multiply would overflow signed 64-bit (use a
  * pre-folded id column beyond that). */
object Sampling {

  /** Knuth multiplicative draw in [0, 2^32). */
  val Modulus: Long = 1L << 32
  def draw(id: Column): Column = pmod(id.cast("long") * lit(2654435761L), lit(Modulus))

  /** Keep each row iff draw(id) < rates(bucket)·2^32; unlisted buckets
    * keep everything (rate 1.0). Output: input columns + `u` (the draw,
    * exact integer — lets differential tests compare the kept set AND
    * the uniforms). */
  def stratifiedSample(df: DataFrame, idCol: String, bucketCol: String,
      rates: Map[String, Double]): DataFrame = {
    val thr = rates.foldLeft(lit(Modulus)) { case (acc, (b, r)) =>
      when(col(bucketCol) === b, lit((r * Modulus).toLong)).otherwise(acc)
    }
    df.withColumn("u", draw(col(idCol))).where(col("u") < thr)
  }

  /** Weighted sampling WITHOUT replacement, top-k of n — the
    * Efraimidis–Spirakis A-ES scheme (IPL 2006): each row draws a
    * deterministic uniform u ∈ (0,1] and gets priority ln(u)/w (the log
    * of the textbook key u^(1/w), same ordering, no pow); the k LARGEST
    * priorities are the sample. Unlike [[rateSample]] (independent
    * per-row coin flips → random sample SIZE), this yields exactly k
    * rows with inclusion probability proportional to weight — the
    * "pick k documents, quality-weighted" primitive.
    *
    * Determinism: u = (draw(id)+1)/2^32 from the Knuth hash (never 0,
    * so ln is finite); priority is rounded to 6 places and ties break
    * by id, so the selected SET is engine-exact (ln parity at 6 places
    * — the q88 discipline). Scale shape: map-only priority + global
    * top-k = TakeOrderedAndProject (per-partition heaps of k, no global
    * sort). Rows with weight <= 0 OR NaN are excluded (never sampled):
    * Spark's total ordering puts NaN above every number, so a NaN
    * weight (a 0/0 quality ratio) would pass `> 0` AND its NaN priority
    * would sort FIRST under desc — a single NaN row silently hijacking
    * the sample. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: Column,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val u = draw(col(idCol))
    df.where(weightCol > 0 && !isnan(weightCol))
      .withColumn("u", u)
      .withColumn("priority",
        round(log((col("u") + lit(1L)).cast("double") / lit(Modulus.toDouble))
          / weightCol, 6))
      .orderBy(col("priority").desc, col(idCol).asc)
      .limit(k)
  }

  /** Per-ROW-rate sampling — quality-weighted corpus selection (DCLM /
    * FineWeb-style: keep probability proportional to a model or heuristic
    * quality score, computed per document rather than per bucket). Keeps a
    * row iff draw(id) < floor(rate · 2^32); the threshold is derived from
    * the rate COLUMN with the same IEEE-double ops any engine performs, so
    * differential oracles restate it exactly (`FLOOR(rate * 4294967296)`
    * — DuckDB's bare BIGINT cast rounds, floor first). Rates clamp to
    * [0, 1]; a NaN rate drops the row — Spark's NaN-largest ordering
    * makes `least(greatest(NaN, 0), 1)` evaluate to 1.0, so without the
    * explicit guard a NaN quality score (0/0 ratio) silently became
    * keep-always, the OPPOSITE of "keep proportional to score".
    * Shuffle-free. */
  def rateSample(df: DataFrame, idCol: String, rateCol: Column): DataFrame = {
    val safe = when(isnan(rateCol), lit(0.0)).otherwise(rateCol)
    val thr = floor(least(greatest(safe, lit(0.0)), lit(1.0)) *
      lit(Modulus.toDouble)).cast("long")
    df.withColumn("u", draw(col(idCol))).where(col("u") < thr)
  }

  /** Distinct multiplier for the epoch draw (xxhash's 32-bit prime-2), so
    * upsampling decisions don't correlate with [[stratifiedSample]]'s
    * keep/drop draws on the same ids. */
  val EpochMultiplier: Long = 2246822519L
  def epochDraw(id: Column): Column =
    pmod(id.cast("long") * lit(EpochMultiplier), lit(Modulus))

  /** Fractional-EPOCH mixture — the upsampling half of source mixing that
    * [[stratifiedSample]] (rates <= 1) can't express: a rate of 2.3 means
    * every document of that bucket appears twice and a deterministic 30%
    * of them a third time (The Pile's >1 per-subset epochs). Emits one row
    * per (document, epoch) with `epoch` in 1..n_copies; rate 0 drops the
    * bucket, unlisted buckets run one epoch. Thresholds are computed on
    * the driver as exact integers, so any engine restates them verbatim.
    *
    * Scale shape: per-row projection + bounded explode (fan-out <=
    * ceil(max rate)) — shuffle-free; downstream training-order shuffling
    * is a separate sort over hash((id, epoch)). */
  def epochMixture(df: DataFrame, idCol: String, bucketCol: String,
      rates: Map[String, Double]): DataFrame = {
    val copies = rates.foldLeft(lit(1L)) { case (acc, (b, r)) =>
      require(r >= 0, s"negative epoch rate for bucket $b")
      val base = math.floor(r).toLong
      val thr = ((r - base) * Modulus).toLong
      when(col(bucketCol) === b,
        lit(base) + when(epochDraw(col(idCol)) < lit(thr), 1L).otherwise(0L))
        .otherwise(acc)
    }
    df.withColumn("n_copies", copies)
      .where(col("n_copies") > 0)
      .withColumn("epoch", explode(sequence(lit(1L), col("n_copies"))))
      .drop("n_copies")
  }

  /** Per-group document cap — the anti-spam step of web curation (cap
    * documents per registrable domain so link farms can't dominate a
    * source mix; C4 and RefinedWeb both cap per-domain contributions).
    * Rows are ranked inside each group by `orderBy` (caller supplies a
    * DETERMINISTIC total order — end with the id column) and `kept` flags
    * the first `cap`.
    *
    * Scale shape: one hash exchange on the group column + per-group sort;
    * group count (domains) is huge so the window parallelizes; a single
    * mega-domain is bounded by the sort of its own rows only. Returns all
    * rows with (rank, kept) rather than filtering, so the caller can audit
    * what the cap dropped. */
  def capPerGroup(df: DataFrame, groupCol: String, orderBy: Seq[Column],
      cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(orderBy: _*)
    df.withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("kept", col("rnk") <= cap)
  }

  /** Deterministic global corpus shuffle — the training-order step that
    * follows mixing: every document gets a reproducible pseudo-random sort
    * key `md5(id ":" seed)` and a position within one of `buckets`
    * hash-spread shards. Re-running with the same seed reproduces the
    * exact order on any engine (md5 is engine-independent, unlike
    * xxhash64/rand whose seeding differs); a new seed per epoch gives an
    * independent order.
    *
    * Scale shape: the shard assignment is a narrow projection; ordering is
    * established per-shard (`row_number` partitioned by shard), so the
    * only exchange is a hash partition on the shard id — there is NO
    * global single-task sort. A trainer reads shards in id order,
    * each shard internally ordered by `skey`; with `buckets` ≥ the
    * executor count every task sorts ~n/buckets rows. Output:
    * (id, skey, bucket, pos). */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(buckets <= 65536,
      s"deterministicShuffle's 4-hex-char key prefix reaches at most " +
        s"65536 shards, got $buckets")
    val skey = md5(concat(col(idCol).cast("string"), lit(":" + seed)))
    // bucket from the key's first FOUR hex chars (65 536 combos — two
    // chars capped real shard counts at 256): pure ascii arithmetic so
    // any SQL engine restates it verbatim (no hash-function coupling)
    val bucket = pmod(
      ((ascii(substring(col("skey"), 1, 1)) * lit(131) +
        ascii(substring(col("skey"), 2, 1))) * lit(131) +
        ascii(substring(col("skey"), 3, 1))) * lit(131) +
        ascii(substring(col("skey"), 4, 1)), lit(buckets)).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("skey"))
    df.select(col(idCol), skey.as("skey"))
      .withColumn("bucket", bucket)
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Temperature-scaled source mixing weights — the multilingual /
    * multi-source sampling rule (XLM-R, mT5): the target share of group
    * s is q_s ∝ p_s^α for corpus share p_s, with α ∈ (0, 1] flattening
    * the head so low-resource groups are upsampled. The ratio q/p is
    * the per-group sampling-rate multiplier to feed [[rateSample]] /
    * [[epochMixture]].
    *
    * Output per group: (groupCol, n_docs, p_ppm exact-integer corpus
    * share, q_ppm the tempered target share, rate_ppm = q/p), floats
    * entering only through the per-group pow scalar — every ppm column
    * is one rounded arithmetic shape an oracle restates verbatim.
    *
    * Scale shape: one count aggregation to a groups-sized table, two
    * 1-row broadcast scalars (total, normalizer) — nothing row-wise. */
  def temperatureWeights(df: DataFrame, groupCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val byGrp = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs"))
    val tot = byGrp.agg(sum(col("n_docs")).as("N"))
    val pw = byGrp.crossJoin(broadcast(tot))
      .withColumn("pw", expr(s"pow(CAST(n_docs AS DOUBLE) / N, $alpha)"))
    val z = pw.agg(sum(col("pw")).as("z"))
    pw.crossJoin(broadcast(z)).select(
      col(groupCol),
      col("n_docs"),
      expr("(1000000 * n_docs) div N").as("p_ppm"),
      expr("CAST(round(1000000 * pw / z) AS BIGINT)").as("q_ppm"),
      expr("CAST(round(1000000 * pw / z / (CAST(n_docs AS DOUBLE) / N)) AS BIGINT)")
        .as("rate_ppm"))
  }

  /** Leakage-safe train/val/test split: assigns WHOLE near-duplicate
    * clusters to splits, never individual documents. A document-level
    * split leaks — a training document's near-duplicate landing in the
    * eval split inflates every downstream benchmark (the reason
    * dedup-then-split is curation doctrine; see the decontamination
    * operators for the cross-corpus variant of the same failure).
    * Compose with [[graft.dedup.FuzzyClusters.minhashClusters]] (or any
    * clustering that emits a cluster id per document): every member of
    * a cluster shares the cluster's key, so the whole family lands in
    * one split by construction.
    *
    * `weights` are integer proportions (e.g. Seq(8, 1, 1)); the cluster
    * key buckets into sum(weights) cells by `splitKey` (default: the
    * avalanching [[draw]] hash of the cluster id — pass
    * `pmod(col("cluster"), lit(n))` style keys only for differential
    * tests, id-correlated keys bias real corpora). Output: input rows
    * plus `split` (0-based index into weights). Map-only — no shuffle,
    * no per-cluster state; the split decision is a pure function of the
    * cluster id, so it is stable under re-runs and corpus growth
    * (existing clusters never migrate when new documents arrive). */
  def leakageSafeSplit(df: DataFrame, clusterCol: String, weights: Seq[Int],
      splitKey: Column = null): DataFrame = {
    require(weights.nonEmpty && weights.forall(_ > 0),
      s"weights must be positive, got $weights")
    // an integral cluster id is a contract: a string id would cast to
    // null inside the hash, null buckets fail every when(), and EVERY
    // row would silently land in the last split (all-test, no train)
    if (splitKey == null) {
      val t = df.schema(clusterCol).dataType
      require(Seq("long", "integer", "short", "byte").contains(t.typeName),
        s"leakageSafeSplit needs an integral cluster column; '$clusterCol' " +
          s"is $t (map string cluster ids to longs — e.g. xxhash64 — first)")
    }
    val total = weights.sum
    val key = Option(splitKey).getOrElse(draw(col(clusterCol)))
    val bucket = pmod(key.cast("long"), lit(total.toLong))
    val bounds = weights.scanLeft(0)(_ + _).tail // cumulative upper bounds
    val split = bounds.init.zipWithIndex.foldRight(
      lit(weights.size - 1): Column) { case ((ub, i), els) =>
      when(bucket < ub, lit(i)).otherwise(els)
    }
    df.withColumn("split", split.cast("int"))
  }
}
