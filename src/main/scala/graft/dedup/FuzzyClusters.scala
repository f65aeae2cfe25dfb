package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end fuzzy-dedup clustering — the composition a 100 TB curation
  * run actually executes. Candidate near-dup PAIRS (MinHash/LSH banding,
  * verified by exact Jaccard — [[Dedup.minhashLshPairs]]) are only half
  * the operator: near-duplication is transitive in practice (A≈B, B≈C ⇒
  * {A,B,C} are one cluster even when A,C drift below the threshold), so
  * production pipelines (CCNet, RefinedWeb, Dolma) close the pair set
  * into CONNECTED COMPONENTS and keep one canonical document per
  * component. This operator fuses the three stages:
  *
  *   pairs (banded LSH, exact-Jaccard verify)
  *     → undirected components, min-id label ([[graft.graph.GraphOps]])
  *     → per-cluster canonical keeper (minimum id — deterministic,
  *       engine-independent)
  *
  * Output: every input document with its `cluster_id` (the minimum
  * doc id of its near-dup component; singletons cluster to themselves)
  * and `is_keeper` (1 for the canonical representative).
  *
  * Scale shape: the pair set is the banded join's output (bounded by
  * banding, never all-pairs); components run the adaptive union-find /
  * distributed-label-propagation split of GraphOps (driver fast path is
  * byte-gated — near-dup graphs are SPARSE, edges ≪ docs, so even
  * billion-doc corpora usually fit the pair set in one box; past the
  * gate the label loop shuffles (id, label) pairs only). The final
  * cluster assignment is one left join of the doc ids against the
  * component table — the full corpus is never shuffled on text.
  *
  * Reference anchor: the reference deduplicates equivalent entities by
  * IFP-derived pair sets closed into equivalence classes before merging
  * (thymeflow enrichers resolve `owl:sameAs` graphs the same
  * pairs→components→representative way — `AgentMatchEnricher` elects a
  * canonical agent per matched set).
  */
object FuzzyClusters {

  /** Cluster `df` by near-duplicate text. `idCol` must be integral and
    * unique; `cluster_id` is the component's minimum id. */
  def minhashClusters(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 2,
      numHashes: Int = 32,
      bands: Int = 8,
      num: Int = 1,
      den: Int = 3): DataFrame = {
    val pairs = Dedup.minhashLshPairs(df, textCol, idCol, k, numHashes, bands, num, den)
    assign(df, idCol,
      pairs.select(col("id1").as("src"), col("id2").as("dst")))
  }

  /** Shared tail of both cluster paths: close `edges` into components
    * and assign every id its min-label cluster + keeper flag. */
  private def assign(df: DataFrame, idCol: String, edges: DataFrame): DataFrame = {
    val comps = graft.graph.GraphOps.connectedComponents(edges)
    df.select(col(idCol))
      .join(comps.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("component"), col(idCol)).as("cluster_id"))
      .withColumn("is_keeper",
        when(col("cluster_id") === col(idCol), lit(1)).otherwise(lit(0)))
  }

  /** The LINEAR-EDGE scale path: cluster by LSH band-bucket membership
    * alone (two documents connect iff any band hashes them to the same
    * bucket), skipping pair enumeration AND exact verification. Each
    * (band, bucket) contributes a STAR — (bucket-min doc, member) edges
    * — so the edge count is O(docs × bands) regardless of how many
    * near-clones a document has, where the verified path's pair graph
    * grows quadratically inside each duplicate family (the
    * fuzzyClusters500k probe: ~25 M verified pairs from 100-copy
    * replicas). This is the trade large corpus dedups
    * (SlimPajama/RefinedWeb-style MinHashLSH) make: banding-threshold
    * precision instead of exact-Jaccard verification, in exchange for
    * never materializing a clique.
    *
    * Same output contract as [[minhashClusters]]. Hot buckets (a
    * stop-shingle band collision) cost one aggregation key, not a
    * clique: the star is built with groupBy(min) + an equi-join back —
    * no per-bucket sort, no pair explosion. */
  def lshStarClusters(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 2,
      numHashes: Int = 32,
      bands: Int = 8): DataFrame = {
    val banded = Dedup.minhashBandBuckets(df, textCol, idCol, k, numHashes, bands)
      .localCheckpoint() // read twice: hub election + the join back
    val hubs = banded.groupBy(col("band"), col("bandHash"))
      .agg(min(col("id")).as("hub"))
    val edges = banded.join(hubs, Seq("band", "bandHash"))
      .where(col("id") =!= col("hub"))
      .select(col("hub").as("src"), col("id").as("dst"))
      .distinct()
    assign(df, idCol, edges)
  }
}
