package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LM training — the GPT-style concat-and-chunk
  * preparation (Brown et al. 2020 §2.1: documents are concatenated in a
  * deterministic order and split into fixed-length training sequences;
  * document boundaries tracked so attention/loss masks can be derived).
  * A document whose tokens straddle a chunk boundary spans multiple
  * chunks.
  *
  * Scale shape: the global running sum is the classic two-pass
  * distributed prefix sum — range-partition by the order key, local
  * cumulative sums per partition, a partition-count-sized offset table
  * broadcast back. No single-partition window (Spark's unpartitioned
  * `Window.orderBy` funnels everything into one task), no driver state
  * beyond one row per partition. The output is invariant to the sampled
  * range boundaries, so results stay deterministic and hash-comparable
  * against a SQL oracle.
  */
object Packing {

  /** Chunk layout per document: order by `orderCol`, concatenate
    * `lenCol`-token documents, cut every `capacity` tokens. Zero-length
    * docs are dropped. Output per doc: token span [tok_start, tok_end),
    * first/last chunk ids, n_chunks spanned. */
  def concatChunks(
      docs: DataFrame,
      orderCol: String,
      lenCol: String,
      capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val spark = docs.sparkSession
    val parts = spark.sparkContext.defaultParallelism
    val ranged = docs
      .where(col(lenCol) > 0)
      .select(col(orderCol), col(lenCol).cast("long").as("__len"))
      .repartitionByRange(parts, col(orderCol))
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = ranged.withColumn("__local_end", sum(col("__len")).over(wLocal))
      .localCheckpoint() // offsets + final pass read the same computation
    // one row per partition -> prefix offsets on the driver (bounded)
    val totals = local.groupBy(col("__pid"))
      .agg(max(col("__local_end")).as("__total"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (pid, tot) =>
      val entry = (pid, acc); acc += tot; entry
    }.toMap
    val offCol = totals.foldLeft(lit(0L)) { case (acc, (pid, _)) =>
      when(col("__pid") === pid, lit(offsets(pid))).otherwise(acc)
    }
    local
      .withColumn("tok_end", col("__local_end") + offCol)
      .withColumn("tok_start", col("tok_end") - col("__len"))
      .select(
        col(orderCol),
        col("tok_start"),
        col("tok_end"),
        floor(col("tok_start") / capacity).as("first_chunk"),
        floor((col("tok_end") - 1) / capacity).as("last_chunk"))
      .withColumn("n_chunks", col("last_chunk") - col("first_chunk") + 1)
  }

  /** Chunk → contributing documents (the exploded mask-building view):
    * one row per (chunk, doc) with the token sub-span the doc occupies
    * inside that chunk. */
  def chunkMembers(
      docs: DataFrame,
      orderCol: String,
      lenCol: String,
      capacity: Long): DataFrame =
    concatChunks(docs, orderCol, lenCol, capacity)
      .select(col(orderCol), col("tok_start"), col("tok_end"),
        explode(sequence(col("first_chunk"), col("last_chunk"))).as("chunk"))
      .select(
        col("chunk"),
        col(orderCol),
        greatest(col("tok_start") - col("chunk") * capacity, lit(0L)).as("offset_in_chunk"),
        (least(col("tok_end"), (col("chunk") + 1) * capacity) -
          greatest(col("tok_start"), col("chunk") * capacity)).as("n_tokens_in_chunk"))
}
