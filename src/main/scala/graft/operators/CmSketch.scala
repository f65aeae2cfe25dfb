package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch — the mergeable frequency sketch: `depth` hash
  * rows × `width` counters answer "how often does key x occur?" in
  * O(depth) with a one-sided error (estimates NEVER undercount, and
  * overcount by at most `n/width` with probability `1 − 2^-depth`).
  * At 100 TB this is how per-key frequencies survive when the key
  * cardinality itself won't fit anywhere: the sketch is `depth·width`
  * counters regardless of input size, partial sketches ADD
  * cell-wise (spec-pinned), so executors sketch locally and merge —
  * the same shape the exact heavy-hitters operator cannot take once
  * the key space explodes.
  *
  * The hash family is md5-derived (engine-independent, same rationale
  * as the deterministic-shuffle/classifier bucket family), so the
  * sketch — not just its answers — is bit-identical anywhere and the
  * oracle can restate it.
  *
  * Scale shape: one explode to `depth` (row, bucket) cells with
  * map-side combine onto at most `depth·width` groups; estimation
  * broadcasts the sketch (it is tiny by construction) against the
  * probe keys. The input is scanned once and never shuffled.
  */
object CmSketch {

  /** Hash row `j`'s counter index for `key`. */
  def bucket(key: Column, j: Int, width: Int): Column =
    conv(substring(md5(concat(lit(j + ":"), key.cast("string"))), 1, 15),
      16, 10).cast("long") % width

  /** Build the sketch: one row per non-empty cell (j, bucket, cnt). */
  def build(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame =
    df.select(explode(array((0 until depth).map(j =>
        struct(lit(j).as("j"), bucket(col(keyCol), j, width).as("bucket")))
        : _*)).as("c"))
      .groupBy(col("c.j").as("j"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point estimates for `probes` (distinct values of `keyCol`):
    * `est = min_j sketch[j][h_j(key)]`, 0 for a cell never touched.
    * The sketch side is broadcast — `depth·width` rows by construction. */
  def estimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame =
    probes.select(col(keyCol)).distinct()
      .select(col(keyCol), explode(array((0 until depth).map(j =>
        struct(lit(j).as("j"), bucket(col(keyCol), j, width).as("bucket")))
        : _*)).as("c"))
      .join(broadcast(sketch),
        col("c.j") === sketch("j") && col("c.bucket") === sketch("bucket"),
        "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).cast("long").as("est"))
}
