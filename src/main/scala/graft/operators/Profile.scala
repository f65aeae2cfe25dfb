package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiler — the data-quality report run before any corpus goes
  * into a training mix (null rates, cardinalities, value ranges per
  * column; what Deequ/great-expectations compute, as one Spark plan).
  *
  * ONE aggregation pass produces every column's stats (count/distinct/
  * min/max computed side by side in a single wide `agg`), then the wide
  * row unpivots into one output row per column — at 100 TB the scan
  * happens once however many columns are profiled, and distinct counts
  * ride Spark's expand-based multi-distinct aggregation.
  *
  * min/max are cast to string for a uniform output schema; profile only
  * int/string/timestamp columns if the report feeds a hash-compared
  * oracle (float formatting differs across engines). */
object Profile {

  /** Output: (column, n_rows, n_null, n_distinct, min_s, max_s). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_s"), col(s"__max_$c").as("max_s"))
    }
    wide.select(explode(array(stacked: _*)).as("r")).select(col("r.*"))
  }
}
