package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot diff: classify every key across two table versions as
  * added / removed / changed / unchanged — the audit step between
  * pipeline runs ("what did this rebuild actually touch?") and the
  * generalization of `rdf.QuadStore.diff` to arbitrary keyed tables.
  *
  * Change detection hashes the non-key columns (xxhash64 over the
  * struct) on EACH SIDE BEFORE the join, so the full-outer join carries
  * keys + 8-byte fingerprints — never two full row payloads — and the
  * comparison is null-safe (a null-vs-value column difference is a
  * change, two nulls are not). One shuffle per side on the key.
  */
object TableDiff {

  /** One row per key present in either version: (keys…, status). */
  def diff(before: DataFrame, after: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty)
    require(before.columns.sameElements(after.columns),
      "both versions must share a schema")
    val dataCols = before.columns.filterNot(keyCols.contains).toSeq
    // Spark's hash functions SKIP null inputs (a null column leaves the
    // seed untouched), so (null, x) and (x, null) would collide; an
    // explicit per-column null flag restores injectivity over null
    // placement.
    def hashed(df: DataFrame, h: String): DataFrame =
      if (dataCols.isEmpty) df.select(keyCols.map(col): _*).withColumn(h, lit(0L))
      else df.select(keyCols.map(col) :+
        xxhash64(dataCols.flatMap(c => Seq(
          col(c).isNull.cast("int"),
          coalesce(col(c).cast("string"), lit("")))): _*).as(h): _*)
    hashed(before, "__hb").join(hashed(after, "__ha"), keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(col("__hb").isNull, "added")
          .when(col("__ha").isNull, "removed")
          .when(col("__hb") === col("__ha"), "unchanged")
          .otherwise("changed").as("status"): _*)
  }

  /** The one-line audit summary: counts per status. */
  def summary(before: DataFrame, after: DataFrame,
      keyCols: Seq[String]): DataFrame =
    diff(before, after, keyCols)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
}
