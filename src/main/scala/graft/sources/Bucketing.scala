package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: the cluster-scale co-located join technique
  * (SURVEY §7.2 "partitioning & shuffle"). Writing both sides of a hot
  * join bucketed by the join key lets Spark plan a SortMergeJoin with NO
  * shuffle exchange on either side — at 100 TB the difference between a
  * join that moves both tables across the network every query and one
  * that only streams co-located buckets. BucketingSpec asserts the
  * exchange-free plan shape on disk-backed tables.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table (Spark's bucketing
    * metadata lives in the catalog, so this goes through saveAsTable). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the property bucketed joins buy. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")

  /** Join two same-bucketed tables on their bucket column: with matching
    * bucket counts Spark plans this without exchanges. */
  def colocatedJoin(spark: SparkSession, table1: String, table2: String,
      key: String): DataFrame =
    spark.table(table1).join(spark.table(table2), key)
}
