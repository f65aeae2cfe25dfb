package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory with the settings this engine assumes.
  *
  * Tuned for the driver's local[N] harness but written for cluster scale:
  * AQE on (runtime re-plan, skew-join splitting, partition coalescing),
  * shuffle partitions sized to the local core count (on a real cluster this
  * would be ~2-3x total executor cores or left to AQE).
  */
object GraftSession {
  def builder(appName: String = "graft", cores: String = "*"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", cores)
    SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      // Catalyst integration: custom expressions as SQL functions plus the
      // haversine-radius bounding-band optimizer rule.
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", if (cpus == "*") "32" else cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries INT64 TIMESTAMP(NANOS) which vanilla Spark
      // rejects; read as long and convert in Tables.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Unions over localCheckpoint lineage (our fixpoint loops) trip
      // Catalyst's Union constraint rewrite (stale attribute refs); the
      // engine states its filters explicitly, so inferred constraints are
      // dispensable.
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}

/** Loaders for the driver-provided parquet tables (see TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Normalize `ts` to a session-TZ TIMESTAMP regardless of how the
    // driver authored the file — the generator has shipped BOTH INT64
    // TIMESTAMP(NANOS) (arrives as long under nanosAsLong, see
    // GraftSession) and plain TIMESTAMP(MICROS) (arrives as
    // TIMESTAMP_NTZ, on which unix_micros/unix_seconds error out). The
    // session TZ is UTC, so the NTZ cast reinterprets to the identical
    // instant and every downstream time function behaves uniformly.
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType)
        // integral division: `/` on longs is double division, which loses
        // exactness at epoch-nanos magnitude (~1e18)
        d.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      else if (f.name == "ts" &&
          f.dataType == org.apache.spark.sql.types.TimestampNTZType)
        d.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      else d
    }
  }
}
