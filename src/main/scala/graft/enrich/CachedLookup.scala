package graft.enrich

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cache-first external lookup (reference T8: geocoder calls behind a
  * persistent MapDB cache, `thymeflow/src/main/com/thymeflow/spatial/
  * geocoding/CachedGeocoder.scala:82-122`, `core/src/main/com/thymeflow/
  * utilities/Cached.scala:23-137`, with `mapAsync(parallelism=2)` on the
  * miss path).
  *
  * Distributed shape: left-join the cache table first (hits short-circuit,
  * no external call), compute only the misses inside `mapPartitions` with
  * bounded per-partition concurrency, then return results plus the new
  * cache rows to persist. External I/O cost scales with the *miss* count,
  * not the data size — the property that makes enrichment affordable on a
  * 100 TB corpus where keys repeat heavily.
  */
object CachedLookup {

  final case class LookupResult(resolved: DataFrame, newCacheRows: DataFrame)

  /** @param input     rows with `keyCol`
    * @param cache     (key, value) table of previous lookups
    * @param lookupFn  the external call, executed once per distinct missed
    *                  key, at most `maxInFlight` concurrently per partition
    * @return input joined with values, plus the miss results for cache
    *         write-back */
  def lookup(
      input: DataFrame,
      keyCol: String,
      cache: DataFrame, // columns: key, value
      lookupFn: String => String,
      maxInFlight: Int = 2): LookupResult = {
    val spark = input.sparkSession
    import spark.implicits._

    val keyed = input.withColumnRenamed(keyCol, "key")
    // a miss is a key ABSENT from the cache, not a null value: a
    // persisted (key, null) row is a cached negative result and must
    // never re-trigger the external call — value-null detection re-paid
    // the lookup for no-result keys on every run (defeating the T8 cost
    // bound) and, once both the null row and a fresh row existed,
    // fanned the resolve join out into duplicates
    val missKeys = keyed.select("key").distinct()
      .join(broadcast(cache.select("key")), Seq("key"), "left_anti")
    // bounded-parallel external calls, one batch per partition (the
    // reference's mapAsync(parallelism); here: chunked parallel map)
    val missRows = missKeys.as[String].mapPartitions { keys =>
      val all = keys.toList // miss keys per partition are few by design
      if (all.isEmpty) Iterator.empty
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(maxInFlight)
        try {
          import java.util.concurrent.Callable
          val futures = all.map(k => pool.submit(new Callable[(String, String)] {
            override def call(): (String, String) = (k, lookupFn(k))
          }))
          futures.map(_.get()).iterator
        } finally pool.shutdown()
      }
    }.toDF("key", "value")
    val newCache = missRows.localCheckpoint() // call each miss exactly once
    val resolved = keyed
      .join(broadcast(cache.unionByName(newCache)), Seq("key"), "left_outer")
      .withColumnRenamed("key", keyCol)
    LookupResult(resolved, newCache)
  }
}
