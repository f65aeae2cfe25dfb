package graft

/** Every driver-contract query must ANALYZE and PLAN against the current
  * testdata schemas.
  *
  * Guards against the silent-loss failure mode found in round 8: the
  * driver regenerated events.parquet with a different timestamp physical
  * type (TIMESTAMP(NANOS) → TIMESTAMP(MICROS)/NTZ), two queries started
  * throwing at analysis time, and — because Verify logs failures to
  * stderr and the correctness compare only iterates dumped results —
  * CORRECTNESS_r07 simply omitted them instead of going red. This spec
  * makes any query that cannot plan a loud test failure, at a fraction
  * of full execution cost (forcing `executedPlan` runs analysis,
  * optimization, and physical planning — where schema-drift breakage
  * surfaces — plus any construction-time adaptive gates). Full
  * execution and value checking stay owned by Verify + the DuckDB
  * oracle gate, which run every round.
  */
class AllQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  "SparkEntry" should "plan every contract query against current testdata" in {
    val failures = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      try { fn(spark, dir).queryExecution.executedPlan; None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    withClue(failures.mkString("\n")) { failures shouldBe empty }
  }

  it should "serve the flagship entry query" in {
    SparkEntry.entry(spark).count() should be > 0L
  }
}
