package graft.entry

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Pins the oracle-fixture path derivation: the static oracle SQL of
  * q70/q76 bakes in the sf0.01 run's fixture path, so a change to
  * [[EntryKit.fixtureDir]]'s sanitization would silently break the
  * oracle ↔ engine agreement (the engine would write one path, the
  * oracle read another). */
class EntryKitSpec extends AnyFlatSpec with Matchers {

  "fixtureDir" should "map the driver's verify SF to the path the oracles read" in {
    EntryKit.fixtureDir("/root/testdata/sf0.01") shouldBe
      s"/tmp/graft_fixtures/${EntryKit.runId}/root_testdata_sf0.01"
    // and the baked-in oracle paths agree with the derivation (same JVM,
    // same runId — exactly the invariant Verify's substitution relies on)
    graft.SparkEntry.oracleSql("q70_langid") should include(
      EntryKit.fixtureDir("/root/testdata/sf0.01") + "/q70_trigram_profile.parquet")
    graft.SparkEntry.oracleSql("q76_image_embed") should include(
      EntryKit.fixtureDir("/root/testdata/sf0.01") + "/q76_pixels.parquet")
  }

  it should "separate runs at different SFs (no cross-contamination)" in {
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1", "/tmp/sf1", "relative/dir")
    val mapped = dirs.map(EntryKit.fixtureDir)
    mapped.distinct should have size dirs.size
    val prefix = s"/tmp/graft_fixtures/${EntryKit.runId}/"
    all(mapped) should startWith(prefix)
    // sanitization never produces path separators inside the leaf
    mapped.foreach(p => p.stripPrefix(prefix) should not include "/")
  }

  it should "separate concurrent runs at the SAME SF via the run id" in {
    // two concurrently-alive JVMs differ in pid (and usually start time),
    // so their fixture trees are disjoint even for identical data dirs
    EntryKit.fixtureDir("/root/testdata/sf0.01", "r1p100") should not be
      EntryKit.fixtureDir("/root/testdata/sf0.01", "r1p101")
    // the run id is a stable single path segment: no separators, nonempty
    EntryKit.runId should fullyMatch regex "r\\d+p\\d+"
    // within one JVM the derivation is stable — the query's write path
    // and the oracle's interpolated read path cannot drift apart
    EntryKit.fixtureDir("/root/testdata/sf0.01") shouldBe
      EntryKit.fixtureDir("/root/testdata/sf0.01")
  }
}
