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
      "/tmp/graft_fixtures/root_testdata_sf0.01"
    // and the baked-in oracle paths agree with the derivation
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
    all(mapped) should startWith("/tmp/graft_fixtures/")
    // sanitization never produces path separators inside the leaf
    mapped.foreach(p => p.stripPrefix("/tmp/graft_fixtures/") should not include "/")
  }
}
