package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private val snap = Seq(
    (1L, "alice", 10L), (2L, "bob", 20L), (3L, "carol", 30L))
    .toDF("k", "name", "bal")

  private def ch(k: Long, name: String, bal: Long, seq: Long, op: String) =
    (k, name, bal, seq, op)

  private def run(changes: Seq[(Long, String, Long, Long, String)]) =
    Merge(snap, changes.toDF("k", "name", "bal", "seq", "op"),
      Seq("k"), "seq", "op")
      .as[(Long, String, Long)].collect().toSet

  "Merge" should "upsert, delete, and insert new keys" in {
    run(Seq(
      ch(1L, "alice2", 11L, 1L, "upsert"), // update existing
      ch(2L, "", 0L, 1L, "delete"), //         tombstone existing
      ch(9L, "zoe", 90L, 1L, "upsert"))) shouldBe Set( // brand-new key
      (1L, "alice2", 11L), (3L, "carol", 30L), (9L, "zoe", 90L))
  }

  it should "let the greatest sequence number win per key" in {
    run(Seq(
      ch(1L, "old", 1L, 5L, "upsert"),
      ch(1L, "new", 2L, 9L, "upsert"),
      ch(1L, "mid", 3L, 7L, "delete"))) should contain((1L, "new", 2L))
  }

  it should "resolve a delete-then-upsert at the same seq deterministically" in {
    // tie order is (seq, op, image) DESC: 'upsert' > 'delete'
    run(Seq(
      ch(1L, "resurrect", 7L, 5L, "upsert"),
      ch(1L, "", 0L, 5L, "delete"))) should contain((1L, "resurrect", 7L))
  }

  it should "apply a delete for a key absent from the snapshot as a no-op" in {
    run(Seq(ch(42L, "", 0L, 1L, "delete"))) shouldBe Set(
      (1L, "alice", 10L), (2L, "bob", 20L), (3L, "carol", 30L))
  }

  it should "leave the snapshot unchanged for an empty changelog" in {
    run(Seq.empty) shouldBe Set(
      (1L, "alice", 10L), (2L, "bob", 20L), (3L, "carol", 30L))
  }
}
