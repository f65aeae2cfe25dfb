package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed equi-joins. AQE's skew-join split
  * covers sort-merge joins it can observe; salting is the recipe when
  * the skew sits where AQE can't re-plan — a join feeding a same-key
  * aggregation (the split would be undone by the shuffle), a streaming
  * micro-batch join (no runtime stats), or a build side small enough to
  * replicate but too big to broadcast whole.
  *
  * Mechanics: every PROBE row draws a deterministic salt in [0, s) by
  * hashing its whole row (xxhash64 — any salt works, it only spreads
  * rows; hashing the row keeps it deterministic under retries); the
  * BUILD side is replicated s× with one copy per salt; the join key
  * becomes (key, salt). A hot key's probe rows now land on s partitions
  * instead of one. Cost: the build shuffle grows s× — pick s ≈ the skew
  * factor, not the cluster size.
  *
  * Semantics are EXACTLY the plain inner join's (each probe row meets
  * each matching build row exactly once — on its own salt copy), which
  * is what the oracle states. */
object SaltedJoin {

  def inner(probe: DataFrame, build: DataFrame, keys: Seq[String],
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(keys.nonEmpty, "need at least one join key")
    val saltCol = "__salt"
    require(!probe.columns.contains(saltCol) && !build.columns.contains(saltCol),
      s"$saltCol collides with an input column")
    val p = probe.withColumn(saltCol,
      pmod(xxhash64(probe.columns.map(col): _*), lit(salts.toLong)).cast("int"))
    val b = build.withColumn(saltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    p.join(b, keys :+ saltCol).drop(saltCol)
  }
}
