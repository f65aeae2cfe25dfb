package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Generative invariants for the KMV bounded aggregator — the algebra
  * that makes partial aggregation, shuffle-order independence and
  * streaming-state reuse correct:
  *   - reduction ≡ sorted-distinct-take-k of the whole input
  *   - any split + merge ≡ sequential reduction (merge soundness,
  *     which with zero/commutativity gives every partitioning)
  *   - insert idempotence (replayed elements cannot move the sketch)
  */
object KmvProps extends Properties("KmvSketch") {

  private val kGen: Gen[Int] = Gen.choose(1, 8)
  private val values: Gen[List[Long]] =
    Gen.listOf(Gen.choose(0L, 30L)) // narrow domain → many duplicates

  private def reduceAll(agg: KmvSketch.MinKDistinctLongs, vs: Seq[Long]) =
    vs.foldLeft(agg.zero)(agg.reduce)

  property("reduce == sorted distinct take k") = forAll(kGen, values) { (k, vs) =>
    val agg = new KmvSketch.MinKDistinctLongs(k)
    agg.finish(reduceAll(agg, vs)) == vs.distinct.sorted.take(k)
  }

  property("split+merge == sequential for any cut point") =
    forAll(kGen, values, Gen.choose(0, 100)) { (k, vs, cutSeed) =>
      val agg = new KmvSketch.MinKDistinctLongs(k)
      val cut = if (vs.isEmpty) 0 else cutSeed % (vs.length + 1)
      val (l, r) = vs.splitAt(cut)
      agg.finish(agg.merge(reduceAll(agg, l), reduceAll(agg, r))) ==
        agg.finish(reduceAll(agg, vs))
    }

  property("merge commutes") = forAll(kGen, values, values) { (k, a, b) =>
    val agg = new KmvSketch.MinKDistinctLongs(k)
    val (ba, bb) = (reduceAll(agg, a), reduceAll(agg, b))
    agg.finish(agg.merge(ba, bb)) == agg.finish(agg.merge(bb, ba))
  }

  property("insert is idempotent") = forAll(kGen, values) { (k, vs) =>
    val agg = new KmvSketch.MinKDistinctLongs(k)
    val once = reduceAll(agg, vs)
    agg.finish(reduceAll(agg, vs ++ vs)) == agg.finish(once)
  }
}
