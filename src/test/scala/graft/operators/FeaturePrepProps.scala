package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkSpec

/** Generative invariants for the winsorizer, checked against a JVM
  * reference on random grouped data:
  *   - bounds are order statistics OF THE GROUP (members, lo ≤ hi)
  *   - clipped values land in [lo, hi] and preserve in-band values
  *   - clipping is idempotent (clip ∘ clip = clip)
  */
object FeaturePrepProps extends Properties("FeaturePrep") {

  // each case is a full Spark job — 15 random groupings per property
  // exercise the rank arithmetic thoroughly without minutes of runtime
  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(15)

  private lazy val spark = SparkSpec.session

  private val groups: Gen[List[(String, Long)]] = for {
    nGroups <- Gen.choose(1, 4)
    rows <- Gen.listOfN(60, for {
      g <- Gen.choose(0, nGroups - 1).map(i => s"g$i")
      v <- Gen.choose(-50L, 50L)
    } yield (g, v))
  } yield rows

  private def run(rows: List[(String, Long)]): Array[(String, Long, Long, Long, Long)] = {
    import spark.implicits._
    FeaturePrep.winsorize(rows.toDF("g", "v"), "g", "v")
      .select("g", "v", "lo", "hi", "clipped")
      .as[(String, Long, Long, Long, Long)].collect()
  }

  property("bounds are group order statistics and clip into [lo, hi]") =
    forAll(groups) { rows =>
      val byGroup = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      run(rows).forall { case (g, v, lo, hi, clipped) =>
        val vs = byGroup(g)
        def cut(num: Int) = vs(((vs.length * num + 9) / 10 - 1).max(0))
        lo == cut(1) && hi == cut(9) && lo <= hi &&
          clipped == v.max(lo).min(hi)
      }
    }

  property("idempotent: clipping already-clipped values changes nothing") =
    forAll(groups) { rows =>
      val once = run(rows).map(t => (t._1, t._5)).toList
      val twice = run(once.map(t => (t._1, t._2)))
      twice.forall { case (_, v, _, _, clipped) => clipped == v }
    }
}
