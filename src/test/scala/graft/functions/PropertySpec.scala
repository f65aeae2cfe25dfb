package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.convert.Iri
import graft.spatial.Geo

/** Property-based checks in the spirit of the reference's RandSpec
  * (`mathematics/src/test/com/thymeflow/mathematics/probability/
  * RandSpec.scala`): invariants of the similarity/normalization/geo
  * kernels over randomized inputs. */
object SimilarityProps extends Properties("Similarity") {

  private val word = Gen.alphaLowerStr.map(_.take(12))

  property("jaroWinkler symmetric") = forAll(word, word) { (a, b) =>
    math.abs(Similarity.jaroWinkler(a, b) - Similarity.jaroWinkler(b, a)) < 1e-12
  }

  property("jaroWinkler bounded [0,1]") = forAll(word, word) { (a, b) =>
    val s = Similarity.jaroWinkler(a, b)
    s >= 0.0 && s <= 1.0
  }

  property("jaroWinkler identity") = forAll(word) { a =>
    a.isEmpty || Similarity.jaroWinkler(a, a) == 1.0
  }

  property("levenshtein symmetric and triangle-ish") = forAll(word, word) { (a, b) =>
    Similarity.levenshtein(a, b) == Similarity.levenshtein(b, a) &&
      Similarity.levenshtein(a, b) <= math.max(a.length, b.length)
  }

  property("levenshteinSim bounded") = forAll(word, word) { (a, b) =>
    val s = Similarity.levenshteinSim(a, b)
    s >= 0.0 && s <= 1.0
  }

  private val tokens = Gen.nonEmptyListOf(word.suchThat(_.nonEmpty)).map(_.take(6))
  private def weights(n: Int) = Gen.listOfN(n, Gen.choose(0.1, 5.0))

  property("softTfIdf symmetric") = forAll(tokens, tokens) { (t1, t2) =>
    forAll(weights(t1.size), weights(t2.size)) { (w1, w2) =>
      val a = Similarity.softTfIdf(t1, w1, t2, w2)
      val b = Similarity.softTfIdf(t2, w2, t1, w1)
      math.abs(a - b) < 1e-9
    }
  }

  property("softTfIdf self-similarity is 1") = forAll(tokens) { t =>
    val distinct = t.distinct
    forAll(weights(distinct.size)) { w =>
      math.abs(Similarity.softTfIdf(distinct, w, distinct, w) - 1.0) < 1e-9
    }
  }
}

object GeoProps extends Properties("Geo") {

  private val lat = Gen.choose(-89.0, 89.0)
  private val lon = Gen.choose(-179.0, 179.0)

  property("haversine symmetric, nonneg, zero at identity") =
    forAll(lat, lon, lat, lon) { (a1, o1, a2, o2) =>
      val d = Haversine.distanceMeters(a1, o1, a2, o2)
      val r = Haversine.distanceMeters(a2, o2, a1, o1)
      d >= 0 && math.abs(d - r) < 1e-6 &&
        Haversine.distanceMeters(a1, o1, a1, o1) == 0.0
    }

  property("haversine bounded by half circumference") =
    forAll(lat, lon, lat, lon) { (a1, o1, a2, o2) =>
      Haversine.distanceMeters(a1, o1, a2, o2) <=
        math.Pi * Haversine.EarthRadiusMeters + 1.0
    }

  property("hellingerSq in [0,1], zero at identity") =
    forAll(lat, lon, Gen.choose(1.0, 500.0), lat, lon, Gen.choose(1.0, 500.0)) {
      (a1, o1, s1, a2, o2, s2) =>
        val h = Geo.hellingerSq(a1, o1, s1, a2, o2, s2)
        val self = Geo.hellingerSq(a1, o1, s1, a1, o1, s1)
        h >= 0.0 && h <= 1.0 && math.abs(self) < 1e-12
    }

  property("position merge stays within the convex hull (lat)") =
    forAll(lat, lon, lat, lon, Gen.choose(1.0, 100.0)) { (a1, o1, a2, o2, acc) =>
      val c = Geo.PositionEstimate.single(a1, o1, acc, 0L)
      val m = Geo.merge(c, a2, o2, acc, 1L)
      m.lat >= math.min(a1, a2) - 1e-9 && m.lat <= math.max(a1, a2) + 1e-9
    }
}

object IriProps extends Properties("Iri") {

  property("nameUuid deterministic and well-formed") =
    forAll(Gen.asciiPrintableStr) { s =>
      val u = Iri.nameUuid(s)
      u == Iri.nameUuid(s) &&
        u.matches("[0-9a-f]{8}-[0-9a-f]{4}-5[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}")
    }

  property("splitEmail round-trips local@domain") =
    forAll(Gen.alphaLowerStr.suchThat(_.nonEmpty), Gen.alphaLowerStr.suchThat(_.nonEmpty)) {
      (l, d) =>
        Iri.splitEmail(s"$l@$d.com").contains((l, s"$d.com"))
    }
}
