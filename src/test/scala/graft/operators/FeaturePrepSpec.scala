package graft.operators

import graft.SparkSpec

class FeaturePrepSpec extends SparkSpec {

  behavior of "FeaturePrep.winsorize"

  it should "clip to the exact rank-order statistics per group" in {
    val s = spark
    import s.implicits._
    // group a: values 1..10 → lo = 1st smallest (ceil(10/10)=1 → 1),
    // hi = 9th smallest (ceil(90/10)=9 → 9); 10 clips to 9
    val df = (1L to 10L).map(v => ("a", v)).toDF("g", "v")
    val out = FeaturePrep.winsorize(df, "g", "v")
      .collect().map(r => (r.getLong(r.fieldIndex("v")), r.getLong(r.fieldIndex("clipped")))).toMap
    out(1L) shouldBe 1L
    out(5L) shouldBe 5L
    out(10L) shouldBe 9L
  }

  it should "leave singleton groups unclipped (lo = hi = the value)" in {
    val s = spark
    import s.implicits._
    val out = FeaturePrep.winsorize(Seq(("x", 42L)).toDF("g", "v"), "g", "v")
      .collect()
    out should have length 1
    out.head.getLong(out.head.fieldIndex("clipped")) shouldBe 42L
  }

  it should "pass null values through as null clipped, not the clip bound" in {
    val s = spark
    import s.implicits._
    // group a has real bounds (lo=1, hi=9 over 1..10); the null row must
    // stay null — an unguarded least/greatest would fabricate lo=1
    val df = (1L to 10L).map(v => ("a", Some(v))).toDF("g", "v")
      .unionByName(Seq(("a", Option.empty[Long])).toDF("g", "v"))
    val out = FeaturePrep.winsorize(df, "g", "v").collect()
    out should have length 11
    val nullRow = out.filter(_.isNullAt(out.head.fieldIndex("v")))
    nullRow should have length 1
    nullRow.head.isNullAt(nullRow.head.fieldIndex("clipped")) shouldBe true
    // and the non-null rows still clip against the null-free bounds
    out.filter(!_.isNullAt(out.head.fieldIndex("v")))
      .map(r => r.getLong(r.fieldIndex("v")) -> r.getLong(r.fieldIndex("clipped")))
      .toMap apply 10L shouldBe 9L
  }

  it should "keep an all-null group's rows with null bounds" in {
    val s = spark
    import s.implicits._
    val df = Seq(("z", Option.empty[Long]), ("z", Option.empty[Long]))
      .toDF("g", "v")
    val out = FeaturePrep.winsorize(df, "g", "v").collect()
    out should have length 2
    all(out.map(_.isNullAt(out.head.fieldIndex("clipped")))) shouldBe true
  }

  behavior of "FeaturePrep.looEncode"

  it should "exclude each row's own target from its group mean" in {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 100L))
      .toDF("k", "x")
    val out = FeaturePrep.looEncode(df, "k", "x", scale = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(r.fieldIndex("enc"))).toMap
    out((1L, 10L)) shouldBe 25L // (20+30)/2
    out((1L, 20L)) shouldBe 20L // (10+30)/2
    out((1L, 30L)) shouldBe 15L // (10+20)/2
    // singleton key: leave-one-out global mean = (10+20+30)/3 = 20
    out((2L, 100L)) shouldBe 20L
  }
}
