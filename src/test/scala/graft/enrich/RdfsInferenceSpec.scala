package graft.enrich

import graft.SparkSpec

/** RDFS entailment rules (Inference.Rules.rdfs), mirroring the rule set
  * of the reference's stacked `ForwardChainingRDFSInferencer`
  * (`core/src/main/com/thymeflow/rdf/repository/RepositoryFactory.scala:167-173`):
  * rdfs2 (domain), rdfs3 (range), rdfs5/rdfs11 (subPropertyOf/subClassOf
  * transitivity), rdfs7 (subPropertyOf statement propagation), rdfs9
  * (subClassOf membership propagation). */
class RdfsInferenceSpec extends SparkSpec {
  import spark.implicits._

  private val rules = Inference.Rules(rdfs = Some(Inference.RdfsVocab()))

  private def infer(rows: (String, String, String)*): Set[(String, String, String)] =
    Inference.infer(rows.toDF("s", "p", "o"), rules)
      .select("s", "p", "o").as[(String, String, String)].collect().toSet

  "rdfs9 + rdfs11" should "propagate membership through a deep subclass chain" in {
    val got = infer(
      ("x", "rdf:type", "A"),
      ("A", "rdfs:subClassOf", "B"),
      ("B", "rdfs:subClassOf", "C"),
      ("C", "rdfs:subClassOf", "D"))
    got should contain allOf (
      ("x", "rdf:type", "B"), ("x", "rdf:type", "C"), ("x", "rdf:type", "D"),
      ("A", "rdfs:subClassOf", "C"), ("A", "rdfs:subClassOf", "D"),
      ("B", "rdfs:subClassOf", "D"))
    got should have size 6
  }

  "rdfs7 + rdfs5" should "propagate statements through transitive subPropertyOf" in {
    val got = infer(
      ("a", "hasMother", "b"),
      ("hasMother", "rdfs:subPropertyOf", "hasParent"),
      ("hasParent", "rdfs:subPropertyOf", "hasRelative"))
    got should contain allOf (
      ("a", "hasParent", "b"),
      ("a", "hasRelative", "b"),
      ("hasMother", "rdfs:subPropertyOf", "hasRelative"))
    got should have size 3
  }

  "rdfs2 and rdfs3" should "type subjects by domain and objects by range" in {
    val got = infer(
      ("a", "worksAt", "org1"),
      ("worksAt", "rdfs:domain", "Person"),
      ("worksAt", "rdfs:range", "Organization"))
    got shouldBe Set(
      ("a", "rdf:type", "Person"),
      ("org1", "rdf:type", "Organization"))
  }

  "rule interaction" should "cascade subproperty statements into domain/range typing" in {
    // the inferred hasParent statement must itself fire hasParent's domain
    val got = infer(
      ("a", "hasMother", "b"),
      ("hasMother", "rdfs:subPropertyOf", "hasParent"),
      ("hasParent", "rdfs:domain", "Child"),
      ("hasParent", "rdfs:range", "Parent"))
    got shouldBe Set(
      ("a", "hasParent", "b"),
      ("a", "rdf:type", "Child"),
      ("b", "rdf:type", "Parent"))
  }

  "a late schema statement" should "re-fire over existing instance data (semi-naive both directions)" in {
    // subclass edge only derivable AFTER membership has propagated:
    // checks the frontier x all / all x frontier symmetry
    val got = infer(
      ("x", "rdf:type", "A"),
      ("y", "rdf:type", "B"),
      ("A", "rdfs:subClassOf", "B"),
      ("B", "rdfs:subClassOf", "C"),
      ("C", "rdfs:subClassOf", "A"))
    // the cycle closes: every class reaches every other, every instance
    // gets every type (self-loops dropped by the engine's filter)
    val types = got.collect { case (s, "rdf:type", o) => (s, o) }
    types.filter(_._1 == "x") shouldBe Set(("x", "B"), ("x", "C"))
    types.filter(_._1 == "y") shouldBe Set(("y", "C"), ("y", "A"))
  }

  "literal object kinds" should "thread through rdfs7 and guard subject-position rules" in {
    import graft.rdf.Quad
    val quads = Seq(
      ("a", "name", "Ada Lovelace", Quad.LITERAL, "xsd:string", null),
      ("a", "knows", "b", Quad.IRI, null, null),
      ("name", "rdfs:subPropertyOf", "label", Quad.IRI, null, null),
      ("name", "rdfs:range", "Name", Quad.IRI, null, null),
      ("knows", "rdfs:range", "Person", Quad.IRI, null, null))
      .toDF("s", "p", "o", "oKind", "oDt", "oLang")
    val got = Inference.infer(quads,
        Inference.Rules(rdfs = Some(Inference.RdfsVocab())))
      .select("s", "p", "o", "oKind", "oDt")
      .as[(String, String, String, Byte, Option[String])].collect().toSet
    got shouldBe Set(
      // rdfs7 carries the literal kind AND datatype into the conclusion
      ("a", "label", "Ada Lovelace", Quad.LITERAL, Some("xsd:string")),
      // rdfs3 types the IRI object but must NOT put the literal "Ada
      // Lovelace" in subject position despite name's declared range
      ("b", "rdf:type", "Person", Quad.IRI, None))
  }

  "symmetric and inverse rules" should "not promote a literal object to subject position" in {
    import graft.rdf.Quad
    val quads = Seq(
      ("a", "spouse", "b", Quad.IRI, null, null),
      ("a", "spouse", "oops-a-literal", Quad.LITERAL, "xsd:string", null),
      ("a", "owns", "thing", Quad.IRI, null, null),
      ("a", "owns", "also-a-literal", Quad.LITERAL, null, null))
      .toDF("s", "p", "o", "oKind", "oDt", "oLang")
    val got = Inference.infer(quads,
        Inference.Rules(symmetric = Set("spouse"),
          inverseOf = Map("owns" -> "ownedBy")))
      .select("s", "p", "o").as[(String, String, String)].collect().toSet
    got shouldBe Set(("b", "spouse", "a"), ("thing", "ownedBy", "a"))
  }

  "bare (s, p, o) inputs" should "default to IRI kinds with the _: blank-node convention" in {
    import graft.rdf.Quad
    val got = Inference.infer(
        Seq(("a", "spouse", "_:b1")).toDF("s", "p", "o"),
        Inference.Rules(symmetric = Set("spouse")))
      .select("s", "p", "o", "oKind")
      .as[(String, String, String, Byte)].collect().toSet
    got shouldBe Set(("_:b1", "spouse", "a", Quad.IRI))
  }

  "OWL + RDFS" should "compose in one fixpoint" in {
    val got = Inference.infer(
      Seq(
        ("a", "spouse", "b"),
        ("spouse", "rdfs:domain", "Person"),
        ("spouse", "rdfs:range", "Person")).toDF("s", "p", "o"),
      Inference.Rules(symmetric = Set("spouse"),
        rdfs = Some(Inference.RdfsVocab())))
      .select("s", "p", "o").as[(String, String, String)].collect().toSet
    got shouldBe Set(
      ("b", "spouse", "a"), // symmetric (OWL rule)
      ("a", "rdf:type", "Person"), // domain of asserted
      ("b", "rdf:type", "Person")) // range of asserted (and domain of inferred)
  }
}
