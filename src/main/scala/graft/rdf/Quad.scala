package graft.rdf

import org.apache.spark.sql.types._

/** Canonical quad — one RDF statement with provenance.
  *
  * Mirrors the reference's `Statement` (subject, predicate, object, context)
  * as used throughout `core/src/main/com/thymeflow/rdf/model/StatementSet.scala:10-41`;
  * the context/named-graph column `g` carries provenance exactly like the
  * reference's per-document and per-enricher contexts
  * (`core/src/main/com/thymeflow/enricher/InverseFunctionalPropertyInferencer.scala:19`).
  *
  * Physical layout for scale: store partitioned by `g` (so a document/
  * enricher graph replace is a partition overwrite, not a merge scan) and
  * sorted by (p, s) within files so predicate-filtered scans prune pages.
  */
case class Quad(
    s: String,
    p: String,
    o: String,
    oKind: Byte, // 0=IRI, 1=BNODE, 2=LITERAL
    oDt: String, // literal datatype IRI; null unless oKind=2
    oLang: String, // language tag; nullable
    g: String)

object Quad {
  val IRI: Byte = 0
  val BNODE: Byte = 1
  val LITERAL: Byte = 2

  val schema: StructType = StructType(Seq(
    StructField("s", StringType, nullable = false),
    StructField("p", StringType, nullable = false),
    StructField("o", StringType, nullable = false),
    StructField("oKind", ByteType, nullable = false),
    StructField("oDt", StringType, nullable = true),
    StructField("oLang", StringType, nullable = true),
    StructField("g", StringType, nullable = false)))

  /** XSD datatype IRIs the engine normalizes (SURVEY §1.3). */
  object Xsd {
    val string = "http://www.w3.org/2001/XMLSchema#string"
    val dateTime = "http://www.w3.org/2001/XMLSchema#dateTime"
    val double = "http://www.w3.org/2001/XMLSchema#double"
    val decimal = "http://www.w3.org/2001/XMLSchema#decimal"
    val long = "http://www.w3.org/2001/XMLSchema#long"
    val boolean = "http://www.w3.org/2001/XMLSchema#boolean"
  }
}
