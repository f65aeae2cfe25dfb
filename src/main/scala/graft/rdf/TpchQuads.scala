package graft.rdf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Converter from the driver's relational test tables into quads — the
  * analogue of the reference's source converters (one input row → many
  * statements, `core/src/main/com/thymeflow/sync/converter/Converter.scala`).
  * Used to exercise the RDF layer against a SQL oracle on the same data.
  *
  * Only string/integer-valued objects are emitted so the lexical forms are
  * bit-stable across engines (doubles/timestamps would pull in formatting
  * differences irrelevant to what's being tested).
  */
object TpchQuads {

  private def q(s: org.apache.spark.sql.Column, p: String, o: org.apache.spark.sql.Column,
      kind: Byte, g: String) =
    struct(s.as("s"), lit(p).as("p"), o.cast("string").as("o"),
      lit(kind).as("oKind"), lit(null).cast("string").as("oDt"),
      lit(null).cast("string").as("oLang"), lit(g).as("g"))

  /** customer + nation + orders as one quad set. */
  def quads(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
    val nat = Tables(spark, dir, "nation")
    val ord = Tables(spark, dir, "orders")

    val custIri = concat(lit("c:"), col("c_custkey").cast("string"))
    val natIri = concat(lit("n:"), col("c_nationkey").cast("string"))
    val custQuads = cust.select(explode(array(
      q(custIri, "name", col("c_name"), Quad.LITERAL, "customer"),
      q(custIri, "nation", natIri, Quad.IRI, "customer"),
      q(custIri, "segment", col("c_mktsegment"), Quad.LITERAL, "customer"))).as("q"))

    val natIri2 = concat(lit("n:"), col("n_nationkey").cast("string"))
    val natQuads = nat.select(explode(array(
      q(natIri2, "name", col("n_name"), Quad.LITERAL, "nation"),
      q(natIri2, "region", concat(lit("r:"), col("n_regionkey").cast("string")),
        Quad.IRI, "nation"))).as("q"))

    val ordIri = concat(lit("o:"), col("o_orderkey").cast("string"))
    val ordQuads = ord.select(explode(array(
      q(ordIri, "cust", concat(lit("c:"), col("o_custkey").cast("string")), Quad.IRI, "orders"),
      q(ordIri, "status", col("o_orderstatus"), Quad.LITERAL, "orders"),
      q(ordIri, "priority", col("o_orderpriority"), Quad.LITERAL, "orders"))).as("q"))

    custQuads.union(natQuads).union(ordQuads).select(col("q.*"))
  }
}
