package graft.rdf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity views — the reference's de-facto logical schema (SURVEY §1.4):
  * every enricher immediately reshapes triples into flat tuples via SPARQL
  * SELECT; here the same reshape is a predicate-pivot over the quad table,
  * yielding one typed DataFrame per entity class (Agent, EmailMessage,
  * Event, Location, ...).
  *
  * Multi-valued predicates (e.g. schema:email) become arrays; single-valued
  * ones take the min lexical value for determinism. The pivot is a single
  * groupBy over a predicate-filtered scan — predicate pushdown keeps the
  * scan narrow, and the shuffle is keyed on the subject.
  */
object Views {

  /** Flatten subjects of type `typeIri` into one row per subject with one
    * column per requested predicate.
    *
    * @param single predicates projected as a deterministic scalar (min)
    * @param multi  predicates projected as sorted arrays */
  def entityView(
      quads: DataFrame,
      typeIri: String,
      single: Map[String, String], // predicate IRI -> column name
      multi: Map[String, String] = Map.empty): DataFrame = {
    val subjects = quads
      .where(col("p") === "rdf:type" && col("o") === typeIri)
      .select(col("s").as("id")).distinct()
    val wanted = (single.keySet ++ multi.keySet).toSeq
    val props = quads.where(col("p").isin(wanted: _*))
      .select(col("s").as("id"), col("p"), col("o"))
    val aggs =
      single.toSeq.map { case (p, name) =>
        min(when(col("p") === p, col("o"))).as(name)
      } ++ multi.toSeq.map { case (p, name) =>
        sort_array(collect_set(when(col("p") === p, col("o")))).as(name)
      }
    subjects.join(props, Seq("id"), "left_outer")
      .groupBy(col("id"))
      .agg(aggs.head, aggs.tail: _*)
  }

  private val S = graft.convert.Converters.schemaOrg

  /** Agent(id, name, givenName, familyName, emails[]) — the view behind
    * AgentMatchEnricher's base query. */
  def agents(quads: DataFrame): DataFrame =
    entityView(quads, "personal:Agent",
      single = Map(
        S + "name" -> "name",
        S + "givenName" -> "given_name",
        S + "familyName" -> "family_name"),
      multi = Map(S + "email" -> "emails"))

  /** EmailMessage(id, headline, dateSent, sender, recipients[]). */
  def emailMessages(quads: DataFrame): DataFrame =
    entityView(quads, S + "EmailMessage",
      single = Map(
        S + "headline" -> "headline",
        S + "dateSent" -> "date_sent",
        S + "sender" -> "sender"),
      multi = Map(S + "recipient" -> "recipients"))

  /** Event(id, name, startDate, endDate, location, attendees[]). */
  def events(quads: DataFrame): DataFrame =
    entityView(quads, S + "Event",
      single = Map(
        S + "name" -> "name",
        S + "startDate" -> "start_date",
        S + "endDate" -> "end_date",
        S + "location" -> "location"),
      multi = Map(S + "attendee" -> "attendees"))

  /** Location observation(id, time, geo, uncertainty). */
  def locations(quads: DataFrame): DataFrame =
    entityView(quads, "personal:Location",
      single = Map(
        "personal:time" -> "time",
        S + "geo" -> "geo",
        "personal:uncertainty" -> "uncertainty"))
}
