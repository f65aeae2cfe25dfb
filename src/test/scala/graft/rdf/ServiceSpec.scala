package graft.rdf

import graft.SparkSpec

/** SPARQL 1.1 SERVICE federation: the engine's own endpoint plays the
  * remote peer — a query over a LOCAL store pulls bindings from a second,
  * separately-served store over real HTTP and joins on shared variables. */
class ServiceSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(String, String, String)], g: String = "g") =
    rows.map { case (s, p, o) => (s, p, o, 2.toByte, null: String, null: String, g) }
      .toDF("s", "p", "o", "oKind", "oDt", "oLang", "g")

  private val local = df(Seq(
    ("alice", "worksAt", "acme"),
    ("bob", "worksAt", "initech"),
    ("carol", "worksAt", "acme")))

  // the "remote" dataset: nobody's employer data, served over HTTP
  private val remote = df(Seq(
    ("acme", "city", "Berlin"),
    ("initech", "city", "Austin")))

  "SERVICE" should "federate a group to a remote endpoint and join on shared vars" in {
    val server = SparqlEndpoint.start(remote)
    try {
      val res = Sparql.select(local,
        s"""SELECT ?who ?city WHERE {
           |  ?who <worksAt> ?org .
           |  SERVICE <http://localhost:${server.port}/sparql> {
           |    ?org <city> ?city
           |  }
           |} ORDER BY ?who""".stripMargin)
        .as[(String, String)].collect().toSeq
      res shouldBe Seq(
        ("alice", "Berlin"), ("bob", "Austin"), ("carol", "Berlin"))
    } finally server.stop()
  }

  it should "treat SILENT failure as the unit table and propagate loud failure" in {
    // port 1 refuses connections: SILENT -> local bindings pass through
    val res = Sparql.select(local,
      """SELECT ?who WHERE {
        |  ?who <worksAt> ?org .
        |  SERVICE SILENT <http://localhost:1/sparql> { ?org <city> ?city }
        |} ORDER BY ?who""".stripMargin)
      .as[String].collect().toSeq
    res shouldBe Seq("alice", "bob", "carol")
    // without SILENT the failure surfaces
    an[Exception] should be thrownBy Sparql.select(local,
      """SELECT ?who WHERE {
        |  ?who <worksAt> ?org .
        |  SERVICE <http://localhost:1/sparql> { ?org <city> ?city }
        |}""".stripMargin)
  }

  it should "handle empty remote answers as zero solutions" in {
    val server = SparqlEndpoint.start(remote)
    try {
      Sparql.select(local,
        s"""SELECT ?who WHERE {
           |  ?who <worksAt> ?org .
           |  SERVICE <http://localhost:${server.port}/sparql> {
           |    ?org <country> ?c
           |  }
           |}""".stripMargin).count() shouldBe 0
    } finally server.stop()
  }
}
