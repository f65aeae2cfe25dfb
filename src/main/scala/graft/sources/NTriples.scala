package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.rdf.Quad

/** RDF text serialization (reference S10: Turtle load/save of the user
  * graph, `core/src/main/com/thymeflow/rdf/repository/RepositoryFactory
  * .scala:222-266` and `FileSynchronization.scala`). N-Quads/N-Triples is
  * the line-oriented member of the RDF family, which makes it the natural
  * distributed format: one statement per line, `spark.read.text` scans it
  * in parallel, serialization is a per-row format expression. */
object NTriples {

  private def escape(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")

  /** Shared by the SPARQL endpoint's N-Quads writer. */
  private[graft] def fmtTerm(value: String, kind: Byte, dt: String, lang: String): String =
    kind match {
      case Quad.IRI => s"<$value>"
      case Quad.BNODE => if (value.startsWith("_:")) value else s"_:$value"
      case _ =>
        val base = "\"" + escape(value) + "\""
        if (lang != null && lang.nonEmpty) s"$base@$lang"
        else if (dt != null && dt.nonEmpty && dt != Quad.Xsd.string) s"$base^^<$dt>"
        else base
    }

  /** The engine stores rdf:type as the COMPACT string "rdf:type"
    * (every converter, `Sparql`'s `a`, `Views`); serializers expand it
    * to the standard full IRI so external tools read valid RDF, and
    * every parser normalizes the full IRI back in predicate position —
    * round-trips are identity AND externally-authored `a`/@type
    * statements become visible to the engine's type-keyed queries. */
  private[sources] val RdfTypeIri =
    "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  private[sources] def normPred(p: String): String =
    if (p == RdfTypeIri) "rdf:type" else p
  private[sources] def expandPred(p: String): String =
    if (p == "rdf:type") RdfTypeIri else p

  /** One quad → one N-Quads line (the per-row kernel [[serialize]] maps). */
  private[sources] def serializeQuadLine(q: Quad): String = {
    val s = if (q.s.startsWith("_:")) q.s else s"<${q.s}>"
    s"$s <${expandPred(q.p)}> ${fmtTerm(q.o, q.oKind, q.oDt, q.oLang)} <${q.g}> ."
  }

  /** Serialize quads to N-Quads lines (graph as 4th term). */
  def serialize(quads: Dataset[Quad]): Dataset[String] = {
    import quads.sparkSession.implicits._
    quads.map(serializeQuadLine)
  }

  def write(quads: Dataset[Quad], path: String): Unit =
    serialize(quads).write.mode("overwrite").text(path)

  // the graph term may be an IRI or a blank node (N-Quads grammar);
  // with only <...> accepted here, the lazy object group used to
  // backtrack and swallow a blank-node graph label INTO the object
  // (silent corruption, not a reject). The blank-node alternative
  // excludes exactly the quote character: with `_:\S+` a literal object
  // ending in a bnode-looking token — `<s> <p> "see _:b1" .` — matched
  // with graph=`_:b1"` and objTerm=`"see`, which then failed LiteralObj
  // and silently dropped the quad; excluding `"` makes the engine
  // backtrack and parse the full literal as the object again. No
  // narrower class: BLANK_NODE_LABEL admits Unicode PN_CHARS, so an
  // ASCII-only class would reject valid labels (e.g. `_:bé1`) and drop
  // those quads the same silent way.
  private val Line =
    """^(<[^>]*>|_:\S+)\s+<([^>]*)>\s+(.+?)\s+(?:(<[^>]*>|_:[^"\s]+)\s+)?\.\s*$""".r
  private val LiteralObj =
    """^"((?:[^"\\]|\\.)*)"(?:@([A-Za-z0-9-]+)|\^\^<([^>]*)>)?$""".r

  // single left-to-right scan (shared with Turtle) — sequential
  // .replace corrupted escaped-backslash-then-letter sequences
  private def unescape(s: String): String = Turtle.unescape(s)

  /** Parse one N-Quads line (graph term optional → default graph). */
  private[sources] def parseLine(line: String, defaultGraph: String): Option[Quad] =
    line.trim match {
      case "" => None
      case l if l.startsWith("#") => None
      case Line(subj, pred0, objTerm, graphTerm) =>
        val s = if (subj.startsWith("<")) subj.substring(1, subj.length - 1) else subj
        val pred = normPred(pred0)
        val g = Option(graphTerm)
          .map(gt => if (gt.startsWith("<")) gt.substring(1, gt.length - 1) else gt)
          .getOrElse(defaultGraph)
        val obj = objTerm.trim
        if (obj.startsWith("<"))
          Some(Quad(s, pred, obj.substring(1, obj.length - 1), Quad.IRI, null, null, g))
        else if (obj.startsWith("_:"))
          Some(Quad(s, pred, obj, Quad.BNODE, null, null, g))
        else {
          obj match {
            case LiteralObj(lex, lang, dt) =>
              // canonical store form: plain and lang-tagged literals
              // carry NO datatype (matching every converter and the
              // Turtle parser — mixed-provenance quads must compare
              // equal), and an explicit ^^xsd:string normalizes away
              // (the writer never emits it)
              val dtNorm = Option(dt).filter(_ != Quad.Xsd.string).orNull
              Some(Quad(s, pred, unescape(lex), Quad.LITERAL, dtNorm, lang, g))
            case _ => None
          }
        }
      case _ => None
    }

  /** Distributed parse of an N-Quads/N-Triples file. */
  def read(spark: SparkSession, path: String,
      defaultGraph: String = "graft:default"): Dataset[Quad] = {
    import spark.implicits._
    spark.read.textFile(path).flatMap(parseLine(_, defaultGraph))
  }
}
