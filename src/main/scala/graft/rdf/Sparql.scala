package graft.rdf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SPARQL-subset front end: parses the SELECT fragment every reference
  * enricher uses (SURVEY §2.2 — BGPs, OPTIONAL, UNION, GRAPH scoping,
  * FILTER comparisons, DISTINCT, ORDER BY, LIMIT) and compiles it onto the
  * [[Bgp]] DataFrame builders, so Catalyst optimizes the resulting plan
  * like any other query (reference lifecycle §3.1: parse → algebra →
  * evaluate, with RDF4J's evaluator replaced by Spark).
  *
  * Grammar (hand-rolled recursive descent, no dependencies):
  * {{{
  * SELECT [DISTINCT] (?v... | *) WHERE { group } [ORDER BY ?v [DESC]] [LIMIT n]
  * group   := element*
  * element := triple '.'?
  *          | OPTIONAL { group }
  *          | FILTER ( cond [&&/|| cond]* )
  *          | GRAPH term { group }
  *          | { group } UNION { group }
  * triple  := term term term
  * term    := ?var | <iri> | "literal" | bareword
  * cond    := ?var (=|!=|<|<=|>|>=) term-or-number
  * }}}
  */
object Sparql {

  // ------------------------------------------------------------- tokenizer

  private def tokenize(q: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    val n = q.length
    while (i < n) {
      val c = q(i)
      if (c.isWhitespace) i += 1
      else if (c == '<') {
        // '<' opens an IRI only if a whitespace-free <...> span follows;
        // otherwise it is the comparison operator
        val j = q.indexOf('>', i)
        val candidate = if (j > i) q.substring(i, j + 1) else ""
        if (j > i + 1 && !candidate.exists(_.isWhitespace)) { out += candidate; i = j + 1 }
        else if (i + 1 < n && q(i + 1) == '=') { out += "<="; i += 2 }
        else { out += "<"; i += 1 }
      }
      else if (c == '"') {
        val sb = new StringBuilder("\"")
        i += 1
        while (i < n && q(i) != '"') {
          if (q(i) == '\\' && i + 1 < n) { sb += q(i + 1); i += 2 }
          else { sb += q(i); i += 1 }
        }
        out += sb.append('"').toString; i += 1
      }
      else if ("{}().".contains(c)) { out += c.toString; i += 1 }
      else if (c == '&' || c == '|') { out += q.substring(i, i + 2); i += 2 }
      else if ("=<>!".contains(c)) {
        if (i + 1 < n && q(i + 1) == '=') { out += q.substring(i, i + 2); i += 2 }
        else { out += c.toString; i += 1 }
      }
      else {
        var j = i
        while (j < n && !q(j).isWhitespace && !"{}()<>=!&|.".contains(q(j))) j += 1
        // allow dots inside numbers and prefixed names (e.g. 0.5)
        if (j < n && q(j) == '.' && j + 1 < n && q(j + 1).isDigit) {
          var k = j + 1
          while (k < n && (q(k).isDigit)) k += 1
          j = k
        }
        out += q.substring(i, j); i = j
      }
    }
    out.toList
  }

  // ----------------------------------------------------------------- parser

  private sealed trait Element
  private final case class Triple(s: String, p: String, o: String) extends Element
  private final case class Opt(group: List[Element]) extends Element
  private final case class FilterCond(conds: List[(String, String, String)],
      ops: List[String]) extends Element
  private final case class Graphed(g: String, group: List[Element]) extends Element
  private final case class Union(left: List[Element], right: List[Element]) extends Element
  private final case class Bind(value: String, varName: String) extends Element
  private final case class Values(varName: String, values: List[String]) extends Element

  private final case class Query(
      distinct: Boolean, vars: Seq[String], group: List[Element],
      orderBy: Option[(String, Boolean)], limit: Option[Int])

  private class P(var tokens: List[String]) {
    def peek: String = tokens.headOption.getOrElse("")
    def next(): String = { val h = tokens.head; tokens = tokens.tail; h }
    def expect(t: String): Unit = {
      val h = next()
      require(h.equalsIgnoreCase(t), s"expected $t, got $h")
    }

    def query(): Query = {
      expect("SELECT")
      val distinct = peek.equalsIgnoreCase("DISTINCT") && { next(); true }
      val vars = scala.collection.mutable.ListBuffer[String]()
      var star = false
      while (peek.startsWith("?") || peek == "*") {
        val t = next()
        if (t == "*") star = true else vars += t.drop(1)
      }
      expect("WHERE")
      val g = block()
      var order: Option[(String, Boolean)] = None
      var limit: Option[Int] = None
      while (tokens.nonEmpty) {
        if (peek.equalsIgnoreCase("ORDER")) {
          next(); expect("BY")
          val v = next().stripPrefix("?")
          val desc = peek.equalsIgnoreCase("DESC") && { next(); true }
          if (peek.equalsIgnoreCase("ASC")) next()
          order = Some((v, desc))
        } else if (peek.equalsIgnoreCase("LIMIT")) {
          next(); limit = Some(next().toInt)
        } else sys.error(s"unexpected token ${peek}")
      }
      Query(distinct, if (star) Seq.empty else vars.toSeq, g, order, limit)
    }

    def block(): List[Element] = {
      expect("{")
      val elems = scala.collection.mutable.ListBuffer[Element]()
      while (peek != "}") {
        if (peek.equalsIgnoreCase("OPTIONAL")) { next(); elems += Opt(block()) }
        else if (peek.equalsIgnoreCase("FILTER")) { next(); elems += filter() }
        else if (peek.equalsIgnoreCase("GRAPH")) {
          next(); val g = term(); elems += Graphed(g, block())
        }
        else if (peek.equalsIgnoreCase("BIND")) {
          next(); expect("(")
          val v = term(); expect("AS"); val name = term(); expect(")")
          elems += Bind(v, name.stripPrefix("?"))
        }
        else if (peek.equalsIgnoreCase("VALUES")) {
          next()
          val name = term().stripPrefix("?")
          expect("{")
          val vals = scala.collection.mutable.ListBuffer[String]()
          while (peek != "}") vals += term()
          expect("}")
          elems += Values(name, vals.toList)
        }
        else if (peek == "{") {
          val left = block()
          expect("UNION")
          val right = block()
          elems += Union(left, right)
        }
        else {
          elems += Triple(term(), term(), term())
          if (peek == ".") next()
        }
      }
      expect("}")
      elems.toList
    }

    def filter(): FilterCond = {
      expect("(")
      val conds = scala.collection.mutable.ListBuffer[(String, String, String)]()
      val ops = scala.collection.mutable.ListBuffer[String]()
      var done = false
      while (!done) {
        val lhs = next()
        val op = next()
        require(Seq("=", "!=", "<", "<=", ">", ">=").contains(op), s"bad operator $op")
        val rhs = next()
        conds += ((lhs, op, rhs))
        if (peek == "&&" || peek == "||") ops += next() else done = true
      }
      expect(")")
      FilterCond(conds.toList, ops.toList)
    }

    def term(): String = next()
  }

  // --------------------------------------------------------------- compile

  private def termValue(t: String): String =
    if (t.startsWith("<")) t.substring(1, t.length - 1)
    else if (t.startsWith("\"")) t.substring(1, t.length - 1)
    else t

  private def toPattern(t: Triple, g: Option[String]): Bgp.Pattern = {
    def cv(x: String) = if (x.startsWith("?")) x else termValue(x)
    Bgp.Pattern(cv(t.s), cv(t.p), cv(t.o), g.map(termValue))
  }

  private def compileGroup(
      quads: DataFrame, group: List[Element], graph: Option[String]): DataFrame = {
    var current: Option[DataFrame] = None
    def join(df: DataFrame): Unit = current = current match {
      case None => Some(df)
      case Some(acc) =>
        val shared = acc.columns.intersect(df.columns).toSeq
        Some(if (shared.nonEmpty) acc.join(df, shared) else acc.crossJoin(df))
    }
    // triples first (they define bindings), then graph/union groups, then
    // OPTIONAL, then FILTER — SPARQL group semantics for this subset
    val (triples, rest) = group.partition(_.isInstanceOf[Triple])
    if (triples.nonEmpty)
      join(Bgp.bgp(quads, triples.map(t => toPattern(t.asInstanceOf[Triple], graph)): _*))
    rest.foreach {
      case Graphed(g, inner) => join(compileGroup(quads, inner, Some(g)))
      case Union(l, r) =>
        join(Bgp.union(compileGroup(quads, l, graph), compileGroup(quads, r, graph)))
      case Opt(inner) =>
        val left = current.getOrElse(sys.error("OPTIONAL without preceding bindings"))
        current = Some(Bgp.optional(left, quads,
          inner.collect { case t: Triple => toPattern(t, graph) }: _*))
      case f: FilterCond =>
        val df = current.getOrElse(sys.error("FILTER without bindings"))
        current = Some(df.where(filterColumn(f)))
      case Bind(v, name) =>
        val df = current.getOrElse(sys.error("BIND without bindings"))
        val value = if (v.startsWith("?")) col(v.drop(1)) else lit(termValue(v))
        current = Some(Bgp.bind(df, name, value))
      case Values(name, vals) =>
        val df = current.getOrElse(sys.error("VALUES without bindings"))
        current = Some(Bgp.values(df, name, vals.map(termValue)))
      case _: Triple => () // already handled
    }
    current.getOrElse(sys.error("empty group"))
  }

  private def filterColumn(f: FilterCond): Column = {
    def one(c: (String, String, String)): Column = {
      val (lhs, op, rhs) = c
      val l = col(lhs.stripPrefix("?"))
      val r: Column =
        if (rhs.startsWith("?")) col(rhs.drop(1))
        else if (rhs.matches("-?[0-9]+(\\.[0-9]+)?")) lit(rhs.toDouble)
        else lit(termValue(rhs))
      val lc = if (rhs.matches("-?[0-9]+(\\.[0-9]+)?")) l.cast("double") else l
      op match {
        case "=" => lc === r
        case "!=" => lc =!= r
        case "<" => lc < r
        case "<=" => lc <= r
        case ">" => lc > r
        case ">=" => lc >= r
      }
    }
    val cols = f.conds.map(one)
    f.ops.zip(cols.tail).foldLeft(cols.head) {
      case (acc, ("&&", c)) => acc && c
      case (acc, ("||", c)) => acc || c
      case (acc, _) => acc
    }
  }

  /** Parse and run a SPARQL SELECT over a quads DataFrame. */
  def select(quads: DataFrame, queryText: String): DataFrame = {
    val q = new P(tokenize(queryText)).query()
    var df = compileGroup(quads, q.group, None)
    if (q.vars.nonEmpty) df = df.select(q.vars.map(col): _*)
    if (q.distinct) df = df.distinct()
    q.orderBy.foreach { case (v, desc) =>
      df = df.orderBy(if (desc) col(v).desc else col(v).asc)
    }
    q.limit.foreach(l => df = df.limit(l))
    df
  }

  /** ASK variant. */
  def ask(quads: DataFrame, queryText: String): Boolean = {
    val body = queryText.trim.replaceFirst("(?i)^ASK", "SELECT * WHERE")
    !select(quads, body).isEmpty
  }
}
