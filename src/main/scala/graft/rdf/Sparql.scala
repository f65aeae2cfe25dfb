package graft.rdf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SPARQL-subset front end: parses the SELECT fragment every reference
  * enricher uses (SURVEY §2.2 — BGPs, OPTIONAL, UNION, GRAPH scoping,
  * FILTER comparisons, DISTINCT, ORDER BY, LIMIT, and the aggregate /
  * property-path / sub-SELECT forms of the reference's enricher queries)
  * and compiles it onto the [[Bgp]] DataFrame builders, so Catalyst
  * optimizes the resulting plan like any other query (reference lifecycle
  * §3.1: parse → algebra → evaluate, with RDF4J's evaluator replaced by
  * Spark).
  *
  * Aggregates target the reference's message-count query
  * (`thymeflow/src/main/com/thymeflow/enricher/entityresolution/
  * AgentMatchEnricher.scala:101-112`); `p*` paths and sub-SELECT target
  * the primary-facet query (`core/src/main/com/thymeflow/enricher/
  * PrimaryFacetEnricher.scala:18-28`); `p1/p2` sequence paths target the
  * email-address query (`AgentMatchEnricher.scala:95-99`).
  *
  * Grammar (hand-rolled recursive descent, no dependencies):
  * {{{
  * query   := (PREFIX ns: <iri>)*
  *            SELECT [DISTINCT] (?v | (AGG(?v|*) AS ?alias) | *)... [WHERE] { group }
  *            [GROUP BY ?v...] [HAVING (AGG(?v) op value)]
  *            [ORDER BY key...] [OFFSET n] [LIMIT n]
  *          | (PREFIX...)* ASK { group }
  *          | (PREFIX...)* CONSTRUCT { template } WHERE { group }
  *          | (PREFIX...)* DESCRIBE (<iri>|?v|*)... [WHERE { group }]
  * AGG     := COUNT | SUM | MIN | MAX | AVG
  *          | GROUP_CONCAT[(x; SEPARATOR="s")] | SAMPLE
  * update  := INSERT DATA { quads } | DELETE DATA { quads }
  *          | DELETE [{t}] [INSERT {t}] WHERE { group } | DELETE WHERE { group }
  * group   := element*
  * element := triples '.'?                 (with ';' and ',' lists)
  *          | OPTIONAL { group }
  *          | FILTER ( cond [&&/|| cond]* )
  *          | FILTER [NOT] EXISTS { group }
  *          | GRAPH term { group }
  *          | { group } UNION { group }
  *          | { SELECT ... }               (sub-select)
  * triple  := term path term | term ('!' pterm | '!(' pterm ('|' pterm)* ')') term
  * path    := step ('/' step)*
  * step    := ['^'] (pterm | '(' pterm ('|' pterm)* ')') ['*'|'+'|'?']
  * pterm   := <iri> | bareword | 'a' (→ rdf:type)
  * term    := ?var | <iri> | "literal" | bareword
  * object  := term ["^^"<dt> | "@"lang]     (typed/tagged literals)
  * key     := ?v | AGG(?v) | DESC(...) | ASC(...)   (several keys allowed)
  * cond    := ?var (=|!=|<|<=|>|>=) term-or-number
  *          | [!] (REGEX|STRSTARTS|STRENDS|CONTAINS)(?v, "s") | [!] BOUND(?v)
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
      else if ("{}().;,/^".contains(c)) { out += c.toString; i += 1 }
      else if (c == '&' || c == '|') {
        // '&&'/'||' are the boolean connectives; a single '|' separates
        // the members of a negated property set !(p1|p2)
        if (i + 1 < n && q(i + 1) == c) { out += q.substring(i, i + 2); i += 2 }
        else { out += c.toString; i += 1 }
      }
      else if ("=<>!".contains(c)) {
        if (i + 1 < n && q(i + 1) == '=') { out += q.substring(i, i + 2); i += 2 }
        else { out += c.toString; i += 1 }
      }
      else {
        var j = i
        while (j < n && !q(j).isWhitespace && !"{}()<>=!&|.;,/^".contains(q(j))) j += 1
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
  /** `s (p1|p2) o` — property alternation (one hop, any listed predicate). */
  private final case class AltTriple(s: String, preds: List[String], o: String) extends Element
  /** `s p* o` (mod='*'), `s p+ o` (mod='+'), `s p? o` (mod='?');
    * `preds.size > 1` closes over the union of the edge relations
    * (`(p1|p2)*`). */
  private final case class StarPath(s: String, preds: List[String], o: String,
      mod: Char = '*') extends Element
  private final case class Opt(group: List[Element]) extends Element
  private final case class FilterCond(conds: List[(String, String, String)],
      ops: List[String]) extends Element
  private final case class Graphed(g: String, group: List[Element]) extends Element
  private final case class Union(left: List[Element], right: List[Element]) extends Element
  private final case class Bind(value: String, varName: String) extends Element
  /** VALUES ?v { t... } or VALUES (?a ?b) { (t t)... } — inline data. */
  private final case class Values(names: List[String],
      rows: List[List[String]]) extends Element
  private final case class SubSelect(query: Query) extends Element
  /** `s !(p1|p2) o` — any predicate NOT in the set (SPARQL negated
    * property set). */
  private final case class NegPropSet(s: String, preds: List[String], o: String) extends Element
  /** FILTER EXISTS { group } / FILTER NOT EXISTS { group } — semi/anti
    * join of the current bindings against the inner group. `minus` marks
    * the MINUS form, whose no-shared-variable semantics differ (SPARQL
    * 1.1 §8.3.3: solutions with disjoint domains are NOT compatible, so
    * MINUS removes nothing — NOT EXISTS would remove everything). */
  private final case class Exists(group: List[Element], negated: Boolean,
      minus: Boolean = false) extends Element

  private sealed trait SelectItem
  private final case class PlainVar(name: String) extends SelectItem
  /** e.g. (COUNT(?msg) AS ?msgCount); arg "*" for COUNT(*). */
  private final case class AggItem(fn: String, arg: String, distinct: Boolean,
      alias: String, sep: Option[String] = None) extends SelectItem

  private sealed trait OrderKey
  private final case class VarKey(name: String) extends OrderKey
  private final case class AggKey(fn: String, arg: String) extends OrderKey

  /** HAVING (AGG(?v) op value) — filter on an aggregated group. */
  private final case class Having(fn: String, arg: String, op: String,
      value: String)

  private final case class Query(
      distinct: Boolean, items: Seq[SelectItem], group: List[Element],
      groupBy: Seq[String], orderBy: Seq[(OrderKey, Boolean)],
      limit: Option[Int], offset: Option[Int] = None,
      having: Option[Having] = None)

  /** Strip PREFIX declarations and expand declared prefixed names into
    * full <iri> tokens (SPARQL 1.1 §4.1.1). Only prefixes the query
    * declares are expanded — bare `ns:local` tokens with no declaration
    * pass through untouched (this engine's stores use them as literal
    * IRI strings). */
  private def expandPrefixes(tokens: List[String]): List[String] = {
    val prefixes = scala.collection.mutable.HashMap[String, String]()
    val rest = scala.collection.mutable.ListBuffer[String]()
    var ts = tokens
    while (ts.nonEmpty) {
      ts match {
        case p :: decl :: iri :: tail if p.equalsIgnoreCase("PREFIX") &&
            decl.endsWith(":") && iri.startsWith("<") =>
          prefixes(decl.dropRight(1)) = iri.substring(1, iri.length - 1)
          ts = tail
        case h :: tail => rest += h; ts = tail
        case Nil => ()
      }
    }
    val Pname = "^([A-Za-z][A-Za-z0-9_-]*):(.*)$".r
    rest.toList.map {
      case t @ Pname(p, local) if prefixes.contains(p) &&
          !t.startsWith("<") && !t.startsWith("\"") =>
        "<" + prefixes(p) + local + ">"
      case t => t
    }
  }

  private val AggFns =
    Set("COUNT", "SUM", "MIN", "MAX", "AVG", "GROUP_CONCAT", "SAMPLE")

  private class P(var tokens: List[String]) {
    def peek: String = tokens.headOption.getOrElse("")
    def peek2: String = tokens.drop(1).headOption.getOrElse("")
    def next(): String = { val h = tokens.head; tokens = tokens.tail; h }
    def expect(t: String): Unit = {
      val h = next()
      require(h.equalsIgnoreCase(t), s"expected $t, got $h")
    }

    private def aggExpr(): (String, String, Boolean, Option[String]) = {
      val fn = next().toUpperCase
      require(AggFns.contains(fn), s"unsupported aggregate $fn")
      expect("(")
      val distinct = peek.equalsIgnoreCase("DISTINCT") && { next(); true }
      val arg = next() // ?var or *
      // GROUP_CONCAT(?x; SEPARATOR="..") — SPARQL 1.1 §11.4.7
      val sep =
        if (peek == ";") {
          next(); expect("SEPARATOR"); expect("=")
          Some(termValue(next()))
        } else None
      expect(")")
      (fn, arg, distinct, sep)
    }

    def query(): Query = {
      expect("SELECT")
      val distinct = peek.equalsIgnoreCase("DISTINCT") && { next(); true }
      val items = scala.collection.mutable.ListBuffer[SelectItem]()
      var star = false
      while (peek.startsWith("?") || peek == "*" || peek == "(") {
        if (peek == "(") {
          next()
          val (fn, arg, dist, sep) = aggExpr()
          expect("AS")
          val alias = next().stripPrefix("?")
          expect(")")
          items += AggItem(fn, arg, dist, alias, sep)
        } else {
          val t = next()
          if (t == "*") star = true else items += PlainVar(t.drop(1))
        }
      }
      if (peek.equalsIgnoreCase("WHERE")) next() // WHERE is optional
      val g = block()
      val order = scala.collection.mutable.ListBuffer[(OrderKey, Boolean)]()
      var having: Option[Having] = None
      var limit: Option[Int] = None
      var offset: Option[Int] = None
      val groupVars = scala.collection.mutable.ListBuffer[String]()
      while (tokens.nonEmpty && peek != "}") {
        if (peek.equalsIgnoreCase("GROUP")) {
          next(); expect("BY")
          while (peek.startsWith("?")) groupVars += next().drop(1)
        } else if (peek.equalsIgnoreCase("HAVING")) {
          next(); expect("(")
          val (fn, arg, _, _) = aggExpr()
          val op = next()
          val v = next()
          expect(")")
          having = Some(Having(fn, arg, op, v))
        } else if (peek.equalsIgnoreCase("OFFSET")) {
          next(); offset = Some(next().toInt)
        } else if (peek.equalsIgnoreCase("ORDER")) {
          next(); expect("BY")
          def oneKey(): (OrderKey, Boolean) = {
            var desc = false
            val key: OrderKey =
              if (peek.equalsIgnoreCase("DESC") || peek.equalsIgnoreCase("ASC")) {
                desc = next().equalsIgnoreCase("DESC")
                expect("(")
                val k =
                  if (peek.startsWith("?")) VarKey(next().drop(1))
                  else { val (fn, arg, _, _) = aggExpr(); AggKey(fn, arg) }
                expect(")")
                k
              } else if (AggFns.contains(peek.toUpperCase)) {
                val (fn, arg, _, _) = aggExpr(); AggKey(fn, arg)
              } else VarKey(next().stripPrefix("?"))
            // postfix DESC/ASC — but not when it opens the NEXT key's
            // prefix form (DESC(?v))
            if (peek.equalsIgnoreCase("DESC") && peek2 != "(") { desc = true; next() }
            else if (peek.equalsIgnoreCase("ASC") && peek2 != "(") next()
            (key, desc)
          }
          order += oneKey()
          // further sort keys until a non-key token (LIMIT/OFFSET/...)
          while (peek.startsWith("?") || AggFns.contains(peek.toUpperCase) ||
            peek.equalsIgnoreCase("DESC") || peek.equalsIgnoreCase("ASC"))
            order += oneKey()
        } else if (peek.equalsIgnoreCase("LIMIT")) {
          next(); limit = Some(next().toInt)
        } else sys.error(s"unexpected token ${peek}")
      }
      Query(distinct, if (star) Seq.empty else items.toSeq, g,
        groupVars.toSeq, order.toList, limit, offset, having)
    }

    private var freshId = 0
    private def fresh(): String = { freshId += 1; s"?__path$freshId" }

    /** Parse the triples after one subject: `s path o (, o)* (; path o...)*`
      * A path step may be inverted (`^p`); a predicate position may be a
      * negated property set (`!p` / `!(p1|p2)`). */
    private def triples(elems: scala.collection.mutable.ListBuffer[Element]): Unit = {
      val s = term()
      var done = false
      while (!done) {
        if (peek == "!") {
          // negated property set: !p or !(p1|p2) — no modifiers/sequences
          next()
          val preds = scala.collection.mutable.ListBuffer[String]()
          if (peek == "(") {
            next(); preds += pterm()
            while (peek == "|") { next(); preds += pterm() }
            expect(")")
          } else preds += pterm()
          var moreObjects = true
          while (moreObjects) {
            elems += NegPropSet(s, preds.toList, objTerm())
            moreObjects = peek == "," && { next(); true }
          }
        } else {
          // predicate path: step ('/' step)*,
          // step := ['^'] (pterm | '(' pterm ('|' pterm)* ')') ['*'|'+'|'?']
          // — per-step modifiers, as the reference's guard query uses
          // (`AbstractEnricher.scala:17-23`: sameAs*/differentFrom/sameAs*);
          // alternation sets close over the union relation ((p1|p2)*)
          def modded(): (List[String], Boolean, Option[Char]) = {
            val (ps, inv) = pstepSet()
            val mod =
              if (peek == "*" || peek == "+" || peek == "?") Some(next().head) else None
            (ps, inv, mod)
          }
          val steps = scala.collection.mutable.ListBuffer(modded())
          while (peek == "/") { next(); steps += modded() }
          var moreObjects = true
          while (moreObjects) {
            val o = objTerm()
            // chain through fresh intermediate variables; each step is a
            // plain/alternation triple or a closure, inverted in place
            // (p1/^p2*/...) — `?s (^p)* ?o` ≡ `?o p* ?s`: closures and
            // alternations swap endpoints too
            var subj = s
            steps.toList.zipWithIndex.foreach { case ((ps, inv, mod), i) =>
              val obj = if (i == steps.size - 1) o else fresh()
              val (from, to) = if (inv) (obj, subj) else (subj, obj)
              elems += ((ps, mod) match {
                case (p :: Nil, None) => Triple(from, p, to)
                case (many, None) => AltTriple(from, many, to)
                case (many, Some(m)) => StarPath(from, many, to, m)
              })
              subj = obj
            }
            moreObjects = peek == "," && { next(); true }
          }
        }
        if (peek == ";") { next(); done = peek == "." || peek == "}" }
        else done = true
      }
      if (peek == ".") next()
    }

    def block(): List[Element] = {
      expect("{")
      val elems = scala.collection.mutable.ListBuffer[Element]()
      while (peek != "}") {
        if (peek.equalsIgnoreCase("OPTIONAL")) {
          next(); elems += Opt(block())
          if (peek == ".") next()
        }
        else if (peek.equalsIgnoreCase("FILTER")) {
          next()
          if (peek.equalsIgnoreCase("EXISTS")) {
            next(); elems += Exists(block(), negated = false)
            if (peek == ".") next()
          } else if (peek.equalsIgnoreCase("NOT")) {
            next(); expect("EXISTS"); elems += Exists(block(), negated = true)
            if (peek == ".") next()
          } else elems += filter()
        }
        else if (peek.equalsIgnoreCase("MINUS")) {
          // SPARQL MINUS: drop solutions compatible with the inner group
          // on their shared variables — an anti-join when variables are
          // shared; with NO shared variables MINUS keeps every solution
          // (§8.3.3), handled at compile time via the `minus` flag
          next(); elems += Exists(block(), negated = true, minus = true)
          if (peek == ".") next()
        }
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
          val names = scala.collection.mutable.ListBuffer[String]()
          if (peek == "(") {
            next(); while (peek != ")") names += term().stripPrefix("?")
            expect(")")
          } else names += term().stripPrefix("?")
          expect("{")
          val rows = scala.collection.mutable.ListBuffer[List[String]]()
          while (peek != "}") {
            if (peek == "(") {
              next()
              val r = scala.collection.mutable.ListBuffer[String]()
              while (peek != ")") r += objTerm()
              expect(")")
              require(r.size == names.size, "VALUES row arity mismatch")
              rows += r.toList
            } else rows += List(objTerm())
          }
          expect("}")
          elems += Values(names.toList, rows.toList)
        }
        else if (peek == "{") {
          if (peek2.equalsIgnoreCase("SELECT")) {
            next()
            elems += SubSelect(query())
            expect("}")
          } else {
            val left = block()
            expect("UNION")
            val right = block()
            elems += Union(left, right)
          }
        }
        else triples(elems)
      }
      expect("}")
      elems.toList
    }

    private val FilterFns = Set("REGEX", "STRSTARTS", "STRENDS", "CONTAINS", "BOUND")

    /** One filter condition: a comparison, a builtin call
      * (REGEX/STRSTARTS/STRENDS/CONTAINS/BOUND), or !BOUND(...). Encoded in
      * the (lhs, op, rhs) triple with op = the function name ('!fn' when
      * negated) so FilterCond stays one shape. */
    private def filterCondition(): (String, String, String) = {
      val negated = peek == "!" && { next(); true }
      if (FilterFns.contains(peek.toUpperCase)) {
        val fn = next().toUpperCase
        expect("(")
        val arg1 = next()
        val arg2 = if (peek == ",") { next(); next() } else ""
        expect(")")
        ((arg1, (if (negated) "!" else "") + fn, arg2))
      } else {
        require(!negated, "'!' only supported on filter builtins")
        val lhs = next()
        val op = next()
        require(Seq("=", "!=", "<", "<=", ">", ">=").contains(op), s"bad operator $op")
        ((lhs, op, next()))
      }
    }

    def filter(): FilterCond = {
      expect("(")
      val conds = scala.collection.mutable.ListBuffer[(String, String, String)]()
      val ops = scala.collection.mutable.ListBuffer[String]()
      var done = false
      while (!done) {
        conds += filterCondition()
        if (peek == "&&" || peek == "||") ops += next() else done = true
      }
      expect(")")
      FilterCond(conds.toList, ops.toList)
    }

    def term(): String = next()

    /** Object-position term: a quoted literal may carry `^^<datatype>`
      * or `@lang` (SPARQL typed/tagged literals); the suffix is folded
      * into the token and split back by [[Sparql.literalParts]]. */
    def objTerm(): String = {
      val t = term()
      if (t.startsWith("\"")) {
        if (peek == "^" && peek2 == "^") { next(); next(); t + "^^" + next() }
        else if (peek.length > 1 && peek.startsWith("@")) t + next()
        else t
      } else t
    }

    /** Predicate term: 'a' abbreviates rdf:type (as this repo's converters
      * spell it). */
    def pterm(): String = {
      val t = next()
      if (t == "a") "rdf:type" else t
    }

    /** One path step: a predicate term or an alternation set
      * `(p1|p2|...)`, optionally inverted with '^'. */
    def pstepSet(): (List[String], Boolean) =
      if (peek == "^") { next(); val (ps, inv) = pstepSet(); (ps, !inv) }
      else if (peek == "(") {
        next()
        val ps = scala.collection.mutable.ListBuffer(pterm())
        while (peek == "|") { next(); ps += pterm() }
        expect(")")
        (ps.toList, false)
      } else (List(pterm()), false)
  }

  // --------------------------------------------------------------- compile

  /** Split a (possibly `^^<dt>`/`@lang`-suffixed) literal token into
    * (value, datatype, lang) — datatype/lang null when absent. Non-quoted
    * tokens pass through with null metadata. */
  private val LitSuffix = """(?s)^"(.*)"(?:\^\^<([^>]*)>|@([A-Za-z0-9-]+))?$""".r
  private[rdf] def literalParts(tok: String): (String, String, String) = tok match {
    case LitSuffix(v, dt, lang) => (v, dt, lang)
    case _ => (tok, null, null)
  }

  private def termValue(t: String): String =
    if (t.startsWith("<")) t.substring(1, t.length - 1)
    else if (t.startsWith("\"")) literalParts(t)._1
    else t

  private def toPattern(t: Triple, g: Option[String]): Bgp.Pattern = {
    def cv(x: String) = if (x.startsWith("?")) x else termValue(x)
    Bgp.Pattern(cv(t.s), cv(t.p), cv(t.o), g.map(termValue))
  }

  /** Path-modifier pairs: `p*` = closure ∪ zero-length identity over every
    * term of the (graph-scoped) store (SPARQL: a zero-length path matches
    * each graph term with itself); `p+` = closure only; `p?` = direct
    * edges ∪ identity. Closure via
    * [[graft.graph.GraphOps.transitiveClosure]]. */
  private def starPath(quads: DataFrame, sp: StarPath, graph: Option[String]): DataFrame = {
    val scoped = graph.map(g => quads.where(col("g") === termValue(g))).getOrElse(quads)
    val preds = sp.preds.map(termValue)
    val edges = scoped.where(
        if (preds.size == 1) col("p") === preds.head else col("p").isin(preds: _*))
      .select(col("s").as("src"), col("o").as("dst"))
    val reach =
      if (sp.mod == '?') edges.distinct()
      else graft.graph.GraphOps.transitiveClosure(edges).select(col("src"), col("dst"))
    lazy val identity = scoped.select(col("s").as("src"))
      .union(scoped.select(col("o").as("src")))
      .distinct()
      .select(col("src"), col("src").as("dst"))
    val pairs =
      if (sp.mod == '+') reach.distinct()
      else reach.union(identity).distinct()
    val withS =
      if (sp.s.startsWith("?")) pairs.withColumnRenamed("src", sp.s.drop(1))
      else pairs.where(col("src") === termValue(sp.s)).drop("src")
    if (sp.o.startsWith("?")) withS.withColumnRenamed("dst", sp.o.drop(1))
    else withS.where(col("dst") === termValue(sp.o)).drop("dst")
  }

  /** `s (p1|p2) o` / `s !(p1|p2) o`: a filtered scan over (or excluding)
    * the listed predicates — the predicate set pushes down to the
    * columnar store like any constant. */
  private def predSetScan(quads: DataFrame, s: String, preds: List[String],
      o: String, graph: Option[String], negated: Boolean): DataFrame = {
    val scoped = graph.map(g => quads.where(col("g") === termValue(g))).getOrElse(quads)
    val in = col("p").isin(preds.map(termValue): _*)
    val base = scoped.where(if (negated) !in else in)
    val withS = if (s.startsWith("?")) base else base.where(col("s") === termValue(s))
    val withO = if (o.startsWith("?")) withS else withS.where(col("o") === termValue(o))
    val selfEq = if (s.startsWith("?") && s == o) withO.where(col("s") === col("o")) else withO
    val projections = Seq(s -> "s", o -> "o")
      .collect { case (t, c) if t.startsWith("?") => (t.drop(1), c) }
      .foldLeft(Vector.empty[(String, String)]) { (acc, p) =>
        if (acc.exists(_._1 == p._1)) acc else acc :+ p
      }
      .map { case (v, c) => col(c).as(v) }
    require(projections.nonEmpty, "property set pattern binds no variables")
    selfEq.select(projections: _*)
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
    // triples first (they define bindings), then paths/graph/union/sub-
    // select groups, then OPTIONAL, then FILTER — SPARQL group semantics
    // for this subset
    val (triples, rest) = group.partition(_.isInstanceOf[Triple])
    if (triples.nonEmpty)
      join(Bgp.bgp(quads, triples.map(t => toPattern(t.asInstanceOf[Triple], graph)): _*))
    rest.foreach {
      case sp: StarPath => join(starPath(quads, sp, graph))
      case AltTriple(s, preds, o) => join(predSetScan(quads, s, preds, o, graph, negated = false))
      case NegPropSet(s, preds, o) => join(predSetScan(quads, s, preds, o, graph, negated = true))
      case Exists(inner, negated, minus) =>
        val left = current.getOrElse(sys.error("FILTER EXISTS without preceding bindings"))
        val right = compileGroup(quads, inner, graph)
        val shared = left.columns.intersect(right.columns).toSeq
        // Caveat: null bindings from OPTIONAL follow SQL join-key
        // semantics here (a null never matches), whereas SPARQL
        // compatibility treats an UNBOUND variable as compatible with
        // anything — OPTIONAL-inside-MINUS patterns may keep rows SPARQL
        // would drop. The reference's guard queries never combine them.
        if (shared.isEmpty)
          // MINUS with disjoint variable domains removes nothing: keep
          // `left` untouched. FILTER (NOT) EXISTS without shared
          // variables stays unsupported (would need a scalar emptiness
          // probe, which no reference query uses).
          require(minus, "FILTER EXISTS shares no variables with the group")
        else
          current = Some(left.join(right, shared, if (negated) "left_anti" else "left_semi"))
      case SubSelect(q) => join(compileQuery(quads, q))
      case Graphed(g, inner) => join(compileGroup(quads, inner, Some(g)))
      case Union(l, r) =>
        join(Bgp.union(compileGroup(quads, l, graph), compileGroup(quads, r, graph)))
      case Opt(inner) =>
        val left = current.getOrElse(sys.error("OPTIONAL without preceding bindings"))
        val innerIsPlainBgp = inner.forall(_.isInstanceOf[Triple])
        if (innerIsPlainBgp)
          current = Some(Bgp.optional(left, quads,
            inner.collect { case t: Triple => toPattern(t, graph) }: _*))
        else {
          // general OPTIONAL group (e.g. a UNION inside OPTIONAL,
          // AgentMatchEnricher.scala:105-111): left-outer join on the
          // shared variables
          val right = compileGroup(quads, inner, graph)
          val shared = left.columns.intersect(right.columns).toSeq
          current = Some(left.join(right, shared, "left_outer"))
        }
      case f: FilterCond =>
        val df = current.getOrElse(sys.error("FILTER without bindings"))
        current = Some(df.where(filterColumn(f)))
      case Bind(v, name) =>
        val df = current.getOrElse(sys.error("BIND without bindings"))
        val value = if (v.startsWith("?")) col(v.drop(1)) else lit(termValue(v))
        current = Some(Bgp.bind(df, name, value))
      case Values(names, rows) =>
        val df = current.getOrElse(sys.error("VALUES without bindings"))
        if (names.size == 1)
          current = Some(Bgp.values(df, names.head, rows.map(r => termValue(r.head))))
        else {
          // multi-variable inline table: a LocalRelation joined on the
          // variables the group already binds (broadcast-trivial)
          val spark = df.sparkSession
          val schema = org.apache.spark.sql.types.StructType(names.map(n =>
            org.apache.spark.sql.types.StructField(n,
              org.apache.spark.sql.types.StringType)))
          val data = new java.util.ArrayList[org.apache.spark.sql.Row]()
          rows.foreach(r => data.add(
            org.apache.spark.sql.Row.fromSeq(r.map(termValue))))
          val tdf = spark.createDataFrame(data, schema)
          val shared = names.filter(df.columns.contains)
          current = Some(
            if (shared.nonEmpty) df.join(tdf, shared) else df.crossJoin(tdf))
        }
      case _: Triple => () // already handled
    }
    current.getOrElse(sys.error("empty group"))
  }

  private def filterColumn(f: FilterCond): Column = {
    def one(c: (String, String, String)): Column = {
      val (lhs, op, rhs) = c
      val fn = op.stripPrefix("!")
      if (Seq("REGEX", "STRSTARTS", "STRENDS", "CONTAINS", "BOUND").contains(fn)) {
        val l0 = col(lhs.stripPrefix("?"))
        val base = fn match {
          case "REGEX" => l0.rlike(termValue(rhs)) // partial match, as SPARQL
          case "STRSTARTS" => l0.startsWith(termValue(rhs))
          case "STRENDS" => l0.endsWith(termValue(rhs))
          case "CONTAINS" => l0.contains(termValue(rhs))
          case "BOUND" => l0.isNotNull
        }
        return if (op.startsWith("!")) !base else base
      }
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

  private def aggColumn(fn: String, arg: String, distinct: Boolean,
      sep: Option[String] = None): Column = {
    val c = if (arg == "*") None else Some(col(arg.stripPrefix("?")))
    fn match {
      case "COUNT" if c.isEmpty => count(lit(1))
      case "COUNT" if distinct => countDistinct(c.get)
      case "COUNT" => count(c.get) // skips unbound (null) — SPARQL semantics
      case "SUM" => sum(c.get)
      case "MIN" => min(c.get)
      case "MAX" => max(c.get)
      case "AVG" => avg(c.get)
      case "GROUP_CONCAT" =>
        // SPARQL leaves concatenation order undefined; sort for a
        // deterministic (and differential-testable) result
        val vals = collect_list(c.get.cast("string"))
        array_join(array_sort(if (distinct) array_distinct(vals) else vals),
          sep.getOrElse(" "))
      case "SAMPLE" => min(c.get) // any value is conformant; min is stable
    }
  }

  private def compileQuery(quads: DataFrame, q: Query): DataFrame = {
    var df = compileGroup(quads, q.group, None)
    val aggItems = q.items.collect { case a: AggItem => a }
    val hasAggs = aggItems.nonEmpty || q.groupBy.nonEmpty
    def inSelect(k: AggKey): Option[AggItem] =
      aggItems.find(a => a.fn == k.fn && a.arg == k.arg && !a.distinct)
    // order keys on aggregates not projected in SELECT get hidden columns
    val hiddenOrd: Map[AggKey, String] =
      q.orderBy.collect { case (k: AggKey, _) => k }.distinct
        .filter(inSelect(_).isEmpty)
        .zipWithIndex.map { case (k, i) => k -> s"__ord$i" }.toMap
    if (hasAggs) {
      val aggCols = aggItems.map(a =>
        aggColumn(a.fn, a.arg, a.distinct, a.sep).as(a.alias)) ++
        hiddenOrd.map { case (k, n) =>
          aggColumn(k.fn, k.arg, distinct = false).as(n) }.toSeq ++
        q.having.map(h =>
          aggColumn(h.fn, h.arg, distinct = false).as("__having")).toSeq
      require(aggCols.nonEmpty, "GROUP BY without aggregates in SELECT or ORDER BY")
      df = df.groupBy(q.groupBy.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
    }
    // HAVING filters the aggregated groups before projection
    q.having.foreach { h =>
      val c = col("__having")
      val v: Column =
        if (h.value.matches("-?\\d+")) lit(h.value.toLong)
        else if (h.value.matches("-?\\d*\\.\\d+")) lit(h.value.toDouble)
        else lit(termValue(h.value))
      df = (h.op match {
        case ">" => df.where(c > v)
        case ">=" => df.where(c >= v)
        case "<" => df.where(c < v)
        case "<=" => df.where(c <= v)
        case "=" => df.where(c === v)
        case "!=" => df.where(c =!= v)
        case other => sys.error(s"unsupported HAVING operator $other")
      }).drop("__having")
    }
    // projection before ordering (hidden order columns are kept until after
    // the sort, then dropped)
    val projected: Seq[String] = q.items.map {
      case PlainVar(v) => v
      case AggItem(_, _, _, alias, _) => alias
    }
    if (projected.nonEmpty) {
      val keep = projected ++ hiddenOrd.values.filter(df.columns.contains)
      df = df.select(keep.distinct.map(col): _*)
    }
    if (q.distinct) df = df.distinct()
    if (q.orderBy.nonEmpty) {
      val sortCols = q.orderBy.map { case (key, desc) =>
        val c = key match {
          case VarKey(v) => col(v)
          case k: AggKey =>
            inSelect(k).map(a => col(a.alias)).getOrElse(col(hiddenOrd(k)))
        }
        if (desc) c.desc else c.asc
      }
      df = df.orderBy(sortCols: _*)
    }
    hiddenOrd.values.foreach(n =>
      if (df.columns.contains(n)) df = df.drop(n))
    q.offset.foreach(o => df = df.offset(o))
    q.limit.foreach(l => df = df.limit(l))
    df
  }

  /** Parse and run a SPARQL SELECT over a quads DataFrame. */
  def select(quads: DataFrame, queryText: String): DataFrame = {
    val q = new P(expandPrefixes(tokenize(queryText))).query()
    compileQuery(quads, q)
  }

  /** ASK variant (PREFIX headers allowed before the ASK keyword). */
  def ask(quads: DataFrame, queryText: String): Boolean = {
    val toks = expandPrefixes(tokenize(queryText))
    val body =
      if (toks.headOption.exists(_.equalsIgnoreCase("ASK")))
        "SELECT" :: "*" :: "WHERE" :: toks.tail
      else toks
    !compileQuery(quads, new P(body).query()).isEmpty
  }

  // ---------------------------------------------------- CONSTRUCT / UPDATE

  /** Graph names for statements minted by the front end (the reference
    * routes front-door writes to its user graph,
    * `core/src/main/com/thymeflow/update/Updater.scala:26-45` — same
    * constant as [[graft.streaming.Updater.UserGraph]]). */
  val UserGraph = "graft:user"
  val ConstructedGraph = "graft:constructed"

  /** Template/data quad: positions may be variables in templates; the
    * graph is None for the default graph. */
  private type TemplQuad = (String, String, String, Option[String])

  private def templQuads(elems: List[Element]): List[TemplQuad] = elems.flatMap {
    case Triple(s, p, o) => List((s, p, o, None))
    case Graphed(g, inner) => inner.collect { case Triple(s, p, o) => (s, p, o, Some(termValue(g))) }
    case _ => sys.error("quad templates support triples and GRAPH blocks only")
  }

  /** Object-term kind for GROUND tokens in templates/DATA blocks:
    * explicit <iri> / "literal" syntax decides; bare tokens are IRIs when
    * they carry a scheme prefix (`c:42`, `http://...`) — the store's
    * converters mint exactly such IRIs (a bare token can't contain
    * whitespace, the tokenizer split it) — and literals otherwise.
    * VARIABLE bindings do NOT use this loose test: see [[instantiate]]. */
  private def groundKind(tok: String): Byte =
    if (tok.startsWith("<")) Quad.IRI
    else if (tok.startsWith("\"")) Quad.LITERAL
    else if (tok.matches("[A-Za-z][A-Za-z0-9+.-]*:.*")) Quad.IRI
    else Quad.LITERAL

  /** Strict IRI shape test for values the store has never seen (e.g.
    * BIND-computed): no whitespace anywhere and a scheme this engine's
    * converters actually mint (graft.convert.Iri) or the common web
    * schemes. A free-text literal like `"Re: lunch"` must NEVER pass —
    * it would be emitted as `<Re: lunch>` (invalid N-Quads) and inserted
    * as a dangling bogus IRI by [[updateDiff]]. */
  private[rdf] val IriShapeRegex =
    "^(?:https?|mailto|urn|tel|geo|mid|file|ftp|graft):\\S+$"
  def looksLikeIri(v: String): Boolean = v != null && v.matches(IriShapeRegex)

  private def tExpr(t: String): Column =
    if (t.startsWith("?")) col(t.drop(1)).cast("string") else lit(termValue(t))

  /** Instantiate quad templates against a binding set; solutions leaving a
    * template position unbound (OPTIONAL) are skipped, per SPARQL.
    *
    * Object-term kinds: ground template tokens are classified by syntax
    * ([[groundKind]]). Variable-bound values carry their kind FROM THE
    * STORE — a single join against the store's distinct IRI terms (every
    * subject/predicate, plus objects with oKind=IRI) resolves any value
    * the store knows; novel values (BIND results) fall back to the strict
    * [[looksLikeIri]] shape test. The join-back runs only when a template
    * object is a variable, and the IRI-term side is distinct-deduped, so
    * at scale it costs one hash join keyed on the term string — the same
    * order as the WHERE evaluation that produced the bindings. */
  private def instantiate(bindings: DataFrame, templ: List[TemplQuad],
      defaultGraph: String, store: DataFrame,
      resolveKinds: Boolean = true): DataFrame = {
    val raw = templ.map { case (s, p, o, g) =>
      val (_, gDt, gLang) =
        if (o.startsWith("\"")) literalParts(o) else (o, null, null)
      bindings.select(
        tExpr(s).as("s"), tExpr(p).as("p"), tExpr(o).as("o"),
        (if (o.startsWith("?")) lit(null) else lit(groundKind(o)))
          .cast("byte").as("__groundKind"),
        lit(gDt).cast("string").as("oDt"),
        lit(gLang).cast("string").as("oLang"),
        lit(g.getOrElse(defaultGraph)).as("g"))
    }.reduceLeft(_.unionByName(_)).na.drop(Seq("s", "p", "o"))
    val needResolve = resolveKinds && templ.exists(_._3.startsWith("?"))
    val kinded =
      if (!needResolve)
        raw.withColumn("oKind",
          coalesce(col("__groundKind"), lit(Quad.LITERAL)).cast("byte"))
      else {
        // term-metadata join-back: any value the store uses as a subject
        // or predicate is an IRI; object occurrences carry their full
        // (kind, datatype, language) so CONSTRUCTed literals keep
        // ^^datatype / @lang in N-Quads output. One deterministic
        // metadata row per term (IRI reading preferred, then smallest
        // datatype/language).
        val asIri = (c: String) => store.select(col(c).as("__term"),
          lit(Quad.IRI).cast("byte").as("__mKind"),
          lit(null).cast("string").as("__mDt"),
          lit(null).cast("string").as("__mLang"))
        val mw = org.apache.spark.sql.expressions.Window
          .partitionBy(col("__term"))
          .orderBy(col("__mKind").asc, col("__mDt").asc_nulls_first,
            col("__mLang").asc_nulls_first)
        val termMeta = store.select(col("o").as("__term"),
            col("oKind").as("__mKind"), col("oDt").as("__mDt"),
            col("oLang").as("__mLang"))
          .unionByName(asIri("s")).unionByName(asIri("p"))
          .distinct()
          .withColumn("__rk", row_number().over(mw)).where(col("__rk") === 1)
          .drop("__rk")
        val bound = col("__groundKind").isNull && col("__term").isNotNull
        raw.join(termMeta, raw("o") === termMeta("__term"), "left")
          .withColumn("oKind",
            coalesce(col("__groundKind"),
              when(col("__term").isNotNull, col("__mKind"))
                .when(col("o").rlike(IriShapeRegex), lit(Quad.IRI))
                .otherwise(lit(Quad.LITERAL))).cast("byte"))
          .withColumn("oDt",
            when(bound, col("__mDt")).otherwise(col("oDt")))
          .withColumn("oLang",
            when(bound, col("__mLang")).otherwise(col("oLang")))
          .drop("__term", "__mKind", "__mDt", "__mLang")
      }
    kinded.select(col("s"), col("p"), col("o"), col("oKind"), col("oDt"),
      col("oLang"), col("g")).distinct()
  }

  /** Parse and run a SPARQL DESCRIBE: returns the store quads describing
    * each target resource — every statement where the resource stands as
    * subject or as an IRI-kind object (the symmetric concise description
    * RDF4J serves behind the reference's front door, which delegates
    * DESCRIBE to the sail; `core/src/main/com/thymeflow/api/
    * SparqlService.scala:100-158` routes it as a graph query). Targets
    * are the listed ground IRIs plus the bindings of the listed
    * variables (`DESCRIBE *` takes every variable) over the optional
    * WHERE group; union default graph, original graph names kept.
    *
    * Scale shape: the target set joins the store as two semi-joins (on s
    * and on o) — broadcastable whenever the WHERE group is selective,
    * full hash joins otherwise; no driver materialization. */
  def describe(quads: DataFrame, queryText: String): DataFrame = {
    val p = new P(expandPrefixes(tokenize(queryText)))
    p.expect("DESCRIBE")
    val targets = scala.collection.mutable.ListBuffer[String]()
    var star = false
    while (p.peek.nonEmpty && !p.peek.equalsIgnoreCase("WHERE") && p.peek != "{")
      if (p.peek == "*") { star = true; p.next() } else targets += p.next()
    if (p.peek.equalsIgnoreCase("WHERE")) p.next()
    val group = if (p.peek == "{") Some(p.block()) else None
    val (ground, vars) = targets.toList.partition(!_.startsWith("?"))
    require(ground.nonEmpty || vars.nonEmpty || star, "DESCRIBE needs a target")
    val spark = quads.sparkSession
    import spark.implicits._
    val fromVars: Option[DataFrame] = group.map { g =>
      val bindings = compileGroup(quads, g, None)
      val names =
        if (star) bindings.columns.toSeq
        else vars.map(_.stripPrefix("?")).filter(bindings.columns.contains)
      require(names.nonEmpty || ground.nonEmpty,
        "DESCRIBE variables unbound in the WHERE group")
      if (names.isEmpty) Seq.empty[String].toDF("res")
      else names.map(n => bindings.select(col(n).cast("string").as("res")))
        .reduceLeft(_.unionByName(_)).na.drop().distinct()
    }
    val groundDf =
      if (ground.isEmpty) None
      else Some(ground.map(termValue).toDF("res").distinct())
    val resources = (fromVars.toSeq ++ groundDf.toSeq)
      .reduceLeftOption(_.unionByName(_).distinct())
      .getOrElse(sys.error("DESCRIBE needs a target"))
    val asSubject = quads.join(resources, quads("s") === resources("res"), "left_semi")
    val asObject = quads.where(col("oKind") === lit(Quad.IRI))
      .join(resources, quads("o") === resources("res"), "left_semi")
    asSubject.unionByName(asObject).distinct()
  }

  /** Parse and run a SPARQL CONSTRUCT: instantiate the template per
    * solution of the WHERE group; returns quads (set semantics). Template
    * GRAPH blocks name the output graph; the default is
    * [[ConstructedGraph]]. */
  def construct(quads: DataFrame, queryText: String): DataFrame = {
    val p = new P(expandPrefixes(tokenize(queryText)))
    p.expect("CONSTRUCT")
    if (p.peek.equalsIgnoreCase("WHERE")) {
      // CONSTRUCT WHERE { pattern } shorthand: the pattern is its own
      // template (SPARQL 1.1 §10.2.2)
      p.next()
      val group = p.block()
      val templ = templQuads(group.filter {
        case _: Triple | _: Graphed => true
        case _ => false
      })
      require(templ.nonEmpty, "empty CONSTRUCT WHERE pattern")
      instantiate(compileGroup(quads, group, None), templ, ConstructedGraph, quads)
    } else {
      val templ = templQuads(p.block())
      require(templ.nonEmpty, "empty CONSTRUCT template")
      if (p.peek.equalsIgnoreCase("WHERE")) p.next()
      val group = p.block()
      instantiate(compileGroup(quads, group, None), templ, ConstructedGraph, quads)
    }
  }

  /** Parse a SPARQL UPDATE (`INSERT DATA` / `DELETE DATA` /
    * `DELETE [{t}] [INSERT {t}] WHERE {g}` / `DELETE WHERE {g}`) and
    * evaluate it against a store snapshot into a [[QuadDiff]]
    * (reference front door: `core/src/main/com/thymeflow/api/
    * SparqlService.scala:144-158` prepares updates the same way; the
    * resulting diff feeds [[QuadStore.applyDiff]] or the write-back
    * routing in [[graft.streaming.Updater]]).
    *
    * Semantics against the partitioned store: WHERE matches the union of
    * all graphs (the reference advertises union-default-graph); DELETE
    * templates without an explicit GRAPH remove every graph's copy;
    * INSERTs without a GRAPH land in [[UserGraph]]. The returned diff is
    * already set-normalized: adds exclude statements present in the
    * store, removals are actual store rows. */
  def updateDiff(store: DataFrame, updateText: String): QuadDiff = {
    val spark = store.sparkSession
    import spark.implicits._
    val storeCols = store.columns.map(col).toSeq
    def empty = store.limit(0)
    def ground(ts: List[TemplQuad]): DataFrame = {
      val qs = ts.map { case (s, p, o, g) =>
        require(!s.startsWith("?") && !p.startsWith("?") && !o.startsWith("?"),
          "DATA blocks must be ground")
        val (ov, dt, lang) =
          if (o.startsWith("\"")) literalParts(o) else (termValue(o), null, null)
        Quad(termValue(s), termValue(p), ov, groundKind(o), dt, lang,
          g.getOrElse(UserGraph))
      }
      qs.toDF().select(storeCols: _*)
    }
    def dedupAdds(added: DataFrame): DataFrame =
      added.join(store, Seq("s", "p", "o", "g"), "left_anti").select(storeCols: _*)
    /** Store rows matching instantiated delete keys; a template without a
      * GRAPH matches any graph. */
    def matchRemovals(keys: DataFrame, withGraph: Boolean): DataFrame =
      store.join(keys, Seq("s", "p", "o") ++ (if (withGraph) Seq("g") else Nil), "left_semi")
        .select(storeCols: _*)

    val p = new P(expandPrefixes(tokenize(updateText)))
    if (p.peek.equalsIgnoreCase("INSERT")) {
      p.next(); p.expect("DATA")
      QuadDiff(dedupAdds(ground(templQuads(p.block()))), empty)
    } else {
      p.expect("DELETE")
      if (p.peek.equalsIgnoreCase("DATA")) {
        p.next()
        val keys = ground(templQuads(p.block()))
        QuadDiff(empty, matchRemovals(keys.select("s", "p", "o", "g"), withGraph = true))
      } else {
        val delTempl = if (p.peek == "{") templQuads(p.block()) else Nil
        val insTempl =
          if (p.peek.equalsIgnoreCase("INSERT")) { p.next(); templQuads(p.block()) } else Nil
        p.expect("WHERE")
        val group = p.block()
        val bindings = compileGroup(store, group, None)
        // DELETE WHERE { g } shorthand: the pattern is its own template
        val del = if (delTempl.isEmpty && insTempl.isEmpty) templQuads(group.filter {
          case _: Triple | _: Graphed => true
          case _ => false
        }) else delTempl
        val removed =
          if (del.isEmpty) empty
          else {
            val (scoped, global) = del.partition(_._4.isDefined)
            val parts =
              (if (global.nonEmpty)
                Seq(matchRemovals(
                  // removal keys never use oKind — skip the kind join
                  instantiate(bindings, global, UserGraph, store,
                    resolveKinds = false).select("s", "p", "o"),
                  withGraph = false))
              else Nil) ++
              (if (scoped.nonEmpty)
                Seq(matchRemovals(
                  instantiate(bindings, scoped, UserGraph, store,
                    resolveKinds = false).select("s", "p", "o", "g"),
                  withGraph = true))
              else Nil)
            parts.reduceLeft(_.unionByName(_)).distinct()
          }
        val added =
          if (insTempl.isEmpty) empty
          else dedupAdds(instantiate(bindings, insTempl, UserGraph, store))
        QuadDiff(added, removed)
      }
    }
  }

  /** Convenience: parse an update, evaluate, apply — returns the new
    * store snapshot. */
  def update(store: DataFrame, updateText: String): DataFrame =
    QuadStore.applyDiff(store, updateDiff(store, updateText))
}
