package graft.rdf

import graft.SparkSpec

/** Differential fuzzing of the SPARQL engine (SQLancer-style): random
  * quad stores × random queries, each evaluated BOTH by the engine and
  * by an independent ~60-line bag-semantics evaluator written straight
  * off SPARQL 1.1 §18.5 (BGP fold, compatible-binding left-join for
  * OPTIONAL, concat for UNION, filter on bound values). Any divergence
  * in the result multiset is a bug in one of them. The query space is a
  * deliberately well-specified subset — string-valued terms, FILTERs
  * only over always-bound vars with non-numeric literals — so the two
  * sides cannot disagree on spec ambiguities, only on implementation.
  */
class SparqlFuzzSpec extends SparkSpec {
  import spark.implicits._

  private type Triple = (String, String, String)
  private type Binding = Map[String, String]
  private case class Pat(s: String, p: String, o: String)

  // ---- independent reference evaluator ----
  private def unify(term: String, value: String, b: Binding): Option[Binding] =
    if (term.startsWith("?")) b.get(term) match {
      case Some(v) => if (v == value) Some(b) else None
      case None => Some(b + (term -> value))
    } else if (term == value) Some(b) else None

  private def matchPat(t: Triple, pat: Pat, b: Binding): Option[Binding] =
    unify(pat.s, t._1, b).flatMap(unify(pat.p, t._2, _)).flatMap(unify(pat.o, t._3, _))

  private def evalBgp(data: Seq[Triple], pats: Seq[Pat],
      init: Seq[Binding]): Seq[Binding] =
    pats.foldLeft(init)((acc, pat) =>
      acc.flatMap(b => data.flatMap(t => matchPat(t, pat, b))))

  private def leftJoin(left: Seq[Binding], data: Seq[Triple],
      opt: Seq[Pat]): Seq[Binding] =
    left.flatMap { b =>
      val ext = evalBgp(data, opt, Seq(b))
      if (ext.nonEmpty) ext else Seq(b)
    }

  // ---- generation ----
  private val rnd = new scala.util.Random(7)
  private val subs = Vector("u:s0", "u:s1", "u:s2", "u:s3", "u:s4")
  private val preds = Vector("u:p0", "u:p1", "u:p2")
  private val lits = Vector("la", "lb", "lc")

  private def randomStore(): Seq[Triple] =
    Seq.fill(25 + rnd.nextInt(15)) {
      val o = if (rnd.nextBoolean()) subs(rnd.nextInt(subs.size))
      else lits(rnd.nextInt(lits.size))
      (subs(rnd.nextInt(subs.size)), preds(rnd.nextInt(preds.size)), o)
    }.distinct

  private val varPool = Vector("?a", "?b", "?c", "?d")
  private def randomPat(vars: Vector[String]): Pat = Pat(
    s = if (rnd.nextInt(10) < 6) vars(rnd.nextInt(vars.size))
        else subs(rnd.nextInt(subs.size)),
    p = if (rnd.nextInt(10) < 8) preds(rnd.nextInt(preds.size))
        else vars(rnd.nextInt(vars.size)),
    o = if (rnd.nextBoolean()) vars(rnd.nextInt(vars.size))
        else if (rnd.nextBoolean()) subs(rnd.nextInt(subs.size))
        else lits(rnd.nextInt(lits.size)))

  private def render(t: String): String =
    if (t.startsWith("?")) t
    else if (t.startsWith("u:")) s"<$t>"
    else "\"" + t + "\""

  private def renderPats(pats: Seq[Pat]): String =
    pats.map(p => s"${render(p.s)} ${render(p.p)} ${render(p.o)} .").mkString(" ")

  private def vorsOf(pats: Seq[Pat]): Seq[String] =
    pats.flatMap(p => Seq(p.s, p.p, p.o)).filter(_.startsWith("?")).distinct

  private def runCase(data: Seq[Triple], n: Int): Unit = {
    val quads = data.map { case (s, p, o) =>
      (s, p, o, (if (o.startsWith("u:")) 0 else 2).toByte,
        null: String, null: String, "g") }
      .toDF("s", "p", "o", "oKind", "oDt", "oLang", "g")

    for (_ <- 1 to n) {
      val union = rnd.nextInt(4) == 0
      val (text, ref, inScope) =
        if (union) {
          val g1 = Seq.fill(1 + rnd.nextInt(2))(randomPat(varPool))
          val g2 = Seq.fill(1 + rnd.nextInt(2))(randomPat(varPool))
          val ref = evalBgp(data, g1, Seq(Map.empty)) ++
            evalBgp(data, g2, Seq(Map.empty))
          (s"{ ${renderPats(g1)} } UNION { ${renderPats(g2)} }",
            ref, (vorsOf(g1) ++ vorsOf(g2)).distinct)
        } else {
          val req = Seq.fill(1 + rnd.nextInt(3))(randomPat(varPool))
          val opt = if (rnd.nextBoolean())
            Some(Seq.fill(1 + rnd.nextInt(2))(randomPat(varPool))) else None
          val reqVars = vorsOf(req)
          val filter = if (reqVars.nonEmpty && rnd.nextInt(3) == 0) {
            val v = reqVars(rnd.nextInt(reqVars.size))
            val rhs = lits(rnd.nextInt(lits.size))
            val eq = rnd.nextBoolean()
            Some((v, rhs, eq))
          } else None
          var ref = evalBgp(data, req, Seq(Map.empty))
          ref = filter.fold(ref) { case (v, rhs, eq) =>
            ref.filter(b => (b(v) == rhs) == eq) }
          ref = opt.fold(ref)(o => leftJoin(ref, data, o))
          val text = renderPats(req) +
            filter.fold("") { case (v, rhs, eq) =>
              s""" FILTER($v ${if (eq) "=" else "!="} "$rhs")""" } +
            opt.fold("")(o => s" OPTIONAL { ${renderPats(o)} }")
          (text, ref, (reqVars ++ opt.toSeq.flatMap(vorsOf)).distinct)
        }
      if (inScope.nonEmpty) {
        val proj = rnd.shuffle(inScope).take(1 + rnd.nextInt(inScope.size))
        val distinct = rnd.nextInt(4) == 0
        val q = s"SELECT ${if (distinct) "DISTINCT " else ""}${proj.mkString(" ")} " +
          s"WHERE { $text }"
        val got = Sparql.select(quads, q).collect()
          .map(r => proj.indices.map(i =>
            Option(r.get(i)).map(_.toString).orNull).toList).toSeq
        var want = ref.map(b => proj.map(v => b.getOrElse(v, null)).toList)
        if (distinct) want = want.distinct
        val sortKey = (row: List[String]) =>
          row.map(v => if (v == null) "\u0000" else v).mkString("\u0001")
        withClue(s"query: $q\nstore: ${data.sortBy(_.toString)}\n") {
          (if (distinct) got.distinct else got).sortBy(sortKey) shouldBe
            want.sortBy(sortKey)
        }
      }
    }
  }

  "Sparql.select" should "agree with an independent evaluator on random stores and queries" in {
    for (_ <- 1 to 4) runCase(randomStore(), 12)
  }
}
