package graft.sources

import graft.rdf.Quad

/** Canonicalize a quad set up to blank-node renaming by replacing each
  * blank node with the signature of its outgoing subtree. Sound when
  * blank nodes form trees (each has at most one incoming edge and no
  * cycles) — the shape every generator in the authored-document fuzz
  * specs produces. */
object RdfCanon {
  def canon(quads: Seq[Quad])
      : Set[(String, String, String, Byte, String, String, String)] = {
    val bnodes = (quads.map(_.s) ++ quads.filter(_.oKind == Quad.BNODE).map(_.o))
      .filter(_.startsWith("_:")).toSet
    val h = scala.collection.mutable.Map[String, String]()
    var changed = true
    while (changed) {
      changed = false
      for (b <- bnodes if !h.contains(b)) {
        val outs = quads.filter(_.s == b)
        if (outs.forall(q => q.oKind != Quad.BNODE || h.contains(q.o))) {
          // oKind is part of the signature so an IRI-vs-literal kind bug
          // cannot canonicalize away
          val sig = outs.map(q =>
              (q.p, if (q.oKind == Quad.BNODE) h(q.o) else q.o, q.oKind,
                q.oDt, q.oLang))
            .sortBy(_.toString()).mkString("|")
          h(b) = s"{$sig}"
          changed = true
        }
      }
    }
    def res(t: String, isB: Boolean) = if (isB) h.getOrElse(t, t) else t
    quads.map(q => (res(q.s, q.s.startsWith("_:")), q.p,
      res(q.o, q.oKind == Quad.BNODE), q.oKind,
      Option(q.oDt).getOrElse(""), Option(q.oLang).getOrElse(""), q.g)).toSet
  }
}
