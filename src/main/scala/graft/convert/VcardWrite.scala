package graft.convert

import graft.rdf.Quad

/** Quads → vCard 3.0 text: the write-back serializer of CardDAV sync.
  *
  * The reference pushes accepted updates back to the owning collection
  * by mutating the parsed document model and re-serializing it
  * (`core/src/main/com/thymeflow/sync/dav/BaseDavSynchronizer.scala:234`,
  * `sardine.put(documentUrl, newVersion, headers)`). This engine's
  * canonical state is the per-document graph, so write-back regenerates
  * the document from the graph: the exact inverse of
  * [[Converters.vcard]]'s predicate mapping (FN/N/EMAIL/TEL/ORG/BDAY +
  * UID via `personal:uid`). Predicates outside that mapping simply
  * don't serialize — the graph is the source of truth.
  */
object VcardWrite {

  private val schemaOrg = Converters.schemaOrg

  /** Inverse of Converters.TelTypeClass: phone-class IRI → TYPE param. */
  private val TelClassType: Map[String, String] = Map(
    "personal:CellphoneNumber" -> "CELL",
    "personal:FaxNumber" -> "FAX",
    "personal:HomeAddress" -> "HOME",
    "personal:PreferredAddress" -> "PREF",
    "personal:WorkAddress" -> "WORK")

  private def escape(v: String): String =
    // CR first: vCard content never carries raw CR — a write-back value
    // containing \r\n folds to the \n escape instead of corrupting the line
    v.replace("\r\n", "\n").replace("\r", "\n")
      .replace("\\", "\\\\").replace("\n", "\\n").replace(",", "\\,")
      .replace(";", "\\;")

  /** Serialize every `personal:Agent` in one document graph's quads to a
    * vCard block; agents sort by IRI for deterministic output. The quad
    * set is ONE document's (driver-side, bounded — the same unit the
    * reference materializes as a parsed model). */
  def fromQuads(quads: Seq[Quad]): String = {
    val bySubject = quads.groupBy(_.s)
    val agents = quads.collect {
      case q if q.p == "rdf:type" && q.o == "personal:Agent" => q.s
    }.distinct.sorted
    agents.map { a =>
      val props = bySubject.getOrElse(a, Nil)
      def vals(p: String): Seq[String] = props.filter(_.p == p).map(_.o)
      val sb = new StringBuilder("BEGIN:VCARD\r\nVERSION:3.0\r\n")
      vals("personal:uid").foreach(u => sb ++= s"UID:${escape(u)}\r\n")
      vals(schemaOrg + "name").foreach(v => sb ++= s"FN:${escape(v)}\r\n")
      val family = vals(schemaOrg + "familyName").headOption
      val given = vals(schemaOrg + "givenName").headOption
      if (family.isDefined || given.isDefined)
        sb ++= s"N:${escape(family.getOrElse(""))};${escape(given.getOrElse(""))};;;\r\n"
      vals(schemaOrg + "email").foreach { m =>
        sb ++= s"EMAIL:${m.stripPrefix("mailto:")}\r\n"
      }
      vals(schemaOrg + "telephone").foreach { t =>
        val types = bySubject.getOrElse(t, Nil)
          .filter(_.p == "rdf:type").flatMap(q => TelClassType.get(q.o))
          .sorted
        val param = if (types.isEmpty) "" else types.mkString(";TYPE=", ",", "")
        sb ++= s"TEL$param:${t.stripPrefix("tel:")}\r\n"
      }
      vals(schemaOrg + "worksFor").foreach(v => sb ++= s"ORG:${escape(v)}\r\n")
      vals(schemaOrg + "birthDate").foreach(v => sb ++= s"BDAY:$v\r\n")
      sb ++= "END:VCARD\r\n"
      sb.toString
    }.mkString
  }
}
