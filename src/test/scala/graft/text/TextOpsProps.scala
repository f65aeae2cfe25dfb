package graft.text

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Invariants of the scrubbing/normalization kernels over randomized
  * inputs — driver-side evaluation of the same Catalyst expressions the
  * operators use (one-row DataFrame per case would be slow; the
  * underlying regex semantics are engine-identical, so these drive the
  * JVM regex directly with the operators' published patterns). */
object TextOpsProps extends Properties("TextOps") {

  private def redact(s: String): String = {
    val e = s.replaceAll(Pii.EmailRe, "[EMAIL]")
    val i = e.replaceAll(Pii.Ipv4Re, "[IP]")
    i.replaceAll(Pii.PhoneRe, "[PHONE]")
  }

  private val piiFragment: Gen[String] = Gen.oneOf(
    Gen.const("user.name+tag@corp.example"),
    Gen.const("10.0.0.255"),
    Gen.const("+1-555-123-4567"),
    Gen.alphaNumStr.map(_.take(12)),
    Gen.const("plain words here"))

  private val text: Gen[String] =
    Gen.listOf(piiFragment).map(_.take(8).mkString(" "))

  property("redaction is idempotent (replacement tokens carry no PII)") =
    forAll(text) { t =>
      val once = redact(t)
      redact(once) == once
    }

  property("redaction leaves no matches of any pattern") =
    forAll(text) { t =>
      val once = redact(t)
      !Pii.EmailRe.r.findFirstIn(once).isDefined &&
        !Pii.Ipv4Re.r.findFirstIn(once).isDefined &&
        !Pii.PhoneRe.r.findFirstIn(once).isDefined
    }

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "HTTPS", "ftp")
    host <- Gen.oneOf("Example.COM", "sub.site.org", "a.b.c.net")
    path <- Gen.oneOf("", "/x", "/x/y/", "/x?q=1", "/x#frag", "/x/?q=1#frag")
  } yield s"$scheme://$host$path"

  private def normalize(u: String): String = {
    val noFrag = u.replaceAll("#.*$", "")
    val m = "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)".r.findFirstIn(noFrag).getOrElse("")
    val rest = noFrag.stripPrefix(m)
    (m.toLowerCase + rest).replaceAll("/$", "")
  }

  property("URL normalization is idempotent") = forAll(urlGen) { u =>
    normalize(normalize(u)) == normalize(u)
  }

  property("normalized URLs carry no fragment and no trailing slash") =
    forAll(urlGen) { u =>
      val n = normalize(u)
      !n.contains("#") && (!n.endsWith("/") || n.endsWith("://"))
    }
}
