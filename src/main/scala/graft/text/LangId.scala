package graft.text

import java.util.Locale

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-trigram language identification (Cavnar & Trenkle,
  * "N-Gram-Based Text Categorization", SDAIR'94 — the standard public
  * method): score a text against per-language ranked trigram profiles and
  * return the best language, or "und" when nothing matches. Replaces the
  * round-1 stopword placeholder with a real profile classifier; profiles
  * are compiled in (top function-word trigrams per language), so the
  * expression is a pure function of its input — codegen'd, broadcast-free,
  * and cheap enough for 100 TB scans (one table lookup per trigram).
  */
object LangId {

  /** Ranked trigram profiles (space-padded, most characteristic first).
    * Rank weight = profile length − index, so earlier trigrams dominate. */
  private val Profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" th", "the", "he ", " an", "and", "nd ", " of", "of ",
      " to", "ing", "ng ", " in", "ion", "ed ", " is", "is ", "er ",
      "es ", "at ", " be", " it", "it ", "ent", " wa", "was"),
    "de" -> Seq(" de", "der", "er ", " un", "und", "nd ", "ie ", "ch ",
      "sch", "die", "ein", " ei", "ung", "ng ", " ge", "cht", "das",
      " da", "ten", "en ", "ich", " ic", "ver", "gen", " zu"),
    "fr" -> Seq(" de", "de ", " le", "le ", "es ", "ent", "nt ", "et ",
      " et", "la ", " la", "ion", "on ", "re ", " pa", "que", " qu",
      "ue ", "les", "des", " co", "ur ", " da", "ans", "ns "),
    "es" -> Seq(" de", "de ", " la", "la ", "os ", " el", "el ", "as ",
      "ión", "que", " qu", "ue ", "en ", " en", "ar ", " co", "es ",
      "los", " lo", "ado", " es", "sta", "nte", "con", " se"),
    "it" -> Seq(" di", "di ", " ch", "che", "he ", "re ", " co", "to ",
      "la ", " la", "ion", "one", "ne ", "ell", "lla", " pe", "per",
      "er ", "ato", " in", "zio", "azi", " un", "una", "ent"),
    "pt" -> Seq(" de", "de ", " qu", "que", "ão ", "os ", " co", "ar ",
      "ra ", " pa", "par", " se", "em ", " em", "nto", "ent", "da ",
      " da", "ue ", "as ", "ção", " es", "est", "o d", "a d"),
    "nl" -> Seq("en ", " de", "de ", "et ", " he", "het", " va", "van",
      "an ", " ee", "een", "er ", " ge", "ijk", " in", "aar", "oor",
      " en", "ng ", "ing", " be", " ve", "ver", "den", "ten"),
    "sv" -> Seq("en ", " de", "et ", "ar ", " oc", "och", "ch ", " at",
      "att", "tt ", "för", " fö", "om ", "det", " ha", "an ", "som",
      " so", "ill", "ll ", " ti", " är", "är ", "ng ", "den"))

  private val Langs: Array[String] = Profiles.map(_._1).toArray

  /** trigram -> per-language weight vector (flattened for lookup speed). */
  private val Table: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    Profiles.zipWithIndex.foreach { case ((_, tris), li) =>
      tris.zipWithIndex.foreach { case (tri, rank) =>
        val w = tris.length - rank
        val arr = m.computeIfAbsent(tri, _ => new Array[Int](Langs.length))
        arr(li) = math.max(arr(li), w)
      }
    }
    m
  }

  /** The compiled-in model as rows (trigram, lang, langRank, weight): the
    * oracle fixture q70 emits, so the Cavnar-Trenkle rank-distance scoring
    * can be restated independently in SQL over it. langRank is the
    * language's index in [[Langs]] — [[detect]]'s argmax keeps the EARLIEST
    * language on score ties, i.e. ties resolve to the lowest langRank. */
  def profileTable: Seq[(String, String, Int, Int)] = {
    import scala.jdk.CollectionConverters._
    Table.asScala.toSeq.sortBy(_._1).flatMap { case (tri, arr) =>
      arr.toSeq.zipWithIndex.collect {
        case (w, li) if w > 0 => (tri, Langs(li), li, w)
      }
    }
  }

  /** Best language of `text`, or "und" when no profile trigram occurs. */
  def detect(text: String): String = {
    if (text == null) return "und"
    // normalize: lowercase, non-letters -> single spaces, pad
    val sb = new java.lang.StringBuilder(text.length + 2)
    sb.append(' ')
    var lastSpace = true
    text.toLowerCase(Locale.ROOT).foreach { c =>
      if (Character.isLetter(c)) { sb.append(c); lastSpace = false }
      else if (!lastSpace) { sb.append(' '); lastSpace = true }
    }
    if (!lastSpace) sb.append(' ')
    val s = sb.toString
    if (s.length < 3) return "und"
    val scores = new Array[Long](Langs.length)
    var i = 0
    while (i + 3 <= s.length) {
      val arr = Table.get(s.substring(i, i + 3))
      if (arr != null) {
        var j = 0
        while (j < arr.length) { scores(j) += arr(j); j += 1 }
      }
      i += 1
    }
    var best = 0
    var j = 1
    while (j < scores.length) { if (scores(j) > scores(best)) best = j; j += 1 }
    if (scores(best) == 0) "und" else Langs(best)
  }

  def detectUtf8(text: UTF8String): UTF8String =
    UTF8String.fromString(detect(if (text == null) null else text.toString))
}

/** `lang_id(text)` → language code ("en", "de", …, or "und"). */
case class LangIdExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lang_id needs string, got $other")
    }
  override protected def nullSafeEval(input: Any): Any =
    LangId.detectUtf8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.LangId.detectUtf8($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
