package graft.enrich

import java.util.Locale

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.algo.Alignment

/** Agent name-structure mining — the two AgentMatchEnricher stages that sit
  * on top of the similarity machinery:
  *
  *  1. '''Email-localpart ↔ name alignment''' (`thymeflow/src/main/com/
  *     thymeflow/enricher/entityresolution/AgentMatchEnricher.scala:663-727`):
  *     align an agent's name parts against its email local-part
  *     (approximate, non-overlapping, ≥70% character agreement — the
  *     reference routes this through a min-cost-flow text alignment; here
  *     Smith-Waterman spans with greedy conflict resolution), then decompose
  *     the local-part into a PATTERN: matched name parts and leftover
  *     alphanumeric runs become variable slots, delimiters stay literal
  *     (`<v>.<v>` for `john.smith`). Leftover runs become unqualified slots
  *     exactly like the reference's NamePartNoMatch variables.
  *  2. '''Name-part type label propagation'''
  *     (`AgentMatchEnricher.scala:454-555`): build the tripartite graph
  *     domain-pattern-slot ↔ (agent, name-part) ↔ name-part-string and, for
  *     every UNqualified (agent, name-part), find the nearest qualified
  *     nodes by breadth-first distance; the type distribution is the
  *     normalized count of qualified nodes at that minimal distance. This
  *     is how `jane.doe@corp.example` learns given/family order from
  *     `john.smith@corp.example`, and how an untyped "smith" inherits
  *     family-name-ness from any typed "smith".
  *
  * Spark shape: stage 1 is a per-agent flatMap (short strings, procedural
  * alignment — the one place a JVM function beats expressions); stage 2 is
  * a level-synchronous multi-source BFS done as join rounds, each round one
  * equi-join frontier×edges — the same distributed-iteration discipline as
  * GraphOps, bounded by `maxHops`.
  */
object NameStructure {

  final case class AgentNamePart(agent: String, part: String, types: Seq[String])
  final case class AgentEmail(agent: String, localPart: String, domain: String)
  /** One variable slot of one agent's local-part pattern. */
  final case class AlignedSlot(agent: String, domain: String, pattern: String,
      slot: Int, part: String, types: Seq[String])

  /** Public mailbox providers carry no shared name structure
    * (reference EmailProviderDomainList filter,
    * `AgentMatchEnricher.scala:438-440`). */
  val DefaultPublicDomains: Set[String] = Set(
    "gmail.com", "googlemail.com", "yahoo.com", "hotmail.com", "outlook.com",
    "aol.com", "icloud.com", "live.com", "msn.com", "protonmail.com")

  /** Accent-stripped lowercase (reference normalizeTerm,
    * `EntityResolution.scala:15`). */
  def normalize(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
      .replaceAll("\\p{M}", "").toLowerCase(Locale.ROOT)

  /** Align one agent's name parts against one local-part. Returns the
    * pattern string and the variable slots (1-based slot index, name part
    * or leftover run, known types — empty = unqualified). */
  private[enrich] def alignOne(
      localPart: String,
      parts: Seq[(String, Seq[String])]): (String, Seq[(Int, String, Seq[String])]) = {
    val lp = normalize(localPart)
    // best approximate window per name part, >= 70% of the perfect score
    val cands = parts.flatMap { case (part, types) =>
      val p = normalize(part)
      if (p.isEmpty || lp.isEmpty) None
      else {
        val r = Alignment.smithWaterman(p, lp)
        if (r.score >= 0.7 * 2.0 * p.length)
          Some((r.bSpan._1, r.bSpan._2, p, types, r.score))
        else None
      }
    }
    // non-overlapping, best-score-first (the reference solves this with
    // min-cost max-flow; greedy is exact when matches don't chain-overlap)
    val chosen = cands.sortBy(c => (-c._5, c._1))
      .foldLeft(Vector.empty[(Int, Int, String, Seq[String])]) {
        case (acc, (from, to, p, types, _)) =>
          if (acc.exists(x => x._1 < to && from < x._2)) acc
          else acc :+ ((from, to, p, types))
      }.sortBy(_._1)
    val pattern = new StringBuilder
    val slots = Vector.newBuilder[(Int, String, Seq[String])]
    var slot = 0
    def emitText(seg: String): Unit = {
      // alphanumeric runs are unqualified variables (NamePartNoMatch),
      // delimiters are literal pattern text (TextNamePart)
      var i = 0
      while (i < seg.length) {
        if (seg(i).isLetterOrDigit) {
          var j = i
          while (j < seg.length && seg(j).isLetterOrDigit) j += 1
          slot += 1
          pattern.append("<v>")
          slots += ((slot, seg.substring(i, j), Seq.empty))
          i = j
        } else { pattern.append(seg(i)); i += 1 }
      }
    }
    var idx = 0
    chosen.foreach { case (from, to, p, types) =>
      if (from > idx) emitText(lp.substring(idx, from))
      slot += 1
      pattern.append("<v>")
      slots += ((slot, p, types))
      idx = to
    }
    if (idx < lp.length) emitText(lp.substring(idx))
    (pattern.toString, slots.result())
  }

  /** Stage 1 over DataFrames: names (agent, part, types) × emails
    * (agent, localPart, domain) → one row per variable slot. */
  def alignEmailLocalParts(
      names: DataFrame,
      emails: DataFrame,
      excludeDomains: Set[String] = DefaultPublicDomains): Dataset[AlignedSlot] = {
    val spark = names.sparkSession
    import spark.implicits._
    val partsByAgent = names
      .select(col("agent"), col("part"), col("types"))
      .as[AgentNamePart]
      .groupByKey(_.agent)
      .mapGroups((agent, rows) => (agent, rows.map(r => (r.part, r.types)).toSeq))
      .toDF("agent", "parts")
    emails.select(col("agent"), col("localPart"), col("domain"))
      .where(!lower(col("domain")).isin(excludeDomains.toSeq.map(_.toLowerCase): _*))
      .join(partsByAgent, Seq("agent"))
      .as[(String, String, String, Seq[(String, Seq[String])])]
      .flatMap { case (agent, localPart, domain, parts) =>
        val (pattern, slots) = alignOne(localPart, parts)
        slots.map { case (slotIdx, part, types) =>
          AlignedSlot(agent, normalize(domain), pattern, slotIdx, part, types)
        }
      }
  }

  /** Stage 2: nearest-qualified-node type inference over the name-part
    * graph. Output: (agent, part, ptype, weight) for every unqualified
    * (agent, part) that reaches a typed name part within maxHops; weights
    * per (agent, part) sum to 1 (normalized counts of qualified nodes at
    * the minimal distance — `AgentMatchEnricher.scala:523-548`). */
  def inferNamePartTypes(aligned: Dataset[AlignedSlot], maxHops: Int = 6): DataFrame = {
    val spark = aligned.sparkSession
    import spark.implicits._
    val slots = aligned.toDF().localCheckpoint()
    val dnode = concat_ws("|", lit("d"), col("domain"), col("pattern"),
      col("slot").cast("string"))
    val anode = concat_ws("|", lit("a"), col("agent"), col("part"))
    val nnode = concat_ws("|", lit("n"), col("part"))
    val e1 = slots.select(dnode.as("src"), anode.as("dst"))
    val e2 = slots.select(anode.as("src"), nnode.as("dst"))
    val edges = e1.union(e2)
      .union(e1.select(col("dst").as("src"), col("src").as("dst")))
      .union(e2.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    val qualified = slots.where(size(col("types")) > 0)
      .select(anode.as("node"), explode(col("types")).as("ptype"))
      .distinct().localCheckpoint()
    val starts = slots.where(size(col("types")) === 0)
      .select(anode.as("start"), col("agent"), col("part")).distinct()
      .localCheckpoint()

    var frontier = starts.select(col("start"), col("start").as("node")).localCheckpoint()
    var visited = frontier
    var hits = qualified.limit(0).select(
      lit("").as("start"), col("node"), col("ptype")).limit(0).localCheckpoint()
    var active = starts.select(col("start"))
    // distance 0: a start that is itself qualified — the same
    // (agent, part) slot carries types in another aligned row — is its
    // own minimal-level evidence, and the strongest (the reference
    // counts the source label too, `AgentMatchEnricher.scala:497-512`).
    // These starts retire before the first hop so no farther neighbor
    // can dilute their distribution.
    val selfHits = starts.select(col("start"), col("start").as("node"))
      .join(qualified, Seq("node"))
      .select(col("start"), col("node"), col("ptype"))
      .localCheckpoint()
    hits = hits.unionByName(selfHits)
    active = active.join(selfHits.select(col("start")).distinct(),
      Seq("start"), "left_anti").localCheckpoint()
    frontier = frontier.join(active, Seq("start"), "left_semi").localCheckpoint()
    var hop = 0
    while (hop < maxHops && !frontier.isEmpty) {
      val next = frontier.join(edges, frontier("node") === edges("src"))
        .select(col("start"), col("dst").as("node"))
        .distinct()
        .join(visited, Seq("start", "node"), "left_anti")
        .localCheckpoint()
      val levelHits = next.join(qualified, Seq("node"))
        .select(col("start"), col("node"), col("ptype"))
        .localCheckpoint()
      hits = hits.unionByName(levelHits)
      // retire starts that found their minimal level this round
      val retired = levelHits.select(col("start")).distinct()
      active = active.join(retired, Seq("start"), "left_anti").localCheckpoint()
      visited = visited.unionByName(next).localCheckpoint()
      frontier = next.join(active, Seq("start"), "left_semi").localCheckpoint()
      hop += 1
    }
    // per start: count qualified nodes per type at the (single, minimal)
    // collected level; normalize to a distribution
    val counts = hits.groupBy(col("start"), col("ptype"))
      .agg(countDistinct(col("node")).as("n"))
    val totals = counts.groupBy(col("start")).agg(sum(col("n")).as("total"))
    counts.join(totals, Seq("start"))
      .join(starts, Seq("start"))
      .select(col("agent"), col("part"), col("ptype"),
        (col("n").cast("double") / col("total")).as("weight"))
  }
}
