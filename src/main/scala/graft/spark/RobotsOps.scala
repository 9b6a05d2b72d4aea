package graft.spark

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt evaluation per RFC 9309 (the Robots Exclusion Protocol):
  * group selection by most-specific user-agent product-token prefix,
  * longest-octet rule matching with `*` wildcards and the `$` end
  * anchor, allow-wins ties, plus the two universal extensions crawlers
  * rely on (Crawl-delay, Sitemap). Pure string logic, never throws —
  * unparseable lines are ignored per the RFC's tolerance requirement.
  *
  * Scale note: a crawl joins pages to a PER-HOST robots dim table
  * (tiny, broadcast), so the same robots.txt body evaluates across many
  * rows of a partition — parses are memoized in a capped cache exactly
  * like the selector cache in [[Extractor]]. */
object RobotsOps {

  /** one group: its user-agent product tokens (lowercased) and rules in
    * file order. `allow=false` is a Disallow line. An empty-path
    * Disallow means "allow everything" and produces no rule. */
  final case class Group(agents: Array[String], rules: Array[(Boolean, String)],
      crawlDelay: Double)

  final case class Robots(groups: Array[Group], sitemaps: Array[String])

  // ------------------------------------------------------------------ parse

  private val RobotsCacheCap = 256
  private val robotsCache = new ConcurrentHashMap[String, Robots]()

  /** bodies above this size are parsed but never cached: the cache must
    * not pin multi-megabyte robots.txt strings in executor heap (RFC
    * 9309 only obliges crawlers to parse 500 KiB anyway). */
  private val RobotsCacheMaxBody = 512 * 1024

  def parse(txt: String): Robots = {
    if (txt == null) return Robots(Array.empty, Array.empty)
    val hit = robotsCache.get(txt)
    if (hit != null) return hit
    val parsed = parseUncached(txt)
    if (txt.length <= RobotsCacheMaxBody && robotsCache.size < RobotsCacheCap)
      robotsCache.putIfAbsent(txt, parsed)
    parsed
  }

  private def parseUncached(txt: String): Robots = {
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    val sitemaps = scala.collection.mutable.ArrayBuffer.empty[String]
    var agents = scala.collection.mutable.ArrayBuffer.empty[String]
    var rules = scala.collection.mutable.ArrayBuffer.empty[(Boolean, String)]
    var delay = Double.NaN
    // a user-agent line after rules starts a NEW group (RFC 9309 §2.2:
    // consecutive user-agent lines share one group)
    var sawRules = false

    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents.toArray, rules.toArray, delay)
      agents = scala.collection.mutable.ArrayBuffer.empty
      rules = scala.collection.mutable.ArrayBuffer.empty
      delay = Double.NaN
      sawRules = false
    }

    // files in the wild are often BOM-prefixed; trim() does not remove
    // U+FEFF, so without this the first User-agent line parses as
    // "﻿user-agent" and the whole first group silently drops
    val body = if (txt.nonEmpty && txt.charAt(0) == '\uFEFF') txt.substring(1) else txt
    body.linesIterator.foreach { raw =>
      val hash = raw.indexOf('#')
      val line = (if (hash >= 0) raw.substring(0, hash) else raw).trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val key = line.substring(0, colon).trim.toLowerCase
          val value = line.substring(colon + 1).trim
          key match {
            case "user-agent" =>
              if (sawRules) flush()
              // RFC 9309 requires a non-empty product token; an empty
              // value would prefix-match EVERY crawler at specificity 0
              // and turn a truncated line into a universal group
              if (value.nonEmpty) agents += value.toLowerCase
            case "allow" =>
              if (agents.nonEmpty && value.nonEmpty) { rules += ((true, value)); sawRules = true }
              else sawRules = agents.nonEmpty // empty-path line still ends the UA run
            case "disallow" =>
              if (agents.nonEmpty && value.nonEmpty) { rules += ((false, value)); sawRules = true }
              else sawRules = agents.nonEmpty
            case "crawl-delay" =>
              if (agents.nonEmpty) {
                try { delay = value.toDouble } catch { case _: NumberFormatException => () }
                sawRules = true
              }
            case "sitemap" => if (value.nonEmpty) sitemaps += value // group-independent
            case _ => () // unknown keys are ignored per the RFC
          }
        }
      }
    }
    flush()
    Robots(groups.toArray, sitemaps.toArray)
  }

  // -------------------------------------------------------- group selection

  /** RFC 9309 §2.2.1: the group(s) with the MOST SPECIFIC matching
    * user-agent win — a UA line matches when it equals `*` or is a
    * case-insensitive prefix of the crawler's product token; specificity
    * is the matched line's length (`*` = 0). Rules of every group tied
    * at best specificity merge. Null when nothing matches (not even
    * `*`) — then everything is allowed. */
  private def selectRules(r: Robots, agent: String): (Array[(Boolean, String)], Double) = {
    val tok = productToken(agent)
    var best = -1
    var i = 0
    while (i < r.groups.length) {
      val g = r.groups(i)
      var j = 0
      while (j < g.agents.length) {
        val a = g.agents(j)
        val spec =
          if (a == "*") 0
          else if (tok.startsWith(a)) a.length
          else -1
        if (spec > best) best = spec
        j += 1
      }
      i += 1
    }
    if (best < 0) return (null, Double.NaN)
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Boolean, String)]
    var delay = Double.NaN
    i = 0
    while (i < r.groups.length) {
      val g = r.groups(i)
      var matches = false
      var j = 0
      while (j < g.agents.length && !matches) {
        val a = g.agents(j)
        matches = (if (a == "*") 0 else if (tok.startsWith(a)) a.length else -1) == best
        j += 1
      }
      if (matches) {
        merged ++= g.rules
        if (delay.isNaN) delay = g.crawlDelay
      }
      i += 1
    }
    (merged.toArray, delay)
  }

  /** the product token of a user-agent string: letters/digits/`-`/`_`
    * before the first `/` or space, lowercased ("GraftBot/1.0 (+url)"
    * -> "graftbot"). */
  private[spark] def productToken(agent: String): String = {
    var end = 0
    while (end < agent.length && {
      val c = agent.charAt(end)
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '-' || c == '_'
    }) end += 1
    agent.substring(0, end).toLowerCase
  }

  // ---------------------------------------------------------- rule matching

  /** does rule pattern `p` match url path `u`? `*` matches any octet
    * sequence; a trailing `$` anchors at the end; otherwise the pattern
    * is a prefix match. Iterative glob with greedy backtracking. */
  private[graft] def pathMatches(p: String, u: String): Boolean = {
    val anchored = p.nonEmpty && p.charAt(p.length - 1) == '$'
    val pat = if (anchored) p.substring(0, p.length - 1) else p
    // prefix semantics = pattern + implicit trailing '*' when unanchored
    var pi = 0; var ui = 0
    var starPi = -1; var starUi = -1
    val pn = pat.length; val un = u.length
    if (pn == 0) return !anchored || un == 0 // empty pattern: prefix of anything
    while (ui < un) {
      if (pi < pn && pat.charAt(pi) == '*') { starPi = pi; pi += 1; starUi = ui }
      else if (pi < pn && pat.charAt(pi) == u.charAt(ui)) { pi += 1; ui += 1 }
      else if (starPi >= 0) { starUi += 1; ui = starUi; pi = starPi + 1 }
      else return false
      if (pi == pn && !anchored) return true // prefix consumed
    }
    while (pi < pn && pat.charAt(pi) == '*') pi += 1
    pi == pn // anchored (or pattern ran past the path): need full consume
  }

  /** RFC 9309 §2.2.2: the rule with the most matched octets (longest
    * pattern) wins; an allow/disallow tie at the same length goes to
    * allow; no matching rule (or no matching group) means allowed. A
    * null robots.txt means "no restrictions" (allowed); null agent/path
    * is the CALLER's unknown — the SQL surface maps it to NULL instead
    * of letting unparseable rows through the compliance gate. */
  def allowed(robotsTxt: String, agent: String, path: String): Boolean = {
    if (robotsTxt == null || agent == null || path == null) return true
    val (rules, _) = selectRules(parse(robotsTxt), agent)
    if (rules == null) return true
    var bestLen = -1
    var bestAllow = true
    var i = 0
    while (i < rules.length) {
      val (allow, pat) = rules(i)
      if (pathMatches(pat, path)) {
        val len = pat.length
        if (len > bestLen || (len == bestLen && allow && !bestAllow)) {
          bestLen = len; bestAllow = allow
        }
      }
      i += 1
    }
    if (bestLen < 0) true else bestAllow
  }

  /** Crawl-delay of the selected group in seconds; NaN when absent
    * (non-RFC but honored by most crawlers). */
  def crawlDelay(robotsTxt: String, agent: String): Double = {
    if (robotsTxt == null || agent == null) return Double.NaN
    selectRules(parse(robotsTxt), agent)._2
  }

  /** every Sitemap line (group-independent per RFC 9309 §2.3.3). */
  def sitemaps(robotsTxt: String): Array[String] =
    if (robotsTxt == null) Array.empty else parse(robotsTxt).sitemaps

  // ------------------------------------------------- codegen static entries

  /** boxed three-state result: TRUE when robots.txt is missing (no
    * restrictions — allowed even for an unknown path), SQL NULL when
    * agent/path is unknown but a robots.txt EXISTS (don't silently pass
    * the compliance gate), the evaluation otherwise. */
  def allowedCodegen(robots: UTF8String, agent: UTF8String, path: UTF8String): java.lang.Boolean = {
    if (robots == null) return java.lang.Boolean.TRUE
    if (agent == null || path == null) return null
    java.lang.Boolean.valueOf(allowed(robots.toString, agent.toString, path.toString))
  }

  /** boxed: SQL NULL when no delay is declared. */
  def crawlDelayCodegen(robots: UTF8String, agent: UTF8String): java.lang.Double = {
    if (robots == null || agent == null) return null
    val d = crawlDelay(robots.toString, agent.toString)
    if (d.isNaN) null else java.lang.Double.valueOf(d)
  }

  def sitemapsCodegen(robots: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (robots == null) return null
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      sitemaps(robots.toString).map(v => UTF8String.fromString(v).asInstanceOf[Any]))
  }
}
