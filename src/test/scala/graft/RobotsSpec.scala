package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.spark.RobotsOps

/** robots.txt evaluation (RobotsOps): RFC 9309 group selection, rule
  * precedence (longest octets, allow-wins ties), `*`/`$` pattern
  * matching, and the Crawl-delay/Sitemap extensions. Precedence cases
  * mirror the worked examples in RFC 9309 §5.2 / the REP documentation. */
class RobotsSpec extends AnyFunSuite {

  private def allowed(robots: String, path: String, agent: String = "GraftBot/1.0"): Boolean =
    RobotsOps.allowed(robots, agent, path)

  test("pathMatches: prefix, wildcard, anchor") {
    import RobotsOps.pathMatches
    assert(pathMatches("/", "/anything"))
    assert(pathMatches("/fish", "/fish.html"))
    assert(pathMatches("/fish", "/fishheads/x"))
    assert(!pathMatches("/fish", "/Fish")) // case-sensitive paths
    assert(pathMatches("/fish*.php", "/fishheads/catfish.php?parrots"))
    assert(pathMatches("/*.pdf$", "/a/doc.pdf"))
    assert(!pathMatches("/*.pdf$", "/doc.pdfx"))
    assert(pathMatches("/p*p$", "/peep"))
    assert(!pathMatches("/p*p$", "/peeps"))
    assert(pathMatches("", "/x")) // empty pattern = prefix of anything
    assert(pathMatches("/*/b", "/a/b"))
    assert(pathMatches("/*/b", "/a/c/b")) // * spans octets incl '/'
  }

  test("precedence: longest match wins, allow wins ties") {
    val r1 = "User-agent: *\nDisallow: /\nAllow: /p"
    assert(allowed(r1, "/page")) // /p (2) beats / (1)
    assert(!allowed(r1, "/x"))
    val r2 = "User-agent: *\nDisallow: /folder\nAllow: /folder"
    assert(allowed(r2, "/folder/page")) // tie -> allow
    val r3 = "User-agent: *\nAllow: /page\nDisallow: /*.htm"
    assert(!allowed(r3, "/page.htm")) // /*.htm (6) beats /page (5)
    val r4 = "User-agent: *\nAllow: /$\nDisallow: /"
    assert(allowed(r4, "/")) // /$ (2) beats / (1)
    assert(!allowed(r4, "/page")) // anchor doesn't match /page
  }

  test("group selection: most-specific product-token prefix, * fallback") {
    val r = "User-agent: graftbot\nDisallow: /\n\n" +
      "User-agent: graft\nDisallow: /half\n\n" +
      "User-agent: *\nAllow: /"
    assert(!allowed(r, "/x", "GraftBot/1.0 (+https://ex.com)")) // longest prefix: graftbot
    assert(allowed(r, "/x", "OtherBot/2")) // falls to *
    assert(!allowed(r, "/half/x", "Grafter/9")) // prefix "graft" matches grafter
    assert(allowed(r, "/x", "Grafter/9"))
    // no group at all (not even *): everything allowed
    assert(allowed("User-agent: onlybot\nDisallow: /", "/x", "Me/1"))
  }

  test("parse tolerance: comments, blank lines, shared and split groups") {
    val r = "# banner\nUser-agent: a\nUser-agent: b\nDisallow: /s # inline\n" +
      "Unknown-key: zzz\n\nUser-agent: b\nDisallow: /t"
    // consecutive UA lines share one group; a UA after rules starts a new
    // group; BOTH b-groups tie at best specificity and merge
    assert(!allowed(r, "/s/x", "b"))
    assert(!allowed(r, "/t/x", "b"))
    assert(!allowed(r, "/s/x", "a"))
    assert(allowed(r, "/t/x", "a")) // agent a is only in the first group
    // empty Disallow means allow-everything (no rule)
    assert(allowed("User-agent: *\nDisallow:", "/x", "b"))
    // null robots.txt = no restrictions
    assert(allowed(null, "/x", "b"))
  }

  test("crawl-delay and sitemaps") {
    val r = "User-agent: graftbot\nCrawl-delay: 2.5\nDisallow: /a\n" +
      "User-agent: *\nCrawl-delay: 10\nSitemap: https://ex.com/map1.xml\n" +
      "Sitemap: https://ex.com/map2.xml"
    assert(RobotsOps.crawlDelay(r, "GraftBot/1") == 2.5)
    assert(RobotsOps.crawlDelay(r, "Other/1") == 10.0)
    assert(RobotsOps.crawlDelay("User-agent: *\nDisallow: /a", "x").isNaN)
    assert(RobotsOps.sitemaps(r).toSeq ==
      Seq("https://ex.com/map1.xml", "https://ex.com/map2.xml"))
    // malformed delay ignored, group still selected
    assert(RobotsOps.crawlDelay("User-agent: *\nCrawl-delay: soon", "x").isNaN)
  }

  test("review regressions: BOM prefix, empty UA, oversize body, NULL gate") {
    // a UTF-8 BOM must not eat the first User-agent line
    assert(!allowed("\uFEFF" + "User-agent: *\nDisallow: /", "/x", "Bot/1"))
    // an empty User-agent value is invalid (RFC 9309 product token is
    // non-empty) and must NOT become a universal wildcard group
    assert(allowed("User-agent:\nDisallow: /", "/x", "Bot/1"))
    // oversize bodies still parse correctly (just uncached)
    val big = "User-agent: *\nDisallow: /no\n" + ("# pad\n" * 90000)
    assert(big.length > 512 * 1024)
    assert(!allowed(big, "/no/x", "Bot/1"))
    assert(allowed(big, "/yes", "Bot/1"))
    // SQL three-state: null robots -> TRUE; null path with robots -> NULL
    import org.apache.spark.unsafe.types.UTF8String
    def u(s: String) = if (s == null) null else UTF8String.fromString(s)
    assert(RobotsOps.allowedCodegen(null, u("a"), u("/x")) == java.lang.Boolean.TRUE)
    assert(RobotsOps.allowedCodegen(u("User-agent: *\nDisallow: /"), u("a"), null) == null)
    assert(RobotsOps.allowedCodegen(u("User-agent: *\nDisallow: /"), null, u("/x")) == null)
  }
}
