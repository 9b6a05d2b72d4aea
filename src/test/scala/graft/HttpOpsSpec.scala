package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.spark.HttpOps

/** [[graft.spark.HttpOps]]: RFC 9110 §5.6.7 date parsing (all three
  * formats, independently computed epochs) and RFC 9111 §4.2 freshness. */
class HttpOpsSpec extends AnyFunSuite {

  test("http-date: the RFC 9110 example in all three formats") {
    // epoch 784111777 = 1994-11-06T08:49:37Z, computed outside the parser
    assert(HttpOps.parseDate("Sun, 06 Nov 1994 08:49:37 GMT") == 784111777L)
    assert(HttpOps.parseDate("Sunday, 06-Nov-94 08:49:37 GMT") == 784111777L)
    assert(HttpOps.parseDate("Sun Nov  6 08:49:37 1994") == 784111777L)
  }

  test("http-date: tolerance — wrong weekday ignored, UTC for GMT, garbage null") {
    assert(HttpOps.parseDate("Mon, 06 Nov 1994 08:49:37 GMT") == 784111777L)
    assert(HttpOps.parseDate("Sun, 06 Nov 1994 08:49:37 UTC") == 784111777L)
    assert(HttpOps.parseDate("sun, 06 nov 1994 08:49:37 GMT") == 784111777L)
    assert(HttpOps.parseDate("0") == null)
    assert(HttpOps.parseDate("") == null)
    assert(HttpOps.parseDate(null) == null)
    assert(HttpOps.parseDate("Sun, 06 Nov 1994 08:49:37 PST") == null)
    assert(HttpOps.parseDate("Sun, 32 Nov 1994 08:49:37 GMT") == null)
  }

  test("rfc850 two-digit years map into [1970, 2069] deterministically") {
    assert(HttpOps.parseDate("Saturday, 01-Mar-25 00:00:00 GMT") == 1740787200L)
    assert(HttpOps.parseDate("Thursday, 01-Jan-70 00:00:00 GMT") == 0L)
  }

  test("cache-control directive parsing: quoting, OWS, value-less") {
    assert(HttpOps.directive("max-age=3600", "max-age") == "3600")
    assert(HttpOps.directive("private , max-age=\"60\" ,no-store", "max-age") == "60")
    assert(HttpOps.directive("private, no-store", "no-store") == "")
    assert(HttpOps.directive("private", "max-age") == null)
    assert(HttpOps.directive(null, "max-age") == null)
  }

  test("freshness: shared-cache rule order and Age subtraction") {
    def f(cc: String = null, age: String = null, exp: String = null,
        dt: String = null, lm: String = null) =
      HttpOps.freshSeconds(cc, age, exp, dt, lm)
    assert(f(cc = "max-age=3600", age = "600") == 3000L)
    assert(f(cc = "no-store") == 0L)
    assert(f(cc = "no-cache, max-age=3600") == 0L)
    assert(f(cc = "s-maxage=600, max-age=7200") == 600L)
    // Expires - Date beats the heuristic; Last-Modified ignored when present
    assert(f(exp = "Tue, 01 Apr 2025 02:00:00 GMT",
      dt = "Tue, 01 Apr 2025 00:00:00 GMT",
      lm = "Sat, 01 Mar 2025 00:00:00 GMT") == 7200L)
    // invalid Expires = a time in the past (RFC 9111 §5.3)
    assert(f(exp = "0", dt = "Tue, 01 Apr 2025 00:00:00 GMT") == 0L)
    // heuristic: 10% of Date - Last-Modified (31 days → 267840 s)
    assert(f(dt = "Tue, 01 Apr 2025 00:00:00 GMT",
      lm = "Sat, 01 Mar 2025 00:00:00 GMT") == 267840L)
    // age larger than lifetime floors at 0, never negative
    assert(f(cc = "max-age=10", age = "999") == 0L)
    // no basis at all → null (refetch policy is the caller's)
    assert(f() == null)
    assert(f(lm = "Sat, 01 Mar 2025 00:00:00 GMT") == null)
    // unparseable Age treated as 0, not a failure
    assert(f(cc = "max-age=100", age = "x") == 100L)
  }
}
