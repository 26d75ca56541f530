package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hand-computed canonicalization cases for the Web layer — the DuckDB
  * oracle pins the full fixture sweep; these pin the individual
  * normalization rules and the guards on explicit examples.
  */
class WebSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def canonOf(urls: (Long, String)*): Map[Long, (String, String)] =
    Web.UrlCanonicalize().transform(urls.toDF("doc_id", "url"))
      .select("doc_id", "url_canonical", "host")
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("canonicalization: every documented rule on explicit examples") {
    val got = canonOf(
      // case, www., default port, trailing slash, tracking params,
      // unsorted params, fragment — all at once
      1L -> "HTTP://User:pw@WWW.Ex.COM:80/A//b/?utm_source=z&b=2&a=1#f",
      // https default port; gclid; root path
      2L -> "https://ex.com:443/?gclid=9",
      // non-default port kept; params already clean stay sorted
      3L -> "http://ex.com:8080/p?b=2&a=1",
      // bare authority; no query
      4L -> "http://www.ex.com",
      // only tracking params -> query disappears entirely
      5L -> "http://ex.com/p?utm_a=1&utm_b=2&fbclid=x",
      // a param NAMED LIKE a tracking prefix but longer is kept
      6L -> "http://ex.com/p?fbclidX=5",
      // scheme-less and null are the malformed class
      7L -> "ex.com/p",
      8L -> null,
      // the RUN of www. prefixes strips in one pass (ADVICE r12):
      // a canonical host is a fixed point even for double-www inputs
      9L -> "http://www.www.ex.com/x",
      // the documented degenerate collapse: host becomes bare 'com'
      10L -> "http://www.com/x",
      // percent normalization: unreserved octets decode (%41→A,
      // %7e→~, %2E→.), others keep an UPPERCASED escape (%2f→%2F)
      11L -> "http://ex.com/a%41b%2fc%7e%2E",
      // %2F never splits a path segment (decode happens, slash
      // collapse runs on REAL slashes only)
      12L -> "http://ex.com/a%2f/b//c",
      // malformed escapes pass through byte-identically
      13L -> "http://ex.com/%zz%",
      // encoded unreserved in the HOST decodes then lowercases
      14L -> "http://ex%41mple.com/x")
    assert(got(1L) == (("http://ex.com/A/b?a=1&b=2", "ex.com")))
    assert(got(2L) == (("https://ex.com", "ex.com")))
    assert(got(3L) == (("http://ex.com:8080/p?a=1&b=2", "ex.com")))
    assert(got(4L) == (("http://ex.com", "ex.com")))
    assert(got(5L) == (("http://ex.com/p", "ex.com")))
    assert(got(6L) == (("http://ex.com/p?fbclidX=5", "ex.com")))
    assert(got(7L) == ((null, null)))
    assert(got(8L) == ((null, null)))
    assert(got(9L) == (("http://ex.com/x", "ex.com")))
    assert(got(10L) == (("http://com/x", "com")))
    assert(got(11L) == (("http://ex.com/aAb%2Fc~.", "ex.com")))
    assert(got(12L) == (("http://ex.com/a%2F/b/c", "ex.com")))
    assert(got(13L) == (("http://ex.com/%zz%", "ex.com")))
    assert(got(14L) == (("http://example.com/x", "example.com")))
  }

  test("host_stats: canonical collapse drives the dup ratio; malformed " +
    "urls are one null-host class") {
    val df = Seq(
      (1L, "http://www.A.com/x/"),
      (2L, "HTTP://a.com:80/x?utm_s=1"),   // same page as 1
      (3L, "http://a.com/y"),
      (4L, "http://b.com/z"),
      (5L, "junk"), (6L, "junk2")).toDF("doc_id", "url")
    val got = Web.HostStats().transform(df)
      .as[(String, Long, Long, Double)].collect()
      .map(r => Option(r._1) -> ((r._2, r._3, r._4))).toMap
    assert(got(Some("a.com")) == ((3L, 2L, 1.0 / 3.0)))
    assert(got(Some("b.com")) == ((1L, 1L, 0.0)))
    // malformed: 2 docs, all-null canonicals = ONE class
    assert(got(None) == ((2L, 1L, 0.5)))
  }

  test("canonicalization is IDEMPOTENT: a canonical url is its own " +
    "fixed point (re-canonicalizing changes nothing) across a messy " +
    "random sweep") {
    val rnd = new scala.util.Random(37)
    val schemes = Seq("http://", "HTTP://", "https://", "HTTPS://", "ftp://")
    val hosts = Seq("www.Ex.COM", "ex.com", "a.b.example.org", "WWW.X.IO",
      "www.www.Ex.COM", "WWW.www.WWW.x.io")
    val ports = Seq("", ":80", ":443", ":8080")
    val paths = Seq("", "/", "/p", "/a//b/", "/A/B/C///",
      "/e%41%2f%7e", "/x%zz%", "/%2525", "/a%2f/b//c%7E")
    val queries = Seq("", "?b=2&a=1", "?utm_x=1&a=1", "?gclid=9",
      "?a=1&&b=2&", "?fbclidX=1&utm_=2", "?a=%41&b=%2f")
    val frags = Seq("", "#f", "#a#b")
    val urls = (0 until 300).map { i =>
      (i.toLong, schemes(rnd.nextInt(schemes.size)) +
        hosts(rnd.nextInt(hosts.size)) + ports(rnd.nextInt(ports.size)) +
        paths(rnd.nextInt(paths.size)) +
        queries(rnd.nextInt(queries.size)) + frags(rnd.nextInt(frags.size)))
    }
    val first = Web.UrlCanonicalize().transform(urls.toDF("doc_id", "url"))
      .select("doc_id", "url_canonical")
      .as[(Long, String)].collect().toSeq
    assert(first.forall(_._2 != null))
    val second = Web.UrlCanonicalize().transform(
        first.toDF("doc_id", "url"))
      .select("doc_id", "url_canonical")
      .as[(Long, String)].collect().toSeq
    assert(second.sortBy(_._1) == first.sortBy(_._1),
      "canonical urls must be fixed points")
  }

  test("guards: missing url column and output-name collisions fail loud") {
    assertThrows[Exception](
      Web.UrlCanonicalize().transform(Seq((1L, "x")).toDF("doc_id", "t")))
    assertThrows[IllegalArgumentException](
      Web.UrlCanonicalize().transform(
        Seq(("http://a.com", "h")).toDF("url", "host")))
  }
}
