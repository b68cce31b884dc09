package graft

import org.apache.spark.sql.functions._

import graft.text.Urls

/** URL curation goldens: canonicalization cases, eTLD+1 extraction,
  * keep-first URL dedup, and the deterministic domain cap. */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(u: String): String =
    Seq(u).toDF("u").select(Urls.normalizeUrl($"u").as("n")).head.getString(0)

  test("normalizeUrl: case, www, default port, fragment, tracking params") {
    assert(norm("HTTPS://WWW.Example.COM:443/Path/?utm_source=x&id=3#frag") ==
      "https://example.com/Path?id=3")
    // scheme-less → https; trailing slash off; path case preserved
    assert(norm("example.com/A/b/") == "https://example.com/A/b")
    // userinfo and http:80 stripped
    assert(norm("http://user:pw@Host.com:80/x") == "http://host.com/x")
    // all params tracking → no query at all
    assert(norm("https://a.io/p?gclid=1&utm_campaign=z") == "https://a.io/p")
    // non-tracking params and their order survive
    assert(norm("https://a.io/p?b=2&utm_term=q&a=1") == "https://a.io/p?b=2&a=1")
    // bare host root slash
    assert(norm("http://example.com/") == "http://example.com")
    // non-default port is content-bearing
    assert(norm("https://example.com:8443/x") == "https://example.com:8443/x")
    // null-safe
    val n = Seq((1, null: String)).toDF("id", "u")
      .select(Urls.normalizeUrl($"u")).head
    assert(n.isNullAt(0))
  }

  test("registeredDomain: multi-part suffixes, ports, bare hosts") {
    def dom(u: String): Option[String] = {
      val r = Seq(u).toDF("u").select(Urls.registeredDomain($"u")).head
      if (r.isNullAt(0)) None else Some(r.getString(0))
    }
    assert(dom("https://a.b.example.co.uk/x") == Some("example.co.uk"))
    assert(dom("https://news.example.com/y") == Some("example.com"))
    assert(dom("example.com:8080/z") == Some("example.com"))
    assert(dom("sub.shop.com.au") == Some("shop.com.au"))
    assert(dom("localhost") == None)
    assert(dom("") == None)
  }

  test("urlDedup: fragment/tracking variants collapse, lowest id wins") {
    val docs = Seq(
      (3L, "https://x.com/a?utm_source=m"),
      (1L, "HTTP://WWW.other.com/b"),
      (2L, "https://x.com/a#sec"),
      (5L, "https://x.com/a/")) // trailing slash variant
      .toDF("doc_id", "url")
    val kept = Urls.urlDedup(docs, "url").select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L))
  }

  test("domainCap: deterministic md5 selection; null domains pass") {
    val docs = (1L to 10L).map(i => (i, s"https://big.com/p/$i")) ++
      Seq((90L, "https://small.org/q"), (91L, null: String))
    val df = docs.toDF("doc_id", "url")
    val kept = Urls.domainCap(df, "url", maxPerDomain = 4)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept.length == 6) // 4 of big.com + small.org + null-url doc
    assert(kept.contains(90L) && kept.contains(91L))
    // the md5 order is stable: re-running selects the same 4
    val again = Urls.domainCap(df, "url", maxPerDomain = 4)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept.sorted.toSeq == again.sorted.toSeq)
    // the expected winners, computed independently
    val expect = (1L to 10L)
      .sortBy(i => org.apache.commons.codec.digest.DigestUtils.md5Hex(i.toString))
      .take(4).toSet + 90L + 91L
    assert(kept.toSet == expect)
    intercept[ParameterError] { Urls.domainCap(df, "url", 0) }
  }
}
