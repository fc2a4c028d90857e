package graft

import org.apache.spark.sql.functions._
import graft.ext.Urls

/** Crafted cases for the X26b URL canonicalizer + URL-level dedup:
  * each test pins one declared rule (case, www, default ports,
  * fragments, tracking params, trailing slashes, the registered-domain
  * public-suffix core, the never-crash pass-through class) on inputs
  * built to decide exactly that rule.
  */
class UrlSpec extends SparkSuite {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u").select(Urls.canonicalUrl(col("u"))).head().getString(0)

  private def regDom(host: String): String =
    Seq(host).toDF("h")
      .select(Urls.registeredDomain(col("h"))).head().getString(0)

  test("scheme and host lowercase; path and query case preserved") {
    assert(canon("HTTPS://WWW.Example.COM/Path/X?Id=Ab") ===
      "https://example.com/Path/X?Id=Ab")
  }

  test("default ports drop, non-default ports stay") {
    assert(canon("http://h.com:80/a") === "http://h.com/a")
    assert(canon("https://h.com:443/a") === "https://h.com/a")
    assert(canon("http://h.com:443/a") === "http://h.com:443/a")
    assert(canon("https://h.com:8080/a") === "https://h.com:8080/a")
  }

  test("fragment drops, even when it contains a question mark") {
    assert(canon("https://h.com/a#sec") === "https://h.com/a")
    // the ? inside the fragment is not a query
    assert(canon("https://h.com/a#x?y=1") === "https://h.com/a")
  }

  test("tracking params drop; survivors keep original order; empty query drops its ?") {
    assert(canon("https://h.com/a?utm_source=f&b=2&a=1&fbclid=z") ===
      "https://h.com/a?b=2&a=1")
    assert(canon("https://h.com/a?utm_campaign=x&gclid=1") ===
      "https://h.com/a")
    // 'ref' is exact-match: 'referrer' is NOT a tracking key
    assert(canon("https://h.com/a?ref=x&referrer=y") ===
      "https://h.com/a?referrer=y")
  }

  test("trailing slashes strip; bare host normalizes to /") {
    assert(canon("https://h.com") === "https://h.com/")
    assert(canon("https://h.com/") === "https://h.com/")
    assert(canon("https://h.com/a/") === "https://h.com/a")
    assert(canon("https://h.com/a//") === "https://h.com/a")
  }

  test("one leading www strips; an inner www label stays") {
    assert(canon("https://www.h.com/a") === "https://h.com/a")
    assert(canon("https://news.www.h.com/a") === "https://news.www.h.com/a")
  }

  test("non-URL input passes through to the declared empty-component form") {
    assert(canon("not a url") === ":///")
    assert(canon("") === ":///")
  }

  test("registered domain: two labels, deep subdomains, multi-part TLDs") {
    assert(regDom("h.com") === "h.com")
    assert(regDom("a.b.h.com") === "h.com")
    assert(regDom("news.example.co.uk") === "example.co.uk")
    assert(regDom("x.ac.jp") === "x.ac.jp")
    assert(regDom("deep.x.com.au") === "x.com.au")
    assert(regDom("localhost") === "localhost")
  }

  test("registered domain: PSL-as-data — platform suffixes group per registrant") {
    // the r17 ask: github.io/co.jp-class hosts. Under the retired
    // last-2/3-labels heuristic ALL of GitHub Pages collapsed into
    // "github.io"; under the PSL table each subdomain is its own
    // registrant (github.io is a PRIVATE-section public suffix)
    assert(regDom("alice.github.io") === "alice.github.io")
    assert(regDom("www2.alice.github.io") === "alice.github.io")
    assert(regDom("bob.github.io") === "bob.github.io")
    // a host that IS a public suffix passes through whole
    assert(regDom("github.io") === "github.io")
    // 3-label rule: s3.amazonaws.com buckets are per-registrant
    assert(regDom("mybucket.s3.amazonaws.com") === "mybucket.s3.amazonaws.com")
    assert(regDom("x.mybucket.s3.amazonaws.com") === "mybucket.s3.amazonaws.com")
    // a host that IS a depth-3 rule passes through whole too (r18 —
    // the declared at-or-below-suffix-depth contract at EVERY rule
    // depth, not just the n <= 2 default branch)
    assert(regDom("s3.amazonaws.com") === "s3.amazonaws.com")
    // co.jp-class (ICANN section)
    assert(regDom("media.shop.co.jp") === "shop.co.jp")
    // a swapped-in table wins over the shipped core (data, not code)
    val custom = Seq("co.example")
    val got = Seq("a.b.co.example").toDF("h")
      .select(Urls.registeredDomain(col("h"), custom)).head().getString(0)
    assert(got === "b.co.example")
  }

  test("urlDedupRefresh fold equals the from-scratch rebuild over the union") {
    // v1: three fetches of /a (variants), one of /b; v2: a re-crawl of
    // /a (later fetch wins under latest-wins), a re-crawl of /b via a
    // tracking-param variant, and a brand-new /c
    val v1 = Seq(
      (1L, "https://WWW.h.com/a?utm_source=x"),
      (2L, "https://h.com/a/"),
      (3L, "https://h.com/a#frag"),
      (4L, "https://h.com/b")).toDF("id", "url")
    val v2 = Seq(
      (11L, "https://h.com/a"),
      (12L, "https://h.com/b?fbclid=z"),
      (13L, "https://h.com/c")).toDF("id", "url")
    for (latest <- Seq(true, false)) {
      val folded = Urls.urlDedupRefresh(
          Urls.urlDedup(v1, "url", "id", latestWins = latest),
          v2, "url", "id", latestWins = latest)
        .orderBy("canonical_url").collect().map(_.toSeq)
      val rebuilt = Urls.urlDedup(v1.unionByName(v2), "url", "id",
          latestWins = latest)
        .orderBy("canonical_url").collect().map(_.toSeq)
      assert(folded.toSeq == rebuilt.toSeq,
        s"fold != rebuild under latestWins=$latest")
    }
    // latest-wins: the re-crawled /a keeper moves to the v2 fetch; the
    // v1-only keeper survives untouched for URLs absent from v2
    val idx2 = Urls.urlDedupRefresh(
      Urls.urlDedup(v1, "url", "id", latestWins = true),
      v2, "url", "id", latestWins = true)
    val byUrl = idx2.collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(byUrl("https://h.com/a") == ((11L, 4L)))
    assert(byUrl("https://h.com/b") == ((12L, 2L)))
    assert(byUrl("https://h.com/c") == ((13L, 1L)))
  }

  test("canonicalization is idempotent on already-canonical urls") {
    val urls = Seq(
      "HTTPS://WWW.Example.COM:443/Path/?utm_source=f&id=3#frag",
      "Http://news.example.co.uk:8080/a//?fbclid=z&q=1",
      "https://h.com", "not a url")
    val df = urls.toDF("u").select(Urls.canonicalUrl(col("u")).as("c"))
    val twice = df.select(Urls.canonicalUrl(col("c")).as("c2"), col("c"))
    assert(twice.filter(col("c2") =!= col("c")).count() === 0L)
  }

  test("urlDedup: one survivor per canonical url, keeper is the smallest id") {
    val rows = Seq(
      (1L, "https://WWW.h.com/a?utm_source=x"),
      (2L, "https://h.com/a/"),
      (3L, "https://h.com/a#frag"),
      (4L, "https://h.com/b"),
      (5L, "http://h.com/a")) // scheme differs: NOT a duplicate of 1-3
      .toDF("doc_id", "url")
    val out = Urls.urlDedup(rows, "url", "doc_id")
      .orderBy("canonical_url").collect()
    assert(out.length === 3)
    val byUrl = out.map(r => r.getString(0) ->
      ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(byUrl("https://h.com/a") === (("h.com", 1L, 3L)))
    assert(byUrl("https://h.com/b") === (("h.com", 4L, 1L)))
    assert(byUrl("http://h.com/a") === (("h.com", 5L, 1L)))
  }
}
