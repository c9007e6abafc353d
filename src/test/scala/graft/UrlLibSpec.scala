package graft

import org.apache.spark.sql.functions._
import graft.text.UrlLib

class UrlLibSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlLib.canonicalizeUrl(col("u"))).as[String].collect().toSeq

  test("url canonicalization rules") {
    assert(canon(
      "HTTP://WWW.Example.COM:80/Path/X?z=1&utm_source=f&a=2#frag",
      "https://Site.co.uk:443/",           // default https port stripped
      "http://h.org:443/p",                // 443 on http is NOT default: kept
      "https://h.org:80/p",                // 80 on https kept
      "https://blog.host.org?fbclid=abc",  // empty path -> "/", all-tracking query dropped
      "http://user:pw@Host.net:8080/p?b=2&a=1&a=0", // userinfo stripped, params sorted, dups kept
      "  plain text, not a url  ",         // passthrough, trimmed
      "ftp://Files.Example.com/Pub",       // non-http scheme: no default-port rule, still canonical
      "http://h.io/p?&&a=1&",              // empty tokens dropped
      "") == Seq(
      "http://www.example.com/Path/X?a=2&z=1",
      "https://site.co.uk/",
      "http://h.org:443/p",
      "https://h.org:80/p",
      "https://blog.host.org/",
      "http://host.net:8080/p?a=0&a=1&b=2",
      "plain text, not a url",
      "ftp://files.example.com/Pub",
      "http://h.io/p?a=1",
      ""))
  }

  test("url canonicalization null safety") {
    val out = Seq[Option[String]](None, Some("https://x.com/a"))
      .toDF("u").select(UrlLib.canonicalizeUrl(col("u"))).collect()
    assert(out(0).isNullAt(0), "null url stays null")
    assert(out(1).getString(0) == "https://x.com/a")
  }

  test("host and registered domain") {
    val rows = Seq("https://a.b.Site.com/x", "http://news.site.co.uk/", "http://192.168.0.1/x",
        "http://localhost:9999/", "not a url")
      .toDF("u")
      .select(UrlLib.urlHost(col("u")).as("h"))
      .select(col("h"), UrlLib.registeredDomain(col("h")).as("d"))
      .collect()
    assert(rows(0).getString(0) == "a.b.site.com" && rows(0).getString(1) == "site.com")
    assert(rows(1).getString(0) == "news.site.co.uk" && rows(1).getString(1) == "site.co.uk")
    assert(rows(2).getString(0) == "192.168.0.1" && rows(2).getString(1) == "192.168.0.1",
      "IP literal is its own registered domain")
    assert(rows(3).getString(0) == "localhost" && rows(3).getString(1) == "localhost",
      "single-label host unchanged")
    assert(rows(4).isNullAt(0) && rows(4).isNullAt(1), "non-URL: null host AND null domain")
  }

  test("registered domain: PSL multi-label rules, wildcards, exceptions") {
    val cases = Seq(
      "foo.co.jp" -> "foo.co.jp",             // 2-label rule
      "a.b.foo.co.jp" -> "foo.co.jp",         // deep host, same suffix
      "school.k12.ca.us" -> "school.k12.ca.us", // 3-label rule
      "www.school.k12.ca.us" -> "school.k12.ca.us",
      "sub.town.kawasaki.jp" -> "sub.town.kawasaki.jp", // *.kawasaki.jp wildcard
      "www.city.kawasaki.jp" -> "city.kawasaki.jp", // !city.kawasaki.jp exception
      "city.kawasaki.jp" -> "city.kawasaki.jp", // the exception host itself
      "shop.example.tokyo.jp" -> "example.tokyo.jp", // prefecture 2-label
      "foo.bar.ck" -> "foo.bar.ck",           // *.ck wildcard TLD
      "www.ck" -> "www.ck",                   // !www.ck exception (registrable itself)
      "a.www.ck" -> "www.ck",                 // subdomain of the exception domain
      "pvt.example.com" -> "example.com",     // plain gTLD default
      "co.uk" -> "co.uk",                     // host IS a public suffix → unchanged
      "metro.tokyo.jp" -> "metro.tokyo.jp")   // suffix tokyo.jp + one label
    val out = cases.map(_._1).toDF("h")
      .select(UrlLib.registeredDomain(col("h")).as("d")).as[String].collect()
    cases.zip(out).foreach { case ((h, want), got) =>
      assert(got == want, s"registeredDomain($h) = $got, want $want")
    }
  }

  test("dedupByUrl keeps smallest id per canonical url; null urls pass through") {
    val df = Seq(
      (1L, "https://X.com/a?utm_source=f"),
      (2L, "https://x.com:443/a"),   // same canonical as id 1
      (3L, "https://x.com/b"),
      (4L, null.asInstanceOf[String]),
      (5L, null.asInstanceOf[String])).toDF("id", "url")
    val kept = UrlLib.dedupByUrl(df, "url", "id").select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L, 5L),
      "ids 1,3 survive dedup; both null-url rows pass through untouched")
  }

  test("interior newlines: path/query survive (no truncation, no false dedup)") {
    // trim() never touches interior newlines; without DOTALL the rest
    // pattern failed to match and every such URL collapsed to host + "/"
    assert(canon(
      "http://x.com/a\nz",
      "http://x.com/b\nz",
      "http://x.com/p?a=1\n2&utm_source=f\nz") == Seq(
      "http://x.com/a\nz",
      "http://x.com/b\nz",
      "http://x.com/p?a=1\n2"))
    val kept = Seq((1L, "http://x.com/a\nz"), (2L, "http://x.com/b\nz"))
      .toDF("id", "url")
    assert(UrlLib.dedupByUrl(kept, "url", "id").count() == 2,
      "distinct newline-bearing paths are NOT duplicates")
  }

  test("null url AND null id: every row passes through") {
    val df = Seq((Some(1L), Some("https://x.com/a")), (None, None),
        (None, None), (None, Some("https://x.com/a")))
      .toDF("id", "url")
    // rows: one real URL w/ id, two fully-null rows, one null-id duplicate
    // of row 1's URL (dedups against it: id null sorts first -> survivor)
    val out = UrlLib.dedupByUrl(df, "url", "id")
    assert(out.filter($"url".isNull).count() == 2,
      "null-url/null-id rows must ALL pass through (concat null-propagation regression)")
  }

  test("ipv6 literal hosts: bracket form survives port rules") {
    assert(canon(
      "http://[::1]:8080/p",   // non-default port kept
      "http://[::1]:80/p",     // default http port stripped
      "https://[2001:DB8::1]/x") == Seq(
      "http://[::1]:8080/p",
      "http://[::1]/p",
      "https://[2001:db8::1]/x"))
    val r = Seq("http://[::1]:8080/p").toDF("u")
      .select(UrlLib.urlHost(col("u")).as("h"))
      .select(col("h"), UrlLib.registeredDomain(col("h")).as("d")).collect()(0)
    assert(r.getString(0) == "[::1]" && r.getString(1) == "[::1]",
      "bracketed v6 literal is the host and its own registered domain")
  }
}
