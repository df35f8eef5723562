package graft

import graft.ops.Urls
import org.apache.spark.sql.functions._

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def hostOf(u: String): String =
    Seq(u).toDF("u").select(Urls.host($"u")).as[String].head()

  private def keyOf(u: String): String =
    Seq(u).toDF("u").select(Urls.canonicalKey($"u")).as[String].head()

  test("host: case, www, port, trailing dot, fragment all normalize away") {
    assert(hostOf("HTTPS://WWW.Example.COM:443/a/b?q=1#frag") == "example.com")
    assert(hostOf("http://example.com:80/") == "example.com")
    assert(hostOf("https://cdn.example.org./x") == "cdn.example.org")
    assert(hostOf("example.com/bare-no-scheme") == "example.com")
    assert(hostOf("ftp://files.example.com/pub") == "files.example.com")
  }

  test("host: only ONE leading www and ONE trailing dot are stripped") {
    assert(hostOf("http://www.www.example.com/") == "www.example.com")
    assert(hostOf("http://example.com../") == "example.com.")
  }

  test("registrableDomain: last two labels; single-label hosts yield empty") {
    val d = Seq("a.b.example.com", "example.org", "localhost")
      .toDF("h").select(Urls.registrableDomain($"h")).as[String].collect()
    assert(d.toSeq == Seq("example.com", "example.org", ""))
  }

  test("canonicalKey: scheme-insensitive, fragment-insensitive, query-preserving") {
    assert(keyOf("http://Example.com/a?x=1#f") == keyOf("https://WWW.example.com:443/a?x=1"))
    assert(keyOf("http://example.com/a?x=1") != keyOf("http://example.com/a?x=2"))
    assert(keyOf("https://example.com") == "example.com/")
    assert(keyOf("https://example.com/") == "example.com/")
  }

  test("url-key exact dedup: spelling variants collapse to one survivor") {
    val urls = Seq(
      (1L, "http://www.Site.com/page"),
      (2L, "https://site.com:443/page"),
      (3L, "https://site.com/page#top"),
      (4L, "https://site.com/other")
    ).toDF("id", "url").withColumn("k", Urls.canonicalKey($"url"))
    val survivors = urls.groupBy($"k").agg(min($"id").as("keep"))
    assert(survivors.count() == 2)
    assert(survivors.orderBy($"keep").as[(String, Long)].collect().map(_._2).toSeq == Seq(1L, 4L))
  }
}
