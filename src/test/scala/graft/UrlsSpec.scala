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

  test("property: any messy spelling of clean components normalizes to the same key") {
    val rnd = new scala.util.Random(19)
    val cases = (1 to 200).map { i =>
      val host = s"h$i.example.${if (i % 2 == 0) "com" else "org"}"
      val path = if (i % 3 == 0) "" else s"/a/$i"
      val query = if (i % 4 == 0) s"?q=$i" else ""
      val expected = host + (if (path.isEmpty) "/" else path) + query
      // messy spelling: random scheme, case, www, default port, dot, fragment
      val scheme = Seq("", "http://", "https://", "HTTPS://")(rnd.nextInt(4))
      val www = if (rnd.nextBoolean()) "www." else ""
      val spelledHost = {
        val h = if (rnd.nextBoolean()) host.toUpperCase else host
        h + (if (rnd.nextBoolean()) "." else "")
      }
      val port = if (rnd.nextBoolean()) ":" + Seq("80", "443", "8080")(rnd.nextInt(3)) else ""
      val frag = if (rnd.nextBoolean()) "#frag" else ""
      // a non-default port must NOT normalize away from the key? It
      // does by contract (ports stripped) — expected key is portless.
      (scheme + www + spelledHost + port + path + query + frag, expected)
    }
    val out = cases.toDF("url", "expected")
      .select(Urls.canonicalKey($"url").as("k"), $"expected")
      .as[(String, String)].collect()
    out.foreach { case (k, e) => assert(k == e, s"got $k want $e") }
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

  test("pathPrefixes: every ancestor once, depth-capped, empty-safe") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = Seq("/a/b/c/d", "/x", "", "/a//b").toDF("p")
      .select($"p", graft.ops.Urls.pathPrefixes($"p", 3).as("pre"))
      .as[(String, Seq[String])].collect().toMap
    assert(got("/a/b/c/d") == Seq("/a", "/a/b", "/a/b/c")) // capped at 3
    assert(got("/x") == Seq("/x"))
    assert(got("") == Seq.empty)
    assert(got("/a//b") == Seq("/a", "/a/b")) // empty segment dropped
  }
}
