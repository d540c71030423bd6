package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TextOps.urlNormalize]] / [[TextOps.urlDedupGroups]]. */
class UrlNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def norm(u: String): String =
    Seq(u).toDF("u").select(TextOps.urlNormalize(col("u"))).as[String].head()

  test("scheme and host lowercase, path case preserved") {
    assert(norm("HTTPS://ExAmPle.COM/Path/File") === "https://example.com/Path/File")
  }

  test("fragment dropped") {
    assert(norm("https://a.com/p#section-2") === "https://a.com/p")
  }

  test("default ports dropped, explicit ports kept") {
    assert(norm("http://a.com:80/p") === "http://a.com/p")
    assert(norm("https://a.com:443/p") === "https://a.com/p")
    assert(norm("https://a.com:8443/p") === "https://a.com:8443/p")
    // :443 is only default for https
    assert(norm("http://a.com:443/p") === "http://a.com:443/p")
  }

  test("leading www dropped") {
    assert(norm("https://www.a.com/p") === "https://a.com/p")
    // only a LEADING www label
    assert(norm("https://wwwa.com/p") === "https://wwwa.com/p")
  }

  test("tracking params dropped, survivors sorted, empty query elided") {
    assert(norm("https://a.com/p?utm_source=tw&b=2&a=1&fbclid=xyz") === "https://a.com/p?a=1&b=2")
    assert(norm("https://a.com/p?utm_campaign=c&gclid") === "https://a.com/p")
    // 'refresh' is not 'ref'
    assert(norm("https://a.com/p?refresh=1") === "https://a.com/p?refresh=1")
  }

  test("trailing slashes collapse; empty path becomes root") {
    assert(norm("https://a.com/p/") === "https://a.com/p")
    assert(norm("https://a.com/p///") === "https://a.com/p")
    assert(norm("https://a.com") === "https://a.com/")
    assert(norm("https://a.com/") === "https://a.com/")
  }

  test("non-URL strings pass through trimmed, unmangled") {
    assert(norm("  not a url  ") === "not a url")
    assert(norm("mailto:x@y.com") === "mailto:x@y.com")
  }

  test("the four scrape variants collapse to one group") {
    val df = Seq(
      (1L, "https://site7.com/p7"),
      (2L, "HTTPS://SITE7.COM:443/p7#frag"),
      (3L, "https://www.site7.com/p7?utm_source=x&gclid=1"),
      (4L, "https://site7.com/p7/")
    ).toDF("id", "url")
    val g = TextOps.urlDedupGroups(df, "id", "url")
      .as[(String, Long, Long)].collect()
    assert(g.toSeq === Seq(("https://site7.com/p7", 1L, 4L)))
  }
}
