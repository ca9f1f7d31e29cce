package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Web

/** Edge-case specs for the URL curation family (operators/Web.scala). The
  * url_parse / url_canonicalize / url_dedup oracle queries check cross-engine
  * exactness over the synthetic corpus; these check the parsing and
  * canonicalization semantics on handcrafted boundary inputs.
  */
class WebSuite extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(url: String): (String, String, Option[Int], String, Option[String], String) = {
    val r = Seq(url).toDF("u")
      .select(Web.scheme(col("u")), Web.host(col("u")), Web.port(col("u")),
        Web.path(col("u")), Web.queryString(col("u")),
        Web.registeredDomain(Web.host(col("u"))))
      .collect()(0)
    (r.getString(0), r.getString(1),
      if (r.isNullAt(2)) None else Some(r.getInt(2)),
      r.getString(3),
      if (r.isNullAt(4)) None else Some(r.getString(4)),
      r.getString(5))
  }

  private def canon(url: String): String = {
    val r = Seq(url).toDF("u").select(Web.canonicalizeUrl(col("u"))).collect()(0)
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("url parse: scheme/host/port/path/query extraction and case folding") {
    assert(one("HTTP://WWW.Example.COM:8080/A/b?x=1#f") ===
      (("http", "www.example.com", Some(8080), "/A/b", Some("x=1"), "example.com")))
    assert(one("https://example.org") ===
      (("https", "example.org", None, "", None, "example.org")))
    assert(one("http://localhost/x") ===
      (("http", "localhost", None, "/x", None, "localhost")))
  }

  test("url parse: malformed inputs yield null scheme/host, canonical null") {
    for (bad <- Seq("not a url", "example.com/path", "://missing", "http//x.y")) {
      val r = Seq(bad).toDF("u")
        .select(Web.scheme(col("u")), Web.host(col("u"))).collect()(0)
      assert(r.isNullAt(0) && r.isNullAt(1), s"'$bad' must not parse")
      assert(canon(bad) == null, s"'$bad' must canonicalize to null")
    }
  }

  test("registered domain: multi-part public suffixes keep three labels") {
    assert(one("http://news.bbc.co.uk/x")._6 === "bbc.co.uk")
    assert(one("http://a.b.shop.com.au/")._6 === "shop.com.au")
    // two-label host whose WHOLE name is a multi-part suffix: nothing to
    // promote, last-2 fallback applies
    assert(one("http://co.uk/")._6 === "co.uk")
    assert(one("http://deep.sub.tree.example.com/")._6 === "example.com")
  }

  test("canonicalize: default ports drop, explicit non-default ports survive") {
    assert(canon("HTTP://Example.COM:80/a") === "http://example.com/a")
    assert(canon("https://example.com:443/a") === "https://example.com/a")
    assert(canon("http://example.com:8080/a") === "http://example.com:8080/a")
    // :443 is NOT default for http
    assert(canon("http://example.com:443/a") === "http://example.com:443/a")
  }

  test("canonicalize: tracking params stripped, survivors sorted, empty path → /") {
    assert(canon("https://e.com?b=2&utm_source=x&a=1#frag") === "https://e.com/?a=1&b=2")
    assert(canon("https://e.com/p?utm_campaign=c&gclid=g&fbclid=f&ref=r") === "https://e.com/p")
    // param ORDER never distinguishes two URLs
    assert(canon("https://e.com/p?z=1&a=2") === canon("https://e.com/p?a=2&z=1"))
    // value containing 'utm_' is not a tracking KEY
    assert(canon("https://e.com/p?q=utm_source") === "https://e.com/p?q=utm_source")
  }

  test("canonicalize: idempotent on its own output") {
    val urls = Seq(
      "HTTP://WWW.Example.CO.UK:80/docs/1?utm_source=a&id=2#x",
      "https://cdn.s1.example.org:8080/a/index.html?z=9&a=1",
      "https://e.com")
    for (u <- urls) {
      val c1 = canon(u)
      assert(canon(c1) === c1, s"canonicalize must be idempotent: $u → $c1")
    }
  }

  test("SQL surface: graft_url_host / graft_reg_domain ≡ Column API") {
    graft.functions.GraftExtensions.register(spark)
    val urls = Seq(
      "HTTP://WWW.Example.CO.UK:80/docs/1?utm_source=a&id=2#x",
      "https://cdn.s1.example.org:8080/a?z=9&a=1",
      "not a url")
    urls.toDF("u").createOrReplaceTempView("web_sql_cases")
    val viaSql = spark.sql(
      """SELECT graft_url_host(u) AS h,
        |       graft_reg_domain(graft_url_host(u)) AS rd
        |FROM web_sql_cases""".stripMargin).collect()
    val viaCol = urls.toDF("u")
      .select(Web.host(col("u")).as("h"),
        Web.registeredDomain(Web.host(col("u"))).as("rd")).collect()
    assert(viaSql.map(_.toString).toSeq === viaCol.map(_.toString).toSeq,
      "SQL registration must produce the identical expression tree results")
    val desc = spark.sql("DESCRIBE FUNCTION graft_reg_domain")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("eTLD"), s"usage must describe the suffix handling:\n$desc")
  }

  test("url dedup folds canonicalization noise onto one key (plan: single hash agg)") {
    val df = Seq(
      (1L, "https://E.com/p?v=1&utm_source=a"),
      (2L, "HTTPS://e.COM:443/p?utm_campaign=b&v=1"),
      (3L, "https://e.com/p?v=1#frag"),
      (4L, "https://e.com/p?v=2")).toDF("id", "url")
    val out = df.select(col("id"), Web.canonicalizeUrl(col("url")).as("c"))
      .groupBy("c").agg(min("id").as("keep"), count(lit(1)).as("n"))
      .orderBy("c").collect()
    assert(out.length === 2)
    assert(out(0).getString(0) === "https://e.com/p?v=1")
    assert(out(0).getLong(1) === 1L && out(0).getLong(2) === 3L)
    assert(out(1).getString(0) === "https://e.com/p?v=2")
    // no Exchange beyond the one hash agg; no UDF anywhere in the plan
    val plan = df.select(Web.canonicalizeUrl(col("url")).as("c"))
      .groupBy("c").count().queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"),
      s"URL canonicalization must stay codegen'd, no UDF:\n$plan")
  }
}
