package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RegistrableDomainSpec extends SparkSpec {
  import spark.implicits._

  private def dom(urls: String*): Seq[Option[String]] =
    urls.toDF("u")
      .select(expressions.registrable_domain(col("u")).as("d"))
      .collect().map(r => Option(r.getString(0))).toSeq

  test("suffix + one label; subdomains strip; case/trailing dot fold") {
    assert(dom(
      "https://www.example.com/path?q=1",
      "a.b.c.Example.COM.",
      "example.com",
      "deep.sub.tree.example.org") == Seq(
      Some("example.com"),
      Some("example.com"),
      Some("example.com"),
      Some("example.org")))
  }

  test("longest suffix rule wins: two-level country and private-registry " +
       "suffixes") {
    assert(dom(
      "https://shop.acme.co.uk",
      "acme.co.uk",
      // github.io is a (private-registry) suffix: each user site is its
      // own registrable domain
      "https://docs.myuser.github.io/guide",
      // .co is ALSO a TLD on its own: t.co stays t.co
      "https://t.co/xyz") == Seq(
      Some("acme.co.uk"),
      Some("acme.co.uk"),
      Some("myuser.github.io"),
      Some("t.co")))
  }

  test("PSL wildcard and exception rules (*.ck / !www.ck)") {
    assert(dom(
      "http://anything.under.x.ck", // suffix under.x? no: *.ck => x.ck
      "x.y.ck",
      "https://sub.www.ck", // exception: www.ck is registrable
      "www.ck") == Seq(
      Some("under.x.ck"),
      Some("x.y.ck"),
      Some("www.ck"),
      Some("www.ck")))
  }

  test("bare public suffixes and malformed hosts are null; IPs pass " +
       "through as their own key") {
    assert(dom("com", "co.uk", "github.io", "CK.",
      "bad..host", "", "   ") ==
      Seq(None, None, None, None, None, None, None))
    assert(dom(
      "http://user@192.168.3.44:8080/a",
      "https://[2001:db8::1]:443/x",
      // all-numeric but not 4 labels: treated as a (weird) hostname
      "12.34") == Seq(
      Some("192.168.3.44"),
      Some("[2001:db8::1]"),
      Some("12.34")))
  }

  test("unknown TLDs fall back to the implicit * rule") {
    assert(dom("foo.bar.unknowntld") == Seq(Some("bar.unknowntld")))
  }

  test("caller-supplied rule table overrides the default") {
    val rules = Seq("internal", "*.cluster", "!gateway.cluster")
    val out = Seq("a.b.internal", "x.svc.cluster", "sub.gateway.cluster")
      .toDF("u")
      .select(expressions.registrable_domain(col("u"), rules).as("d"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(out == Seq(Some("b.internal"), Some("x.svc.cluster"),
      Some("gateway.cluster")))
  }

  test("SQL registration parity") {
    Seq("https://www.shop.acme.co.uk/x").toDF("u")
      .createOrReplaceTempView("__rd_urls")
    val sql = spark.sql(
      "SELECT graft_registrable_domain(u) FROM __rd_urls")
      .head().getString(0)
    assert(sql == "acme.co.uk")
  }

  test("interpreted eval matches codegen") {
    val urls = Seq("https://www.example.com", "x.y.ck", "co.uk",
      "sub.www.ck", "http://1.2.3.4/p", "a.b.blogspot.com")
    val viaCodegen = dom(urls: _*)
    import org.apache.spark.unsafe.types.UTF8String
    val table = new SuffixTable(RegistrableDomain.DefaultRules)
    val viaKernel = urls.map(u => Option(
      ExprKernels.registrableDomain(UTF8String.fromString(u), table))
      .map(_.toString))
    assert(viaCodegen == viaKernel)
  }
}
