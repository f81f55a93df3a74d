package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PiiRedactSpec extends SparkSpec {
  import spark.implicits._

  private def redactOne(s: String): String =
    Seq(s).toDF("t").select(PiiRedact.redact(col("t"))).head().getString(0)

  test("emails redact, including digit-bearing local parts and subdomains") {
    assert(redactOne("mail bob.smith+tag99@mail.example.co.uk now") ==
      "mail <EMAIL> now")
    assert(redactOne("a@b.io,c_d%e@f-g.org") == "<EMAIL>,<EMAIL>")
  }

  test("ipv4 redacts word-bounded dotted quads only") {
    assert(redactOne("from 192.168.001.1 and 8.8.8.8.") ==
      "from <IP> and <IP>.")
    // version strings with fewer than four groups survive
    assert(redactOne("spark 4.1.2 shipped") == "spark 4.1.2 shipped")
  }

  test("ssn and phone shapes redact; bare digit runs survive") {
    assert(redactOne("ssn 123-45-6789 ok") == "ssn <SSN> ok")
    assert(redactOne("call (555) 123-4567 or 555.123.4567") ==
      "call <PHONE> or <PHONE>")
    assert(redactOne("order 1234567890 unchanged") ==
      "order 1234567890 unchanged")
  }

  test("combined text, idempotency, and counts") {
    val dirty = "u42@ex.com home 10.0.0.1 ssn 123-45-6789 tel 555-123-4567"
    val once = redactOne(dirty)
    assert(once == "<EMAIL> home <IP> ssn <SSN> tel <PHONE>")
    assert(redactOne(once) == once, "redaction must be idempotent")
    val counts = Seq(dirty).toDF("t")
      .select(PiiRedact.counts(col("t")).map { case (n, c) => c.as(n) }: _*)
      .head()
    assert((0 to 3).map(counts.getLong) == Seq(1L, 1L, 1L, 1L))
  }

  test("clean text passes through byte-identical") {
    val clean = "key agg row scan slow fast table value part hash"
    assert(redactOne(clean) == clean)
  }
}
