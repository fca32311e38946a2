package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class PiiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("t")

  private def redacted(text: String): String =
    one(text).select(Pii.redact(col("t"))).head().getString(0)

  private def counts(text: String): (Long, Long, Long) = {
    val r = one(text).select(
      Pii.countMatches(col("t"), Pii.emailPattern),
      Pii.countMatches(col("t"), Pii.ipv4Pattern),
      Pii.countMatches(col("t"), Pii.ssnPattern)).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("each PII class is counted and redacted; clean text passes untouched") {
    val dirty = "mail a.b+c@ex-ample.org then 192.168.0.1 and 123-45-6789 done"
    assert(counts(dirty) == ((1L, 1L, 1L)))
    assert(redacted(dirty) == "mail <EMAIL> then <IP> and <SSN> done")

    val clean = "just ordinary words with numbers 12345 and dots. end"
    assert(counts(clean) == ((0L, 0L, 0L)))
    assert(redacted(clean) == clean)
  }

  test("multiple matches per class all redact (global replace)") {
    val s = "a@b.co c@d.io 1.2.3.4 5.6.7.8"
    assert(redacted(s) == "<EMAIL> <EMAIL> <IP> <IP>")
  }

  test("redaction is idempotent and order-safe (digit-bearing email local part never leaks an IP match)") {
    // '99.88.77.66@x.com' is an email whose local part alone would match
    // the IPv4 pattern — the email-first order must consume it whole
    val tricky = "ping 99.88.77.66@x.com and 99.88.77.66 twice"
    assert(redacted(tricky) == "ping <EMAIL> and <IP> twice")
    val once = one("ping 99.88.77.66@x.com and 99.88.77.66 twice")
      .select(Pii.redact(col("t")).as("t"))
    assert(once.select(Pii.redact(col("t"))).head().getString(0)
      == once.head().getString(0))
  }
}
