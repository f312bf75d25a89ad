package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PII masking: each category masks, order prevents the phone pattern
  * from eating email/IP digits, non-PII text passes untouched. */
class PiiSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mask(s: String): String =
    Seq(s).toDF("t").select(TextOps.maskPii(col("t"))).head().getString(0)

  test("emails, IPs, and phone runs mask to typed placeholders") {
    assert(mask("mail me at jo.doe+x@sub.example.org today") ==
      "mail me at <EMAIL> today")
    assert(mask("server 192.168.001.7 down") == "server <IP> down")
    assert(mask("call +1 (555) 010-4242 now") == "call +<PHONE> now")
    assert(mask("a@b.co 10.0.0.1 555-123-4567") == "<EMAIL> <IP> <PHONE>")
  }

  test("order matters: email/IP digits are not re-matched as phones") {
    assert(mask("x1234567@e.com") == "<EMAIL>")
    assert(mask("8.8.8.8") == "<IP>")
  }

  test("non-PII text is untouched; short digit runs survive") {
    val s = "order 4242 delivered qty 7 aisle 9"
    assert(mask(s) == s)
    assert(mask("") == "")
    // documented aggressiveness: long separator-joined digit runs mask
    // even when they are dates — a scrubber errs toward masking
    assert(mask("on 2024-01-05 it rained") == "on <PHONE> it rained")
  }
}
