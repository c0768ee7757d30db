package graft.sources

import graft.sources.cdc.{PgWalSenderFeed, SaslPrep}
import org.scalatest.funsuite.AnyFunSuite

/** RFC 4013 SASLprep: the \u00A73 example vectors verbatim, the table
  * edge cases the examples skip, and a live SCRAM session whose
  * password only matches because BOTH sides normalize. */
class SaslPrepSpec extends AnyFunSuite {

  test("RFC 4013 section 3 example vectors") {
    assert(SaslPrep.prepare("I\u00ADX") == "IX")   // soft hyphen removed
    assert(SaslPrep.prepare("user") == "user")     // identity
    assert(SaslPrep.prepare("USER") == "USER")     // case preserved
    assert(SaslPrep.prepare("\u00AA") == "a")      // feminine ordinal \u2192 a (NFKC)
    assert(SaslPrep.prepare("\u2168") == "IX")     // ROMAN NUMERAL NINE \u2192 IX
    intercept[IllegalArgumentException](SaslPrep.prepare("\u0007")) // control
    intercept[IllegalArgumentException](SaslPrep.prepare("\u06271")) // bidi
  }

  test("mapping and prohibition edges: spaces, ZWSP overlap, tagging, surrogates") {
    // non-ASCII spaces \u2192 SPACE; ZWSP (in both B.1 and C.1.2) \u2192 nothing
    assert(SaslPrep.prepare("a\u00A0b") == "a b")
    assert(SaslPrep.prepare("a\u2003b") == "a b")
    assert(SaslPrep.prepare("a\u200Bb") == "ab")
    // variation selectors map to nothing
    assert(SaslPrep.prepare("x\uFE0Fy") == "xy")
    // private use / non-characters / tagging prohibited
    intercept[IllegalArgumentException](SaslPrep.prepare("\uE000"))
    intercept[IllegalArgumentException](SaslPrep.prepare("\uFDD0"))
    intercept[IllegalArgumentException](SaslPrep.prepare(
      new String(Character.toChars(0xE0041))))
    // all-RTL is fine; RTL wrapped around neutral digits is fine
    assert(SaslPrep.prepare("\u05D0\u05D1") == "\u05D0\u05D1")
    assert(SaslPrep.prepare("\u06271\u0628") == "\u06271\u0628")
    // prepareOrRaw: prohibited input falls back to the raw string
    assert(SaslPrep.prepareOrRaw("password") == "password")
  }

  test("SCRAM end-to-end with a non-ASCII password: both sides normalize to the same salted key") {
    val srv = new StubPgWalSenderServer
    // password contains NBSP + ROMAN NUMERAL NINE: the server stores a
    // credential derived from SASLprep("p<NBSP>\u2168") = "p IX"; the
    // client types the ORIGINAL string \u2014 only RFC 5802 normalization
    // on both sides makes the proof verify
    srv.authMode = Some(("scram-sha-256", "replica", "p\u00A0\u2168"))
    try {
      val feed = new PgWalSenderFeed("localhost", srv.port, "db", "replica",
        password = Some("p\u00A0\u2168"))
      assert(feed.poll().isEmpty) // authenticated; nothing queued
      feed.close()
      // the normalized equivalent authenticates too \u2014 same credential
      val alias = new PgWalSenderFeed("localhost", srv.port, "db", "replica",
        password = Some("p IX"))
      assert(alias.poll().isEmpty)
      alias.close()
      // a genuinely different password still fails
      val bad = new PgWalSenderFeed("localhost", srv.port, "db", "replica",
        password = Some("p ix"))
      val e = intercept[java.io.IOException] { bad.poll() }
      assert(e.getMessage.contains("28P01"), e.getMessage)
      bad.close()
    } finally srv.close()
  }
}
