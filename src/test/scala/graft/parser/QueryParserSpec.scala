package graft.parser

import org.scalatest.funsuite.AnyFunSuite
import QueryParser._

class QueryParserSpec extends AnyFunSuite {

  test("Q1: consecutive bare words form a single term (README.md:21)") {
    assert(parse("zebra habitat -zebra") == Seq(
      SignedTerm(1.0f, Words("zebra habitat")),
      SignedTerm(-1.0f, Words("zebra"))))
  }

  test("Q2: signed magnitude and defaults (rclip_server.py:87-92)") {
    assert(parse("+2.5(summer sports)") ==
      Seq(SignedTerm(2.5f, Group("summer sports"))))
    assert(parse("zebra") == Seq(SignedTerm(1.0f, Words("zebra"))))
    assert(parse("-x") == Seq(SignedTerm(-1.0f, Words("x"))))
    assert(parse("zebra -stripes +spots") == Seq(
      SignedTerm(1.0f, Words("zebra")),
      SignedTerm(-1.0f, Words("stripes")),
      SignedTerm(1.0f, Words("spots"))))
  }

  test("Q3: outer parens stripped, nesting preserved") {
    assert(parse("((a b) c)") == Seq(SignedTerm(1.0f, Group("(a b) c"))))
  }

  test("quoted phrases (rclip_server.py:98)") {
    assert(parse("""-"black and white" cat""") == Seq(
      SignedTerm(-1.0f, Quoted("black and white")),
      SignedTerm(1.0f, Words("cat"))))
  }

  test("JSON terms keep braces (rclip_server.py:153)") {
    assert(parse("""{"image_id":28754} -{"image_id":174054}""") == Seq(
      SignedTerm(1.0f, JsonTerm("""{"image_id":28754}""")),
      SignedTerm(-1.0f, JsonTerm("""{"image_id":174054}"""))))
    assert(parse("""{"a":{"b":1}}""") == Seq(
      SignedTerm(1.0f, JsonTerm("""{"a":{"b":1}}"""))))
  }

  test("URLs and hyphenated words are single words (rclip_server.py:95)") {
    assert(parse("https://up/animal_7.jpg") ==
      Seq(SignedTerm(1.0f, Words("https://up/animal_7.jpg"))))
    assert(parse("black-and-white cat -https://x.com/a.png") == Seq(
      SignedTerm(1.0f, Words("black-and-white cat")),
      SignedTerm(-1.0f, Words("https://x.com/a.png"))))
  }

  test("Q11: empty / garbage input parses to no terms") {
    assert(parse("") == Nil)
    assert(parse("   ") == Nil)
    assert(parse("!!! ???") == Nil)
  }

  test("unbalanced brackets don't throw or stall; inner words still found") {
    // scan-for-matches: the unbalanced opener is skipped, words inside
    // are still collected (pyparsing searchString semantics)
    assert(parse("(oops zebra") == Seq(SignedTerm(1.0f, Words("oops zebra"))))
    assert(parse("zebra (oops") == Seq(
      SignedTerm(1.0f, Words("zebra")),
      SignedTerm(1.0f, Words("oops"))))
    parse("\"oops zebra") // unterminated quote must not throw
  }

  // --- hand-rolled property tests (seeded; scalacheck runner not bridged
  //     into scalatest in this offline build) ---

  private val rnd = new scala.util.Random(42)
  private def randWord(): String =
    (1 to (1 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString

  test("property: rendered signed word-terms round-trip (200 cases)") {
    for (_ <- 1 to 200) {
      val terms = (1 to (1 + rnd.nextInt(6))).map { _ =>
        (if (rnd.nextBoolean()) 1.0f else -1.0f, randWord())
      }
      val rendered = terms.map { case (s, w) =>
        (if (s < 0) "-" else "+") + w
      }.mkString(" ")
      assert(parse(rendered).map(t => (t.weight, t.body.text)) == terms,
        s"query: $rendered")
    }
  }

  test("property: explicit magnitudes round-trip through parens (200 cases)") {
    for (_ <- 1 to 200) {
      val terms = (1 to (1 + rnd.nextInt(6))).map { _ =>
        ((1 + rnd.nextInt(99)) / 10.0f, randWord())
      }
      val rendered = terms.map { case (m, w) => s"+$m($w)" }.mkString(" ")
      assert(parse(rendered).map(t => (t.weight, t.body.text)) == terms,
        s"query: $rendered")
    }
  }

  test("property: parser never throws on arbitrary input (500 cases)") {
    for (_ <- 1 to 500) {
      val len = rnd.nextInt(40)
      val s = (1 to len).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
      parse(s) // must not throw
    }
  }
}
