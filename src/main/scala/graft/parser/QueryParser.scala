package graft.parser

/** The reference's query language (SURVEY §2.7; grammar at
  * `rclip_server.py:85-106`) — the engine's "SQL dialect":
  *
  * {{{
  * query := term+                      (scan-for-matches semantics, :131)
  * term  := sign? body
  * sign  := ('+' | '-') number?       (:87-92; defaults: sign '+', magnitude 1)
  * body  := '"' ... '"'               (:98  quoted phrase)
  *        | '(' ... ')'               (:99-101 nested, original text kept :104)
  *        | '{' ... '}'               (JSON term — image_id / clip_embedding /
  *                                     random_img / random_seed, :153-174)
  *        | word+                     (:95-96 unicode word chars; CONSECUTIVE
  *                                     words form ONE term — README.md:21)
  * }}}
  *
  * Hand-rolled recursive descent (no parser-combinator dependency in the
  * build). Pure driver-side function: it produces signed term texts, never
  * a Spark plan.
  */
object QueryParser {

  /** One signed query term: `weight` = sign × magnitude (Q2). */
  final case class SignedTerm(weight: Float, body: TermBody)

  sealed trait TermBody {
    /** The text handed to term resolution (outer parens stripped — Q3,
      * `rclip_server.py:134`; quotes stripped; JSON kept with braces). */
    def text: String
  }
  /** One-or-more consecutive bare words, a single term (Q1). */
  final case class Words(text: String) extends TermBody
  /** Quoted phrase — quotes removed. */
  final case class Quoted(text: String) extends TermBody
  /** Parenthesized group — outer parens stripped, inner text verbatim. */
  final case class Group(text: String) extends TermBody
  /** `{...}` JSON term — braces kept (resolver parses the JSON). */
  final case class JsonTerm(text: String) extends TermBody

  /** Word start/body per the reference grammar (`rclip_server.py:95`):
    * a word STARTS with an alphanumeric but its BODY may be any printable
    * except `([{}])` — so hyphenated words and bare URLs
    * (`https://…/x.jpg`) are single words. */
  private def isWordStart(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'
  private def isWordBody(c: Char): Boolean =
    !c.isWhitespace && "([{}])".indexOf(c.toInt) < 0

  /** Parse a query. Mirrors pyparsing `searchString`: unmatchable
    * characters are skipped, every parsable term is collected. Empty or
    * all-garbage input → Nil (Q11 → the engine returns no results). */
  def parse(q: String): Seq[SignedTerm] = {
    val out = Seq.newBuilder[SignedTerm]
    var i = 0
    val n = q.length

    def skipWs(): Unit = { while (i < n && q(i).isWhitespace) i += 1 }

    /** sign? number? — returns weight; consumes nothing if no sign. */
    def parseSign(): Float = {
      if (i < n && (q(i) == '+' || q(i) == '-')) {
        val neg = q(i) == '-'
        i += 1
        val start = i
        while (i < n && (q(i).isDigit || q(i) == '.')) i += 1
        val mag =
          if (i == start) 1.0f
          else try q.substring(start, i).toFloat
          catch { case _: NumberFormatException => i = start; 1.0f }
        if (neg) -mag else mag
      } else 1.0f
    }

    /** Balanced bracket scan; returns inner text, or None (consuming the
      * opener, so the outer loop always advances) if unbalanced. */
    def parseBracketed(open: Char, close: Char): Option[String] = {
      val start = i + 1
      var depth = 1
      var j = start
      while (j < n && depth > 0) {
        if (q(j) == open) depth += 1
        else if (q(j) == close) depth -= 1
        j += 1
      }
      if (depth != 0) { i += 1; None }
      else { i = j; Some(q.substring(start, j - 1)) }
    }

    def parseBody(): Option[TermBody] = {
      if (i >= n) None
      else q(i) match {
        case '"' =>
          val close = q.indexOf('"', i + 1)
          if (close < 0) { i += 1; None }
          else { val t = q.substring(i + 1, close); i = close + 1; Some(Quoted(t)) }
        case '(' => parseBracketed('(', ')').map(Group.apply)
        case '{' => parseBracketed('{', '}').map(t => JsonTerm("{" + t + "}"))
        case c if isWordStart(c) =>
          // Consecutive whitespace-separated words accumulate into ONE
          // term (Q1): `zebra habitat -zebra` = +⟨zebra habitat⟩ −⟨zebra⟩.
          val words = Seq.newBuilder[String]
          var continue = true
          while (continue) {
            val start = i
            while (i < n && isWordBody(q(i))) i += 1
            if (i > start) words += q.substring(start, i)
            val mark = i
            skipWs()
            if (i >= n || !isWordStart(q(i))) { i = if (i > mark) i else mark; continue = false }
          }
          Some(Words(words.result().mkString(" ")))
        case _ => i += 1; None // skip unmatchable char (searchString semantics)
      }
    }

    while (i < n) {
      skipWs()
      if (i < n) {
        val w = parseSign()
        skipWs()
        parseBody().foreach(b => out += SignedTerm(w, b))
      }
    }
    out.result()
  }
}
