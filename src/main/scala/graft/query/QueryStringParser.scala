package graft.query

/** Parser for the Atlas `$search` `queryString` operator's Lucene-style
  * syntax (reference pass-through: the driver hands the string to the
  * server; here it compiles to a scan predicate).
  *
  * Supported grammar, precedence NOT > AND > OR, parentheses allowed:
  *
  * {{{
  *   expr    := and ( OR and )*
  *   and     := unary ( AND unary )*
  *   unary   := NOT unary | '(' expr ')' | clause
  *   clause  := [field ':'] ( '"' phrase '"' | term )
  * }}}
  *
  * Operators must be uppercase AND/OR/NOT (Lucene keywords); bare
  * adjacency (an implicit default operator) is REJECTED with guidance
  * rather than silently guessing — Lucene's default-OR surprises more
  * than it helps. Terms may contain `*`/`?` wildcards (matched against
  * analyzed terms, like the `wildcard` operator); quoted phrases match
  * as substrings (like `phrase`).
  */
object QueryStringParser {

  sealed trait Node
  final case class Term(field: Option[String], text: String) extends Node
  final case class Phrase(field: Option[String], text: String) extends Node
  final case class Not(child: Node) extends Node
  final case class And(left: Node, right: Node) extends Node
  final case class Or(left: Node, right: Node) extends Node

  private sealed trait Tok
  private case object LP extends Tok
  private case object RP extends Tok
  private case object AndT extends Tok
  private case object OrT extends Tok
  private case object NotT extends Tok
  private final case class Clause(field: Option[String], text: String,
      quoted: Boolean) extends Tok

  private def err(msg: String): Nothing =
    throw new IllegalArgumentException(s"queryString: $msg")

  private def tokenize(s: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    def readQuoted(): String = {
      val j = s.indexOf('"', i)
      if (j < 0) err("unterminated quote")
      val t = s.substring(i, j); i = j + 1; t
    }
    while (i < s.length) {
      s(i) match {
        case c if c.isWhitespace => i += 1
        case '(' => out += LP; i += 1
        case ')' => out += RP; i += 1
        case '"' => i += 1; out += Clause(None, readQuoted(), quoted = true)
        case _ =>
          val start = i
          while (i < s.length && !s(i).isWhitespace &&
            s(i) != '(' && s(i) != ')' && s(i) != ':' && s(i) != '"') i += 1
          val word = s.substring(start, i)
          if (i < s.length && s(i) == ':') {
            i += 1 // field prefix
            if (word.isEmpty) err("empty field name before ':'")
            if (i < s.length && s(i) == '"') {
              i += 1; out += Clause(Some(word), readQuoted(), quoted = true)
            } else {
              val ts = i
              while (i < s.length && !s(i).isWhitespace &&
                s(i) != '(' && s(i) != ')' && s(i) != '"') i += 1
              val t = s.substring(ts, i)
              if (t.isEmpty) err(s"field '$word:' without a term")
              out += Clause(Some(word), t, quoted = false)
            }
          } else word match {
            case ""    => err(s"unexpected character '${s(start)}'")
            case "AND" => out += AndT
            case "OR"  => out += OrT
            case "NOT" => out += NotT
            case w     => out += Clause(None, w, quoted = false)
          }
      }
    }
    out.toList
  }

  def parse(s: String): Node = {
    var toks = tokenize(s)
    def peek: Option[Tok] = toks.headOption
    def next(): Tok = toks match {
      case h :: t => toks = t; h
      case Nil => err("unexpected end of input")
    }
    def expr(): Node = {
      var n = and()
      while (peek.contains(OrT)) { next(); n = Or(n, and()) }
      n
    }
    def and(): Node = {
      var n = unary()
      while (peek.contains(AndT)) { next(); n = And(n, unary()) }
      // bare adjacency (two clauses with no operator) is ambiguous —
      // reject with the fix instead of guessing Lucene's default-OR
      peek match {
        case Some(_: Clause) | Some(LP) | Some(NotT) =>
          err("missing AND/OR between clauses (no implicit operator)")
        case _ => ()
      }
      n
    }
    def unary(): Node = next() match {
      case NotT => Not(unary())
      case LP =>
        val n = expr()
        if (next() != RP) err("expected ')'")
        n
      case Clause(f, t, quoted) =>
        if (t.isEmpty) err("empty clause")
        if (quoted) Phrase(f, t) else Term(f, t)
      case other => err(s"unexpected $other")
    }
    if (toks.isEmpty) err("empty query")
    val n = expr()
    if (toks.nonEmpty) err(s"trailing input: $toks")
    n
  }
}
