package graft.graph

/** Cypher MATCH pattern AST + recursive-descent parser.
  *
  * Grammar subset (reference: src/parser.ts NodePattern/EdgePattern,
  * parser.ts:7-34 and the relationship parsing around parser.ts:1940-1975):
  *
  * {{{
  *   pattern  := path (',' path)*
  *   path     := node (rel node)*
  *   node     := '(' [var] [':' label] [props] ')'
  *   rel      := ('-'|'<-') '[' [var] [':' type] ['*' hops] [props] ']' ('-'|'->')
  *   hops     := INT | INT '..' [INT] | '..' INT | (empty = 1..)
  *   props    := '{' key ':' literal (',' key ':' literal)* '}'
  *   literal  := 'str' | "str" | number | true | false | null
  * }}}
  */
object PatternParser {

  sealed trait Dir
  case object Out extends Dir        // -[]->
  case object In extends Dir         // <-[]-
  case object Undirected extends Dir // -[]-

  /** `label` is the PRIMARY label (the frame the node lives in when
    * created); `secondary` are additional labels from a `:A:B:C` chain —
    * the multi-label shim (see [[PropertyGraph.LABELS]]). In MATCH
    * position every listed label must hold (primary OR registered
    * secondary of the candidate frame).
    */
  final case class NodePat(name: String, anonymous: Boolean,
      label: Option[String], props: Seq[(String, Any)],
      secondary: Seq[String] = Seq.empty) {
    /** Every label this pattern requires. */
    def allLabels: Set[String] = label.toSet ++ secondary
  }

  final case class RelPat(name: String, anonymous: Boolean,
      relType: Option[String], props: Seq[(String, Any)], dir: Dir,
      minHops: Int, maxHops: Option[Int], isVarLength: Boolean)

  /** nodes.size == rels.size + 1 */
  final case class PathPat(nodes: Vector[NodePat], rels: Vector[RelPat])

  def parse(input: String): Vector[PathPat] = new P(input).parseAll()

  private final class P(s: String) {
    private var i = 0
    private var anonCount = 0

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"Pattern parse error at ${i}: $msg in: $s")

    private def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    // EOF sentinel is NUL, written escaped so the file stays text
    private def peek: Char = if (i < s.length) s(i) else '\u0000'
    private def eat(c: Char): Unit = { ws(); if (peek == c) i += 1 else fail(s"expected '$c', got '$peek'") }
    private def tryEat(c: Char): Boolean = { ws(); if (peek == c) { i += 1; true } else false }
    private def tryEat2(a: Char, b: Char): Boolean = {
      ws()
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { i += 2; true } else false
    }

    private def ident(): String = {
      ws()
      val start = i
      if (i < s.length && (s(i).isLetter || s(i) == '_')) {
        i += 1
        while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
      }
      if (i == start) fail("expected identifier")
      s.substring(start, i)
    }

    private def tryIdent(): Option[String] = {
      ws()
      if (i < s.length && (s(i).isLetter || s(i) == '_')) Some(ident()) else None
    }

    private def number(): Any = {
      ws()
      val start = i
      if (peek == '-' || peek == '+') i += 1
      while (i < s.length && s(i).isDigit) i += 1
      var isFloat = false
      if (peek == '.' && i + 1 < s.length && s(i + 1).isDigit) {
        isFloat = true; i += 1
        while (i < s.length && s(i).isDigit) i += 1
      }
      val txt = s.substring(start, i)
      if (txt.isEmpty || txt == "-" || txt == "+") fail("expected number")
      if (isFloat) txt.toDouble else txt.toLong
    }

    private def stringLit(quote: Char): String = {
      i += 1 // opening quote
      val sb = new StringBuilder
      while (i < s.length && s(i) != quote) {
        if (s(i) == '\\' && i + 1 < s.length) {
          i += 1
          sb.append(s(i) match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case other => other
          })
        } else sb.append(s(i))
        i += 1
      }
      if (i >= s.length) fail("unterminated string")
      i += 1 // closing quote
      sb.toString
    }

    private def literal(): Any = {
      ws()
      peek match {
        case '\'' | '"' => stringLit(peek)
        case c if c.isDigit || c == '-' || c == '+' => number()
        case _ =>
          val id = ident()
          id.toLowerCase match {
            case "true" => true
            case "false" => false
            case "null" => null
            case _ => fail(s"unexpected literal '$id'")
          }
      }
    }

    private def props(): Seq[(String, Any)] = {
      if (!tryEat('{')) return Seq.empty
      val buf = Vector.newBuilder[(String, Any)]
      ws()
      if (!tryEat('}')) {
        var done = false
        while (!done) {
          val k = ident()
          eat(':')
          buf += (k -> literal())
          if (!tryEat(',')) { eat('}'); done = true }
        }
      }
      buf.result()
    }

    private def fresh(): String = { anonCount += 1; s"__anon$anonCount" }

    private def node(): NodePat = {
      eat('(')
      val name = tryIdent()
      val label = if (tryEat(':')) Some(ident()) else None
      val secondary = Vector.newBuilder[String]
      while (label.isDefined && tryEat(':')) secondary += ident()
      val ps = props()
      eat(')')
      name match {
        case Some(n) => NodePat(n, anonymous = false, label, ps, secondary.result())
        case None => NodePat(fresh(), anonymous = true, label, ps, secondary.result())
      }
    }

    /** Parses `-[...]->`, `<-[...]-`, `-[...]-`, and bare `-->` / `<--` / `--`. */
    private def rel(): RelPat = {
      ws()
      val leftArrow = tryEat2('<', '-') || { eat('-'); false }
      var name: Option[String] = None
      var relType: Option[String] = None
      var ps: Seq[(String, Any)] = Seq.empty
      var minH = 1
      var maxH: Option[Int] = Some(1)
      var isVar = false
      if (tryEat('[')) {
        name = tryIdent()
        // `:A|B` or `:A|:B` — alternation kept as one pipe-joined string,
        // expanded by PropertyGraph.edgeTypesFor
        relType = if (tryEat(':')) {
          val types = Vector.newBuilder[String]
          types += ident()
          while (tryEat('|')) { tryEat(':'); types += ident() }
          Some(types.result().mkString("|"))
        } else None
        if (tryEat('*')) {
          isVar = true
          ws()
          if (peek.isDigit) {
            minH = number().asInstanceOf[Long].toInt
            maxH = Some(minH)
            if (tryEat2('.', '.')) {
              ws()
              maxH = if (peek.isDigit) Some(number().asInstanceOf[Long].toInt) else None
            }
          } else if (tryEat2('.', '.')) {
            minH = 1
            ws()
            maxH = if (peek.isDigit) Some(number().asInstanceOf[Long].toInt) else None
          } else { minH = 1; maxH = None }
        }
        ps = props()
        eat(']')
      }
      eat('-')
      val rightArrow = tryEat('>')
      val dir =
        // `<-->` matches either direction (reference parity: bidirectional
        // patterns in cypherqueries.test.ts)
        if (leftArrow && rightArrow) Undirected
        else if (leftArrow) In
        else if (rightArrow) Out
        else Undirected
      val nm = name.getOrElse(fresh())
      RelPat(nm, name.isEmpty, relType, ps, dir, minH, maxH, isVar)
    }

    private def path(): PathPat = {
      val ns = Vector.newBuilder[NodePat]
      val rs = Vector.newBuilder[RelPat]
      ns += node()
      ws()
      while (i < s.length && (peek == '-' || peek == '<')) {
        rs += rel()
        ns += node()
        ws()
      }
      PathPat(ns.result(), rs.result())
    }

    def parseAll(): Vector[PathPat] = {
      val buf = Vector.newBuilder[PathPat]
      buf += path()
      while (tryEat(',')) buf += path()
      ws()
      if (i < s.length) fail(s"trailing input '${s.substring(i)}'")
      buf.result()
    }
  }
}
