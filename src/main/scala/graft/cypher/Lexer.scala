package graft.cypher

/** Cypher tokenizer.
  *
  * Reference analog: the tokenizer at /root/reference/src/parser.ts
  * (tokenize + keyword tables near the top of the file). Keywords are NOT
  * distinguished here — the parser matches identifier text
  * case-insensitively, as Cypher keywords are reserved only contextually.
  *
  * Multi-char operators lexed as one token: `<=` `>=` `<>` `=~` `..` `+=`.
  * Arrows (`->`, `<-`) are deliberately NOT fused so `a < -1` and
  * `()-[]->()` both lex cleanly; the pattern parser consumes `<` `-` `>`
  * as separate tokens.
  */
object Lexer {

  sealed trait Kind
  case object TIdent extends Kind
  case object TInt extends Kind
  case object TFloat extends Kind
  case object TStr extends Kind
  case object TPunct extends Kind
  case object TEof extends Kind

  final case class Token(kind: Kind, text: String, pos: Int) {
    def is(s: String): Boolean =
      (kind == TPunct && text == s) ||
      (kind == TIdent && text.equalsIgnoreCase(s))
  }

  def lex(s: String): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    var i = 0
    def peekAt(k: Int): Char = if (i + k < s.length) s(i + k) else '\u0000'
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '/' && peekAt(1) == '/') { // line comment
        while (i < s.length && s(i) != '\n') i += 1
      } else if (c == '/' && peekAt(1) == '*') { // block comment
        i += 2
        while (i + 1 < s.length && !(s(i) == '*' && s(i + 1) == '/')) i += 1
        i = math.min(i + 2, s.length)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
        out += Token(TIdent, s.substring(start, i), start)
      } else if (c == '`') { // escaped identifier
        val start = i
        i += 1
        val sb = new StringBuilder
        while (i < s.length && s(i) != '`') { sb.append(s(i)); i += 1 }
        if (i >= s.length) throw new IllegalArgumentException(
          s"Unterminated backtick identifier at $start in: $s")
        i += 1
        out += Token(TIdent, sb.toString, start)
      } else if (c == '.' && peekAt(1).isDigit) {
        // leading-dot float literal (".5"); never fires inside "1..3"
        // because the int branch below leaves i on the FIRST dot, whose
        // next char is '.', not a digit
        val start = i
        i += 1
        while (i < s.length && s(i).isDigit) i += 1
        if (i < s.length && (s(i) == 'e' || s(i) == 'E') &&
            (peekAt(1).isDigit || ((peekAt(1) == '+' || peekAt(1) == '-') && peekAt(2).isDigit))) {
          i += 1
          if (s(i) == '+' || s(i) == '-') i += 1
          while (i < s.length && s(i).isDigit) i += 1
        }
        out += Token(TFloat, "0" + s.substring(start, i), start)
      } else if (c == '0' && (peekAt(1) == 'x' || peekAt(1) == 'X')) {
        // hex integer literal (reference analog: parser.ts hex branch near
        // line 768); normalized to decimal text so the parser stays simple
        val start = i
        i += 2
        val hs = i
        while (i < s.length && (s(i).isDigit ||
            ('a' <= s(i).toLower && s(i).toLower <= 'f'))) i += 1
        if (i == hs) throw new IllegalArgumentException(
          s"Invalid hexadecimal integer at $start in: $s")
        out += Token(TInt, java.lang.Long.parseLong(s.substring(hs, i), 16).toString, start)
      } else if (c.isDigit) {
        val start = i
        while (i < s.length && s(i).isDigit) i += 1
        // a '.' only continues the number if followed by a digit ("1..3"
        // must lex as INT '..' INT)
        if (i < s.length && s(i) == '.' && i + 1 < s.length && s(i + 1).isDigit) {
          i += 1
          while (i < s.length && s(i).isDigit) i += 1
          if (i < s.length && (s(i) == 'e' || s(i) == 'E')) {
            i += 1
            if (i < s.length && (s(i) == '+' || s(i) == '-')) i += 1
            while (i < s.length && s(i).isDigit) i += 1
          }
          out += Token(TFloat, s.substring(start, i), start)
        } else if (i < s.length && (s(i) == 'e' || s(i) == 'E') &&
            (peekAt(1).isDigit || ((peekAt(1) == '+' || peekAt(1) == '-') && peekAt(2).isDigit))) {
          i += 1
          if (s(i) == '+' || s(i) == '-') i += 1
          while (i < s.length && s(i).isDigit) i += 1
          out += Token(TFloat, s.substring(start, i), start)
        } else out += Token(TInt, s.substring(start, i), start)
      } else if (c == '\'' || c == '"') {
        val start = i
        val quote = c
        i += 1
        val sb = new StringBuilder
        while (i < s.length && s(i) != quote) {
          if (s(i) == '\\' && i + 1 < s.length) {
            i += 1
            sb.append(s(i) match {
              case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
              case 'b' => '\b'; case 'f' => '\f'
              case 'u' if i + 4 < s.length =>
                val h = s.substring(i + 1, i + 5); i += 4
                Integer.parseInt(h, 16).toChar
              case other => other
            })
          } else sb.append(s(i))
          i += 1
        }
        if (i >= s.length) throw new IllegalArgumentException(
          s"Unterminated string at $start in: $s")
        i += 1
        out += Token(TStr, sb.toString, start)
      } else {
        val two = if (i + 1 < s.length) s.substring(i, i + 2) else ""
        two match {
          case "<=" | ">=" | "<>" | "=~" | ".." | "+=" | "!=" =>
            out += Token(TPunct, two, i); i += 2
          case _ =>
            out += Token(TPunct, c.toString, i); i += 1
        }
      }
    }
    out += Token(TEof, "", s.length)
    out.result()
  }
}
