package graft

/** Shared lexer for the standing source audits (window partition
  * bounds, streaming state bounds): blanks line and nested block
  * comments to spaces STRING-AWARELY — '//' inside a string literal
  * (URLs, quoted idioms) must not drop the rest of the line, a false
  * negative in a guard test — while string literals, triple-quoted
  * strings, and char literals pass through intact (audit keys embed
  * the argument text, including its quotes).
  */
object AuditLex {
  def stripComments(raw: String): String = {
    val sb = new StringBuilder(raw.length)
    var i = 0
    val n = raw.length
    var mode = 0 // 0 code, 1 line comment, 2 block, 3 string, 4 triple
    var depth = 0 // scala block comments nest
    def at(j: Int, c: Char) = j < n && raw.charAt(j) == c
    while (i < n) {
      val c = raw.charAt(i)
      mode match {
        case 0 =>
          if (c == '/' && at(i + 1, '/')) { mode = 1; sb ++= "  "; i += 2 }
          else if (c == '/' && at(i + 1, '*')) {
            mode = 2; depth = 1; sb ++= "  "; i += 2
          } else if (c == '"' && at(i + 1, '"') && at(i + 2, '"')) {
            mode = 4; sb ++= "\"\"\""; i += 3
          } else if (c == '"') { mode = 3; sb += '"'; i += 1 }
          else if (c == '\'' && at(i + 1, '\\')) {
            // escaped char literal: copy through its closing quote
            val close = raw.indexOf('\'', i + 2)
            val end = if (close < 0) i + 1 else close + 1
            sb ++= raw.substring(i, end); i = end
          } else if (c == '\'' && at(i + 2, '\'')) {
            sb ++= raw.substring(i, i + 3); i += 3 // plain char literal
          } else { sb += c; i += 1 }
        case 1 =>
          if (c == '\n') { mode = 0; sb += '\n' } else sb += ' '
          i += 1
        case 2 =>
          if (c == '/' && at(i + 1, '*')) { depth += 1; sb ++= "  "; i += 2 }
          else if (c == '*' && at(i + 1, '/')) {
            depth -= 1; sb ++= "  "; i += 2
            if (depth == 0) mode = 0
          } else { sb += (if (c == '\n') '\n' else ' '); i += 1 }
        case 3 =>
          if (c == '\\') { sb ++= raw.substring(i, math.min(i + 2, n)); i += 2 }
          else {
            if (c == '"' || c == '\n') mode = 0 // newline = unterminated
            sb += c; i += 1
          }
        case 4 =>
          if (c == '"' && at(i + 1, '"') && at(i + 2, '"')) {
            mode = 0; sb ++= "\"\"\""; i += 3
          } else { sb += c; i += 1 }
      }
    }
    sb.toString
  }

  /** Multiset difference a − b (the audit diff both standing audits
    * report with). */
  def diffMultiset(a: Seq[String], b: Seq[String]): Seq[String] = {
    val counts = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    b.foreach(k => counts(k) += 1)
    a.filter { k => val c = counts(k); if (c > 0) { counts(k) = c - 1; false } else true }
  }
}
