package graft.functions

/** SQL `SIMILAR TO` pattern → POSIX regex translation — what PG's
  * `similar_to_escape` (`src/backend/utils/adt/regexp.c`) does before
  * handing the pattern to its regex engine. The SQL-regex dialect:
  * `%`/`_` are the LIKE wildcards, `| * + ? {m,n} ( ) [ ]` keep their
  * regex meaning, while `.` `^` `$` are LITERAL characters (unlike
  * POSIX), and `\x` escapes any metacharacter. The translated pattern
  * is anchored both ends, exactly as the standard requires. The query
  * side then runs Spark's codegen'd `RLike` — same compile-then-match
  * split as the reference.
  */
object PgSimilarTo {

  def toRegex(pattern: String): String = {
    // Two subtleties mirrored from the reference's similar_to_escape
    // (regexp.c, incharclass tracking):
    //  1. the body is anchored as ^(?:...)$ — a bare ^...$ would break on
    //     top-level alternation ('a|b' must match exactly 'a' or 'b', not
    //     'abc'/'xb');
    //  2. bracket-expression contents pass through VERBATIM — '%', '_',
    //     '^', '.' are ordinary class members there ('[%_]' stays '[%_]',
    //     '[^abc]' keeps its negation).
    val sb = new StringBuilder
    var i = 0
    var inClass = false
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (inClass) c match {
        case '\\' if i + 1 < pattern.length =>
          // escape inside a class: emit the next char literally (backslash
          // prefix only where Java regex could misread a bare punct char)
          val e = pattern.charAt(i + 1)
          if (e.isLetterOrDigit) sb.append(e) else sb.append('\\').append(e)
          i += 1
        case ']' => sb.append(c); inClass = false
        case other => sb.append(other)
      } else c match {
        case '%' => sb.append(".*")
        case '_' => sb.append('.')
        case '\\' if i + 1 < pattern.length =>
          sb.append(java.util.regex.Pattern.quote(pattern.charAt(i + 1).toString))
          i += 1
        case '[' => sb.append(c); inClass = true
        case m @ ('.' | '^' | '$') => sb.append('\\').append(m) // literal in SQL regex
        case other => sb.append(other) // | * + ? {} () pass through with regex meaning
      }
      i += 1
    }
    "^(?:" + sb + ")$"
  }
}
