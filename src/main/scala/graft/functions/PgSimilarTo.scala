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
    val sb = new StringBuilder("^")
    var i = 0
    while (i < pattern.length) {
      pattern.charAt(i) match {
        case '%' => sb.append(".*")
        case '_' => sb.append('.')
        case '\\' if i + 1 < pattern.length =>
          sb.append(java.util.regex.Pattern.quote(pattern.charAt(i + 1).toString))
          i += 1
        case c @ ('.' | '^' | '$') => sb.append('\\').append(c) // literal in SQL regex
        case c => sb.append(c) // | * + ? {} () [] pass through with regex meaning
      }
      i += 1
    }
    sb.append("$").toString
  }
}
