package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** French Snowball stemming — the second language of the FTS config
  * registry (reference ships ~30 stemmers under
  * `src/backend/snowball/libstemmer/`, French at
  * `stem_UTF_8_french.c`, stopwords at `snowball/stopwords/
  * french.stop`; this implementation is written from the PUBLISHED
  * Snowball French algorithm description — prelude vowel marking,
  * RV/R1/R2 regions, standard-suffix step 1, verb-suffix steps 2a/2b,
  * residual step 4, undoubling, un-accenting — not from the generated C).
  *
  * Same deployment shape as [[PorterStem]]: a codegen'd expression, used
  * census-first (stem the Heaps-law vocabulary, broadcast the dictionary
  * back) — f17 demonstrates the registry resolving stemmer + stopwords
  * from a config VALUE, the proof that language configs are data, not
  * code.
  */
case class FrenchStemExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "french_stem"

  override protected def nullSafeEval(w: Any): Any =
    UTF8String.fromString(FrenchStem.stem(w.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, w =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.FrenchStem.stem($w.toString()))")

  override protected def withNewChildInternal(newChild: Expression): FrenchStemExpr =
    copy(child = newChild)
}

object FrenchStem {

  private val Vowels = "aeiouyâàëéêèïîôûù"
  private def isVowel(c: Char): Boolean = Vowels.indexOf(c) >= 0

  /** Snowball French, from the published algorithm description. */
  def stem(word: String): String = {
    var w = word.toLowerCase
    if (w.length <= 2) return w

    // ---- prelude: mark u/i between vowels, y next to a vowel, u after q
    // as consonants (upper case), so region/vowel logic skips them
    {
      val a = w.toCharArray
      val n = a.length
      var i = 0
      while (i < n) {
        val c = a(i)
        val prevV = i > 0 && isVowel(w.charAt(i - 1))
        val nextV = i < n - 1 && isVowel(w.charAt(i + 1))
        if ((c == 'u' || c == 'i') && prevV && nextV) a(i) = c.toUpper
        else if (c == 'y' && (prevV || nextV)) a(i) = 'Y'
        else if (c == 'u' && i > 0 && w.charAt(i - 1) == 'q') a(i) = 'U'
        i += 1
      }
      w = new String(a)
    }

    // ---- regions (fixed for the whole run; we only shorten the tail)
    val n0 = w.length
    val rv: Int = {
      if (n0 >= 3 && (w.startsWith("par") || w.startsWith("col") || w.startsWith("tap"))) 3
      else if (n0 >= 2 && isVowel(w.charAt(0)) && isVowel(w.charAt(1))) math.min(3, n0)
      else {
        // after the first vowel not at the start
        var i = 1
        while (i < n0 && !isVowel(w.charAt(i))) i += 1
        if (i < n0) i + 1 else n0
      }
    }
    def regionAfter(from: Int): Int = {
      var i = from
      while (i < n0 && !isVowel(w.charAt(i))) i += 1 // to first vowel
      while (i < n0 && isVowel(w.charAt(i))) i += 1  // to first non-vowel after it
      if (i < n0) i + 1 else n0
    }
    val r1 = regionAfter(0)
    val r2 = regionAfter(r1)

    def inRV(pos: Int) = pos >= rv
    def inR1(pos: Int) = pos >= r1
    def inR2(pos: Int) = pos >= r2
    def sfx(s: String, suffix: String): Int = { // start index if s ends with suffix, else -1
      val p = s.length - suffix.length
      if (p >= 0 && s.regionMatches(p, suffix, 0, suffix.length)) p else -1
    }

    var altered = false      // did the LAST obeyed step of {1, 2a, 2b} change w
    var mentFound = false    // step-1 matched amment/emment/ment/ments

    // ---- step 1: standard suffix removal (longest match)
    val before1 = w
    run1()
    def run1(): Unit = {
      def longest(cands: String*): Option[String] =
        cands.filter(c => sfx(w, c) >= 0).sortBy(-_.length).headOption
      // one global longest-match across all groups
      val all = Seq(
        "issements", "issement", "atrices", "amment", "emment", "ations",
        "ateurs", "logies", "usions", "utions", "ements", "euses", "ances",
        "iqUes", "ismes", "ables", "istes", "ement", "atrice", "ateur",
        "ation", "logie", "usion", "ution", "ences", "ments", "ités",
        "ives", "eaux", "euse", "ance", "iqUe", "isme", "able", "iste",
        "ence", "ment", "eux", "ité", "ive", "ifs", "aux", "if")
      val m = all.filter(c => sfx(w, c) >= 0).sortBy(-_.length).headOption.getOrElse(return)
      val p = sfx(w, m)
      m match {
        case "ance" | "iqUe" | "isme" | "able" | "iste" | "eux" |
             "ances" | "iqUes" | "ismes" | "ables" | "istes" =>
          if (inR2(p)) w = w.substring(0, p)
        case "atrice" | "ateur" | "ation" | "atrices" | "ateurs" | "ations" =>
          if (inR2(p)) {
            w = w.substring(0, p)
            val ic = sfx(w, "ic")
            if (ic >= 0) {
              if (inR2(ic)) w = w.substring(0, ic)
              else w = w.substring(0, ic) + "iqU"
            }
          }
        case "logie" | "logies" =>
          if (inR2(p)) w = w.substring(0, p) + "log"
        case "usion" | "ution" | "usions" | "utions" =>
          if (inR2(p)) w = w.substring(0, p) + "u"
        case "ence" | "ences" =>
          if (inR2(p)) w = w.substring(0, p) + "ent"
        case "ement" | "ements" =>
          if (inRV(p)) {
            w = w.substring(0, p)
            val iv = sfx(w, "iv")
            val eus = sfx(w, "eus")
            val abl = sfx(w, "abl"); val iqU = sfx(w, "iqU")
            val ier = sfx(w, "ièr"); val Ier = sfx(w, "Ièr")
            if (iv >= 0 && inR2(iv)) {
              w = w.substring(0, iv)
              val at = sfx(w, "at")
              if (at >= 0 && inR2(at)) w = w.substring(0, at)
            } else if (eus >= 0) {
              if (inR2(eus)) w = w.substring(0, eus)
              else if (inR1(eus)) w = w.substring(0, eus) + "eux"
            } else if (abl >= 0 && inR2(abl)) w = w.substring(0, abl)
            else if (iqU >= 0 && inR2(iqU)) w = w.substring(0, iqU)
            else if (ier >= 0 && inRV(ier)) w = w.substring(0, ier) + "i"
            else if (Ier >= 0 && inRV(Ier)) w = w.substring(0, Ier) + "i"
          }
        case "ité" | "ités" =>
          if (inR2(p)) {
            w = w.substring(0, p)
            val abil = sfx(w, "abil"); val ic = sfx(w, "ic"); val iv = sfx(w, "iv")
            if (abil >= 0) {
              if (inR2(abil)) w = w.substring(0, abil)
              else w = w.substring(0, abil) + "abl"
            } else if (ic >= 0) {
              if (inR2(ic)) w = w.substring(0, ic)
              else w = w.substring(0, ic) + "iqU"
            } else if (iv >= 0 && inR2(iv)) w = w.substring(0, iv)
          }
        case "if" | "ive" | "ifs" | "ives" =>
          if (inR2(p)) {
            w = w.substring(0, p)
            val at = sfx(w, "at")
            if (at >= 0 && inR2(at)) {
              w = w.substring(0, at)
              val ic = sfx(w, "ic")
              if (ic >= 0) {
                if (inR2(ic)) w = w.substring(0, ic)
                else w = w.substring(0, ic) + "iqU"
              }
            }
          }
        case "eaux" => w = w.substring(0, p) + "eau"
        case "aux" => if (inR1(p)) w = w.substring(0, p) + "al"
        case "euse" | "euses" =>
          if (inR2(p)) w = w.substring(0, p)
          else if (inR1(p)) w = w.substring(0, p) + "eux"
        case "issement" | "issements" =>
          if (inR1(p) && p > 0 && !isVowel(w.charAt(p - 1)))
            w = w.substring(0, p)
        case "amment" =>
          mentFound = true
          if (inRV(p)) w = w.substring(0, p) + "ant"
        case "emment" =>
          mentFound = true
          if (inRV(p)) w = w.substring(0, p) + "ent"
        case "ment" | "ments" =>
          mentFound = true
          if (p > 0 && isVowel(w.charAt(p - 1)) && inRV(p - 1))
            w = w.substring(0, p)
        case _ =>
      }
    }
    val changed1 = w != before1
    altered = changed1

    // ---- step 2a: verb suffixes beginning i (if step 1 removed nothing,
    // or found a ment-family suffix)
    var did2a = false
    var changed2a = false
    if (!changed1 || mentFound) {
      did2a = true
      val sufs = Seq(
        "issaIent", "issantes", "issants", "issante", "issions", "issants",
        "issant", "issent", "issons", "issiez", "issais", "issait", "isses",
        "issez", "isse", "iraIent", "irions", "iraient", "irais", "irait",
        "irent", "irez", "iriez", "irons", "iront", "irai", "iras", "ira",
        "îtes", "îmes", "ies", "ir", "is", "it", "ie", "ît", "i")
      val m = sufs.filter(c => sfx(w, c) >= 0).sortBy(-_.length).headOption
      m.foreach { c =>
        val p = sfx(w, c)
        if (inRV(p) && p > 0 && !isVowel(w.charAt(p - 1)) && inRV(p - 1)) {
          w = w.substring(0, p); changed2a = true
        }
      }
      altered = changed2a
    }

    // ---- step 2b: other verb suffixes (if 2a ran but removed nothing)
    if (did2a && !changed2a) {
      val before = w
      val g1 = Seq("ions")
      val g2 = Seq("eraIent", "erions", "erais", "erait", "eriez", "erons",
        "eront", "èrent", "erai", "eras", "erez", "ées", "era", "iez", "ez",
        "és", "ée", "er", "é")
      val g3 = Seq("assions", "assiez", "assent", "asses", "antes", "aIent",
        "asse", "ante", "ants", "âtes", "âmes", "ais", "ait", "ant", "as",
        "ai", "ât", "a")
      val all = (g1 ++ g2 ++ g3).filter(c => sfx(w, c) >= 0).sortBy(-_.length)
      all.headOption.foreach { c =>
        val p = sfx(w, c)
        if (g1.contains(c)) {
          if (inRV(p) && inR2(p)) w = w.substring(0, p)
        } else if (g2.contains(c)) {
          if (inRV(p)) w = w.substring(0, p)
        } else {
          if (inRV(p)) {
            w = w.substring(0, p)
            val e = sfx(w, "e")
            if (e >= 0 && inRV(e)) w = w.substring(0, e)
          }
        }
      }
      altered = w != before
    }

    if (altered) {
      // ---- step 3: tidy the markers the suffix logic exposed
      if (w.nonEmpty && w.last == 'Y') w = w.substring(0, w.length - 1) + "i"
      else if (w.nonEmpty && w.last == 'ç') w = w.substring(0, w.length - 1) + "c"
    } else {
      // ---- step 4: residual suffixes
      if (w.nonEmpty && w.last == 's' && w.length > 1 &&
          "aiouès".indexOf(w.charAt(w.length - 2)) < 0)
        w = w.substring(0, w.length - 1)
      val ion = sfx(w, "ion")
      val candidates = Seq("Ière", "ière", "Ier", "ier").filter(c => sfx(w, c) >= 0)
      if (ion >= 0 && inR2(ion) && ion > 0 &&
          (w.charAt(ion - 1) == 's' || w.charAt(ion - 1) == 't') && inRV(ion))
        w = w.substring(0, ion)
      else if (candidates.nonEmpty) {
        val c = candidates.maxBy(_.length)
        val p = sfx(w, c)
        if (inRV(p)) w = w.substring(0, p) + "i"
      } else if (w.nonEmpty && w.last == 'e' && inRV(w.length - 1))
        w = w.substring(0, w.length - 1)
      else if (w.endsWith("guë") && inRV(w.length - 1))
        w = w.substring(0, w.length - 1)
    }

    // ---- step 5: undouble
    if (w.endsWith("enn") || w.endsWith("onn") || w.endsWith("ett") ||
        w.endsWith("ell") || w.endsWith("eill"))
      w = w.substring(0, w.length - 1)

    // ---- step 6: un-accent — é/è followed only by non-vowels at the end
    {
      var i = w.length - 1
      var sawNonVowel = false
      while (i >= 0 && !isVowel(w.charAt(i)) && w.charAt(i) != 'é' && w.charAt(i) != 'è') {
        sawNonVowel = true; i -= 1
      }
      if (sawNonVowel && i >= 0 && (w.charAt(i) == 'é' || w.charAt(i) == 'è'))
        w = w.substring(0, i) + "e" + w.substring(i + 1)
    }

    // ---- postlude: markers back to lower case
    w.map {
      case 'I' => 'i'
      case 'U' => 'u'
      case 'Y' => 'y'
      case c => c
    }
  }
}
