package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Russian Snowball stemming — the registry's first NON-LATIN language
  * (reference ships it at `src/backend/snowball/libstemmer/
  * stem_UTF_8_russian.c`, stopwords at `snowball/stopwords/
  * russian.stop`; this implementation is written from the PUBLISHED
  * Snowball Russian algorithm description — ё→е normalization, RV/R2
  * regions, step 1 perfective-gerund / reflexive + adjectival / verb /
  * noun ladders with the group-1 "preceded by а or я" condition,
  * step 2 и-removal, step 3 derivational ость in R2, step 4 tidy
  * (undouble нн, superlative ейш(е), trailing ь) — not from the
  * generated C).
  *
  * Exercises the registry's unicode path: every suffix test is over
  * Cyrillic code points (BMP, so JVM Char arithmetic is exact), and the
  * deployment shape is the same census-first codegen expression as
  * [[PorterStem]]/[[FrenchStem]].
  */
case class RussianStemExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "russian_stem"

  override protected def nullSafeEval(w: Any): Any =
    UTF8String.fromString(RussianStem.stem(w.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, w =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.RussianStem.stem($w.toString()))")

  override protected def withNewChildInternal(newChild: Expression): RussianStemExpr =
    copy(child = newChild)
}

object RussianStem {

  private val Vowels = "аеиоуыэюя"
  private def isVowel(c: Char): Boolean = Vowels.indexOf(c) >= 0

  // Suffix classes, longest-first inside each group. Group-1 endings
  // (the spec's "must be preceded by а or я") carry that condition.
  private val PerfGerund1 = Seq("вшись", "вши", "в")
  private val PerfGerund2 = Seq("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
  private val Reflexive = Seq("ся", "сь")
  private val Adjective = Seq(
    "ими", "ыми", "его", "ого", "ему", "ому",
    "ее", "ие", "ые", "ое", "ей", "ий", "ый", "ой", "ем", "им", "ым",
    "ом", "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею")
  private val Participle1 = Seq("ющ", "нн", "вш", "ем", "щ")
  private val Participle2 = Seq("ивш", "ывш", "ующ")
  private val Verb1 = Seq(
    "ешь", "нно", "ете", "йте",
    "ла", "на", "ли", "ем", "ло", "но", "ет", "ют", "ны", "ть",
    "й", "л", "н")
  private val Verb2 = Seq(
    "ейте", "уйте",
    "ила", "ыла", "ена", "ите", "или", "ыли", "ило", "ыло", "ено",
    "ует", "уют", "ены", "ить", "ыть", "ишь",
    "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ят", "ит", "ыт", "ую",
    "ю")
  private val Noun = Seq(
    "иями", "ями", "ами", "ией", "иям", "ием", "иях",
    "ев", "ов", "ие", "ье", "еи", "ии", "ей", "ой", "ий", "ям", "ем",
    "ам", "ом", "ах", "ях", "ию", "ью", "ия", "ья",
    "а", "е", "и", "й", "о", "у", "ы", "ь", "ю", "я")
  private val Superlative = Seq("ейше", "ейш")

  /** Longest suffix of `w` from g1 ∪ g2 lying entirely in RV, with
    * Snowball `among` semantics (r11 advice): the longest LITERAL wins
    * first, and only then is its condition tested — a group-1 ending
    * (the spec's "must be preceded by а or я") whose condition fails
    * fails the whole ladder rather than falling back to a shorter
    * suffix. (The longest matching literal is unique: two distinct
    * equal-length strings cannot both be suffixes of one word, and the
    * groups are disjoint.) */
  private def longest(w: String, rv: Int,
      g1: Seq[String], g2: Seq[String]): Option[String] = {
    def okLen(s: String): Boolean = w.endsWith(s) && w.length - s.length >= rv
    val best = (g1.filter(okLen).map(s => (s, true)) ++
                g2.filter(okLen).map(s => (s, false)))
      .sortBy(-_._1.length).headOption
    best match {
      case Some((s, true)) =>
        val i = w.length - s.length - 1
        if (i >= rv && (w.charAt(i) == 'а' || w.charAt(i) == 'я')) Some(s)
        else None
      case Some((s, false)) => Some(s)
      case None => None
    }
  }

  /** Snowball Russian, from the published algorithm description. */
  def stem(word: String): String = {
    var w = word.toLowerCase.replace('ё', 'е')
    if (w.length <= 1) return w

    // ---- regions (fixed; only the tail is ever shortened)
    val n0 = w.length
    val rv: Int = {
      var i = 0
      while (i < n0 && !isVowel(w.charAt(i))) i += 1
      if (i < n0) i + 1 else n0
    }
    def regionAfter(from: Int): Int = {
      var i = from
      while (i < n0 && !isVowel(w.charAt(i))) i += 1 // reach a vowel
      while (i < n0 && isVowel(w.charAt(i))) i += 1 // span the vowels
      if (i < n0) i + 1 else n0
    }
    val r1 = regionAfter(0)
    val r2 = regionAfter(r1)

    // ---- step 1: perfective gerund, else [reflexive] then
    // adjectival / verb / noun — first ladder that strips wins
    longest(w, rv, PerfGerund1, PerfGerund2) match {
      case Some(s) => w = w.dropRight(s.length)
      case None =>
        longest(w, rv, Nil, Reflexive).foreach(s => w = w.dropRight(s.length))
        longest(w, rv, Nil, Adjective) match {
          case Some(adj) =>
            w = w.dropRight(adj.length)
            // adjectival = adjective optionally preceded by a participle
            longest(w, rv, Participle1, Participle2)
              .foreach(p => w = w.dropRight(p.length))
          case None =>
            longest(w, rv, Verb1, Verb2) match {
              case Some(v) => w = w.dropRight(v.length)
              case None =>
                longest(w, rv, Nil, Noun).foreach(s => w = w.dropRight(s.length))
            }
        }
    }

    // ---- step 2: remove a trailing и
    if (w.endsWith("и") && w.length - 1 >= rv) w = w.dropRight(1)

    // ---- step 3: derivational ость / ост in R2
    Seq("ость", "ост").find(s => w.endsWith(s) && w.length - s.length >= r2)
      .foreach(s => w = w.dropRight(s.length))

    // ---- step 4: tidy — undouble нн | superlative (then undouble) | ь
    // (each matched suffix must lie entirely in RV)
    if (w.endsWith("нн") && w.length - 2 >= rv) w = w.dropRight(1)
    else {
      Superlative.find(s => w.endsWith(s) && w.length - s.length >= rv) match {
        case Some(s) =>
          w = w.dropRight(s.length)
          if (w.endsWith("нн") && w.length - 2 >= rv) w = w.dropRight(1)
        case None =>
          if (w.endsWith("ь") && w.length - 1 >= rv) w = w.dropRight(1)
      }
    }
    w
  }
}
