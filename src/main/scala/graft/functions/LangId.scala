package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DataTypes, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Stopword-marker language identification as a native codegen'd
  * expression — the crawl-pipeline lang-ID heuristic (marker hit-count
  * argmax; the stopword method of Grefenstette 1995, marker sets drawn
  * from public stopword lists, ASCII romanizations for non-Latin
  * scripts matching the testdata's romanized corpus).
  *
  * Plan shape: the declarative form (one `size(filter(tokens, in
  * markers))` per language) costs O(languages · tokens) per row — linear
  * growth that bites as the table widens toward the ~100 languages a
  * production crawl wants. This expression is ONE pass over the tokens:
  * each token does a single O(1) hash probe into a static token →
  * language-indices table (built once per JVM), incrementing a per-
  * language count array, then one argmax. Cost is O(tokens + languages)
  * per row whatever the language count, fully inside whole-stage codegen
  * (static-helper call, no boxing, no UDF).
  *
  * Semantics are pinned to the declarative form it replaces so the
  * GENERATED DuckDB oracle (SparkEntry builds the SQL from [[Markers]])
  * stays bit-compatible: tokens are the `split(text, " +")` pieces
  * (runs of spaces delimit; other whitespace rides inside tokens and
  * simply never matches a marker), score = number of token occurrences
  * in the language's marker set, prediction = struct-max over
  * (score, lang) — highest score, ties to the lexicographically
  * GREATEST language code.
  */
object LangId {

  /** Per-language marker sets — the single source of truth for BOTH
    * engines (the text_langid oracle SQL is generated from this map, so
    * widening the table can never desynchronize them). High-frequency
    * function words from public stopword lists; pinyin with tone digits
    * for zh, romaji particles for ja, standard transliteration for
    * ru/uk/ar/fa/he/el/hi/ur/bn/ko/th, diacritics stripped for vi.
    * Overlapping markers across sibling languages (da/no, id/ms,
    * hr/sr/bs, hi/ur, kk/ky) are fine: scoring counts every occurrence
    * and the tie-break is deterministic on both engines. 113 languages —
    * production-crawl breadth; the single-pass expression's cost is
    * measured independent of the table width, so widening further is
    * purely additive.
    */
  val Markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"),
    "it" -> Seq("il", "di", "che", "non", "per"),
    "pt" -> Seq("o", "os", "uma", "que", "em"),
    "nl" -> Seq("het", "een", "van", "niet", "zijn"),
    "sv" -> Seq("och", "att", "som", "jag", "inte"),
    "da" -> Seq("og", "jeg", "det", "at", "ikke"),
    "no" -> Seq("og", "det", "som", "ikke", "jeg"),
    "fi" -> Seq("ja", "on", "ei", "se", "hän"),
    "pl" -> Seq("nie", "to", "się", "jest", "na"),
    "cs" -> Seq("se", "na", "je", "že", "to"),
    "ru" -> Seq("i", "v", "ne", "na", "chto"),
    "ja" -> Seq("wa", "no", "ni", "wo", "ga"),
    "ko" -> Seq("eun", "neun", "ga", "ui", "e"),
    "ar" -> Seq("al", "fi", "min", "ala", "an"),
    "hi" -> Seq("hai", "ka", "ki", "ke", "mein"),
    "tr" -> Seq("ve", "bir", "bu", "icin", "ne"),
    "id" -> Seq("yang", "dan", "di", "ini", "itu"),
    "vi" -> Seq("la", "va", "cua", "co", "mot"),
    "ro" -> Seq("și", "de", "la", "cu", "nu"),
    "hu" -> Seq("és", "az", "nem", "hogy", "egy"),
    "ca" -> Seq("els", "amb", "per", "una", "més"),
    "gl" -> Seq("unha", "como", "máis", "pero", "cando"),
    "eu" -> Seq("eta", "da", "ez", "bat", "du"),
    "hr" -> Seq("je", "i", "u", "se", "da"),
    "sr" -> Seq("je", "i", "u", "da", "na"),
    "bs" -> Seq("je", "i", "u", "da", "se"),
    "sk" -> Seq("sa", "je", "na", "že", "som"),
    "sl" -> Seq("je", "in", "na", "se", "da"),
    "lt" -> Seq("ir", "yra", "kad", "su", "tai"),
    "lv" -> Seq("ir", "un", "ka", "par", "ar"),
    "et" -> Seq("ja", "on", "ei", "et", "oli"),
    "ms" -> Seq("yang", "dan", "di", "untuk", "dengan"),
    "tl" -> Seq("ang", "ng", "sa", "mga", "ay"),
    "sw" -> Seq("ya", "na", "wa", "kwa", "ni"),
    "af" -> Seq("die", "en", "het", "nie", "van"),
    "is" -> Seq("og", "að", "er", "ekki", "við"),
    "sq" -> Seq("dhe", "në", "të", "një", "për"),
    "mt" -> Seq("li", "ta", "il", "ma", "hija"),
    "cy" -> Seq("yn", "y", "i", "ar", "bod"),
    "uk" -> Seq("i", "v", "ne", "shcho", "na"),
    "fa" -> Seq("va", "be", "az", "ke", "in"),
    "he" -> Seq("shel", "et", "al", "hu", "lo"),
    "el" -> Seq("kai", "to", "na", "einai", "den"),
    "bn" -> Seq("ami", "ei", "na", "kore", "theke"),
    "th" -> Seq("thi", "mai", "khong", "pen", "laeo"),
    "ur" -> Seq("ke", "ki", "hai", "aur", "se"),
    "bg" -> Seq("na", "da", "ne", "se", "az"),
    "mk" -> Seq("na", "i", "vo", "se", "ne"),
    "be" -> Seq("i", "u", "na", "ne", "shto"),
    "kk" -> Seq("zhane", "men", "bolyp", "bar", "emes"),
    "az" -> Seq("ve", "bir", "bu", "ki", "de"),
    "uz" -> Seq("va", "bu", "bilan", "uchun", "ham"),
    "hy" -> Seq("yev", "e", "en", "vor", "mej"),
    "ka" -> Seq("da", "aris", "rom", "ar", "es"),
    "am" -> Seq("ena", "new", "yihe", "lay", "gin"),
    "ne" -> Seq("ra", "ma", "cha", "yo", "le"),
    "pa" -> Seq("de", "vich", "ate", "hai", "nu"),
    "gu" -> Seq("ane", "che", "ma", "te", "chhe"),
    "ta" -> Seq("oru", "indha", "adhu", "enru", "um"),
    "te" -> Seq("oka", "idi", "mariyu", "ani", "lo"),
    "kn" -> Seq("ondu", "mattu", "idu", "alli", "endu"),
    "ml" -> Seq("oru", "aanu", "athu", "enn", "um"),
    "mr" -> Seq("ani", "ahe", "tya", "he", "la"),
    "si" -> Seq("saha", "ek", "eya", "me", "ha"),
    "my" -> Seq("de", "ko", "hma", "nay", "twe"),
    "km" -> Seq("nov", "nung", "knong", "dael", "chea"),
    "lo" -> Seq("lae", "khong", "nai", "pen", "mi"),
    "mn" -> Seq("bolon", "ni", "baina", "yum", "gej"),
    "yi" -> Seq("un", "di", "dos", "iz", "fun"),
    "ga" -> Seq("agus", "an", "ar", "is", "go"),
    "gd" -> Seq("agus", "an", "air", "tha", "gu"),
    "br" -> Seq("hag", "an", "ar", "eo", "da"),
    "lb" -> Seq("an", "de", "den", "ass", "net"),
    "fo" -> Seq("og", "at", "er", "ikki", "eg"),
    "fy" -> Seq("de", "en", "it", "fan", "net"),
    "oc" -> Seq("e", "de", "la", "que", "es"),
    "la" -> Seq("et", "in", "est", "non", "cum"),
    "eo" -> Seq("la", "kaj", "de", "en", "estas"),
    "jv" -> Seq("lan", "ing", "iku", "sing", "ora"),
    "su" -> Seq("jeung", "di", "ka", "teu", "anu"),
    "ceb" -> Seq("ug", "sa", "nga", "mga", "ang"),
    "mi" -> Seq("te", "nga", "ki", "me", "kei"),
    "mg" -> Seq("ny", "sy", "dia", "amin", "izay"),
    "ha" -> Seq("da", "ya", "ba", "ne", "wannan"),
    "yo" -> Seq("ati", "ni", "si", "ti", "ko"),
    "ig" -> Seq("na", "nke", "di", "ya", "bu"),
    "zu" -> Seq("futhi", "nga", "ukuthi", "kodwa", "lapho"),
    "xh" -> Seq("kwaye", "nge", "ukuba", "kodwa", "apho"),
    "st" -> Seq("le", "ka", "ha", "hore", "empa"),
    "sn" -> Seq("uye", "kuti", "ne", "zvino", "asi"),
    "ny" -> Seq("ndi", "kuti", "ndipo", "koma", "chifukwa"),
    "rw" -> Seq("na", "ku", "mu", "ko", "ariko"),
    "so" -> Seq("iyo", "waa", "ku", "in", "ma"),
    "om" -> Seq("fi", "kan", "keessa", "dha", "akka"),
    "ht" -> Seq("nan", "ak", "se", "pou", "yo"),
    "ku" -> Seq("u", "ji", "bi", "ku", "ew"),
    "ps" -> Seq("aw", "da", "pa", "che", "day"),
    "sd" -> Seq("ain", "ja", "me", "san", "hik"),
    "tg" -> Seq("va", "dar", "ba", "ki", "ast"),
    "ky" -> Seq("jana", "bul", "menen", "bar", "emes"),
    "tk" -> Seq("we", "bu", "bilen", "uchin", "bar"),
    "tt" -> Seq("ham", "bu", "belen", "ochen", "bar"),
    "as" -> Seq("aru", "ei", "moi", "hoy", "pora"),
    "or" -> Seq("ebam", "ei", "mu", "heba", "pare"),
    "ug" -> Seq("we", "bu", "bilen", "uchun", "bolsa"),
    "bo" -> Seq("dang", "ni", "la", "yin", "red"),
    "sm" -> Seq("le", "o", "i", "ma", "lea"),
    "to" -> Seq("ko", "e", "i", "mo", "oe"),
    "haw" -> Seq("ka", "o", "i", "ma", "na"))

  /** Language codes in ascending order — the argmax iteration order. */
  private val langs: Array[String] = Markers.keys.toArray.sorted

  /** token → indices (into [[langs]]) of every language claiming it. */
  private val table: java.util.HashMap[String, Array[Int]] = {
    val tmp = scala.collection.mutable.HashMap.empty[String, List[Int]]
    langs.zipWithIndex.foreach { case (lang, i) =>
      Markers(lang).foreach(mk =>
        tmp.updateWith(mk)(o => Some(i :: o.getOrElse(Nil))))
    }
    val m = new java.util.HashMap[String, Array[Int]](tmp.size * 2)
    tmp.foreach { case (k, v) => m.put(k, v.reverse.toArray) }
    m
  }

  /** Static entry point shared by interpreted eval and generated code.
    * One pass over the space-delimited tokens; ascending-lang argmax
    * with `>=` replacement = struct-max's (score, lang) ordering.
    */
  def predict(text: UTF8String): UTF8String = {
    val s = text.toString
    val counts = new Array[Int](langs.length)
    val n = s.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) {
          val hit = table.get(s.substring(start, i))
          if (hit != null) {
            var j = 0
            while (j < hit.length) { counts(hit(j)) += 1; j += 1 }
          }
        }
        start = i + 1
      }
      i += 1
    }
    var best = counts(0)
    var bi = 0
    var k = 1
    while (k < langs.length) {
      if (counts(k) >= best) { best = counts(k); bi = k }
      k += 1
    }
    UTF8String.fromString(langs(bi))
  }

  /** `graft_lang_id(text)` — predicted language code. */
  case class LangIdExpr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes = Seq(StringType)
    override def dataType: DataType = DataTypes.StringType

    override protected def nullSafeEval(t: Any): Any =
      predict(t.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.LangId.predict($c)")

    override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
      copy(child = newChild)
  }

  def langId(text: Column): Column =
    ColumnBridge.column(LangIdExpr(ColumnBridge.expression(text)))
}
