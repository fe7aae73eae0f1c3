package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Czech light stemmer — the published Dolamic & Savoy algorithm
  * ("Indexing and stemming approaches for the Czech language", IP&M
  * 2009), the same algorithm Lucene ships as its CzechStemmer. Czech
  * has no Snowball algorithm (its inflection is fusional with heavy
  * palatalization, which the dictionary-based stemmers model instead),
  * so the light stemmer is the published algorithmic option — it pairs
  * the tailored `cs` collation ([[graft.query.Collation]], the ch
  * digraph letter) with stemmed search (`lucene.czech`, `$text
  * $language cs`). Same shape contract as the Snowball families: a
  * pure static function wrapped by a scalar Catalyst expression whose
  * generated code is ONE static call. The reference delegates analysis
  * to the Atlas server (/root/reference/db/wrapper.go:88-94).
  *
  * Published structure: remove the longest matching CASE ending
  * (guarded by minimum stem lengths), then possessive -ov/-in/-ův,
  * then normalize the exposed stem-final palatalization (čt→ck, št→sk,
  * c/č→k, z/ž→h, the mobile -e-, ů→o). */
object CzechStem {

  private val Letters =
    "aábcčdďeéěfghiíjklmnňoópqrřsštťuúůvwxyýzž".toSet

  private def drop(w: String, n: Int): String =
    w.substring(0, w.length - n)

  /** Longest case ending with the published length guards. */
  private def removeCase(w: String): String = {
    val n = w.length
    if (n > 7 && w.endsWith("atech")) return drop(w, 5)
    if (n > 6 &&
      (w.endsWith("ětem") || w.endsWith("etem") || w.endsWith("atům")))
      return drop(w, 4)
    if (n > 5 && (w.endsWith("ech") || w.endsWith("ich") ||
      w.endsWith("ích") || w.endsWith("ého") || w.endsWith("ěmi") ||
      w.endsWith("emi") || w.endsWith("ému") || w.endsWith("ěte") ||
      w.endsWith("ete") || w.endsWith("ěti") || w.endsWith("eti") ||
      w.endsWith("ího") || w.endsWith("iho") || w.endsWith("ími") ||
      w.endsWith("ímu") || w.endsWith("imu") || w.endsWith("ách") ||
      w.endsWith("ata") || w.endsWith("aty") || w.endsWith("ých") ||
      w.endsWith("ama") || w.endsWith("ami") || w.endsWith("ové") ||
      w.endsWith("ovi") || w.endsWith("ými")))
      return drop(w, 3)
    if (n > 4 && (w.endsWith("em") || w.endsWith("es") ||
      w.endsWith("ém") || w.endsWith("ím") || w.endsWith("ům") ||
      w.endsWith("at") || w.endsWith("ám") || w.endsWith("os") ||
      w.endsWith("us") || w.endsWith("ým") || w.endsWith("mi") ||
      w.endsWith("ou")))
      return drop(w, 2)
    if (n > 3 && "aeiouůyáéíýě".indexOf(w.charAt(n - 1)) >= 0)
      return drop(w, 1)
    w
  }

  private def removePossessives(w: String): String =
    if (w.length > 5 &&
      (w.endsWith("ov") || w.endsWith("in") || w.endsWith("ův")))
      drop(w, 2)
    else w

  private def normalize(w: String): String = {
    val n = w.length
    if (n == 0) return w
    if (w.endsWith("čt")) return drop(w, 2) + "ck"
    if (w.endsWith("št")) return drop(w, 2) + "sk"
    w.charAt(n - 1) match {
      case 'c' | 'č' => return drop(w, 1) + "k"
      case 'z' | 'ž' => return drop(w, 1) + "h"
      case _ => ()
    }
    // mobile e: the -e- exposed before the final consonant drops
    // (matek → matk); exposed ů lowers to o (domů → dom)
    if (n > 1 && w.charAt(n - 2) == 'e') drop(w, 2) + w.charAt(n - 1)
    else if (n > 2 && w.charAt(n - 2) == 'ů')
      drop(w, 2) + "o" + w.charAt(n - 1)
    else w
  }

  /** Stem one lowercase Czech word. Tokens containing anything outside
    * the Czech alphabet pass through unchanged, like the Snowball
    * families' letter gates. */
  def stem(input: String): String = {
    if (input.length <= 2) return input
    var k = 0
    while (k < input.length) {
      if (!Letters(input.charAt(k))) return input
      k += 1
    }
    val w1 = removeCase(input)
    val w2 = removePossessives(w1)
    // the published algorithm normalizes unconditionally after the
    // removal steps (Lucene's CzechStemmer does the same)
    if (w2.nonEmpty) normalize(w2) else w2
  }
}

/** Scalar stem expression — one static call inside whole-stage
  * codegen, the [[RussianStem]] shape. */
case class CzechStemExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"czech_stem expects a string, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      CzechStem.stem(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.CzechStem.stem($c.toString()))")
  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)
}

object CzechStemFunctions {
  def czech_stem(c: Column): Column =
    ColumnBridge.column(CzechStemExpr(ColumnBridge.expression(c)))
}
