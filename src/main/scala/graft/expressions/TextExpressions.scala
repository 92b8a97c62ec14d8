package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a codegen'd expression (NEW — no reference
  * counterpart, and Spark 4.1 ships no normalization function at all).
  * Training-data hygiene needs it BEFORE any hash-based dedup: the
  * composed (U+00E9) and decomposed (`e` + U+0301) spellings of the same
  * text are byte-different, so exact dedup, MinHash shingles, and BPE
  * word tables all treat them as distinct documents/tokens unless the
  * corpus is normalized first.
  *
  * `form` is one of NFC/NFD/NFKC/NFKD (`java.text.Normalizer`, whose
  * normalization tables are the JDK's ICU data — NFC agrees with
  * DuckDB's `nfc_normalize`, which the llm_normalize oracle pins).
  * Already-normalized strings (the overwhelmingly common case — ASCII is
  * always normalized) return the INPUT UTF8String: `isNormalized` is a
  * cheap scan and skips the String round trip entirely.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(UnicodeNormalize.Forms.contains(form),
    s"form must be one of ${UnicodeNormalize.Forms.mkString("/")}, got: $form")

  @transient private lazy val f = Normalizer.Form.valueOf(form)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string column, got $other")
  }

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unicodeNormalize", this,
      classOf[UnicodeNormalize].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
  override def prettyName: String = s"graft_normalize_${form.toLowerCase}"
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")
}
