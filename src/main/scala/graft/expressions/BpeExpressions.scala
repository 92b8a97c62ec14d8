package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE encoding of a whole text column with a trained merge table
  * (`graft.llm.Bpe.train`): lowercase, split on single spaces (the same
  * tokenization the trainer's word table uses), apply the merges to each
  * word IN RANK ORDER (Sennrich's apply step — the exact operation
  * sequence training ran, so a word seen in training encodes to precisely
  * the symbols the trainer left it with), and concatenate the per-word
  * subword symbols. Null text → null; empty words (doubled spaces) emit
  * nothing.
  *
  * Word lookups hit a bounded per-instance memo: corpora are Zipfian, so
  * the O(numMerges × wordLen) merge application runs once per DISTINCT
  * word per executor, not once per occurrence. The memo is transient
  * (rebuilt per executor after deserialization) and clears itself past
  * [[BpeEncodeText.MemoCap]] entries to bound memory on adversarial
  * vocabularies.
  */
case class BpeEncodeText(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs string text, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val mergeArr: Array[(String, String)] = merges.toArray
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[UTF8String]]()

  /** Greedy-leftmost, non-overlapping application of one merge — the same
    * fold `Bpe.mergePair` runs distributed at train time. */
  private def applyMerge(syms: java.util.ArrayList[String], l: String,
      r: String): Unit = {
    var i = 0
    var w = 0
    while (i < syms.size) {
      if (w > 0 && syms.get(w - 1) == l && syms.get(i) == r) {
        syms.set(w - 1, l + r)
      } else {
        syms.set(w, syms.get(i))
        w += 1
      }
      i += 1
    }
    while (syms.size > w) syms.remove(syms.size - 1)
  }

  private def encodeWord(word: String): Array[UTF8String] = {
    val cached = memo.get(word)
    if (cached != null) return cached
    val syms = new java.util.ArrayList[String](word.length + 1)
    var i = 0
    while (i < word.length) {
      syms.add(String.valueOf(word.charAt(i)))
      i += 1
    }
    syms.add(graft.llm.Bpe.EndOfWord)
    var m = 0
    while (m < mergeArr.length && syms.size > 1) {
      applyMerge(syms, mergeArr(m)._1, mergeArr(m)._2)
      m += 1
    }
    val out = new Array[UTF8String](syms.size)
    var j = 0
    while (j < out.length) { out(j) = UTF8String.fromString(syms.get(j)); j += 1 }
    if (memo.size > BpeEncodeText.MemoCap) memo.clear()
    memo.put(word, out)
    out
  }

  def compute(text: UTF8String): ArrayData = {
    // Locale.ROOT pins the fold to the locale-independent mapping Spark's
    // `lower()` used at train time — under a tr_TR default locale the bare
    // toLowerCase turns I into dotless ı and trained words stop matching
    val words = text.toString.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) {
        val toks = encodeWord(words(i))
        var j = 0
        while (j < toks.length) { out.add(toks(j)); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this,
      classOf[BpeEncodeText].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeText =
    copy(child = newChild)
  override def prettyName: String = "graft_bpe_encode"
}

object BpeEncodeText {
  /** Distinct-word memo bound per expression instance per executor. */
  val MemoCap = 1 << 20
}
