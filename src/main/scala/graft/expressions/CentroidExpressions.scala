package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared kernel for the nearest-centroid expressions: cosine of a row
  * vector against every centroid, reproducing BIT-EXACTLY the interpreted
  * higher-order-function formula they replace
  * (`Similarity.listSims`: `dot(v,c) / (sqrt(dot(v,v)) * sqrt(dot(c,c)))`,
  * each element cast to double, accumulated left-to-right) — the
  * `llm_ann_ivf` oracle replays that assignment in SQL, so a last-ulp
  * divergence here would flip boundary ties and fail the hash gate.
  *
  * Why these exist: higher-order functions (`transform`/`aggregate`) never
  * participate in codegen — Catalyst evaluates them interpreted, per row,
  * allocating per-lambda frames. For an IVF fit/assignment that is
  * k×dim interpreted multiply-adds on EVERY corpus row, the single most
  * expensive expression in the engine. These expressions run the same
  * arithmetic as a tight JVM loop invoked from generated code (one
  * reference-object call per row, no lambda frames, no boxing).
  *
  * Semantics pinned to the HOF formula:
  *  - selection order is lexicographic on `[cosine, index]` with
  *    `java.lang.Double.compare` (NaN greatest and equal to itself, ties
  *    break to the LARGER index) — exactly `array_max`/`array_sort` over
  *    the `[cos, idx]` pairs;
  *  - `dot(v,v)` is recomputed per centroid in the HOF form but is the
  *    same bits every time, so computing it once is identical;
  *  - null elements count as 0.0 and length mismatches dot over the
  *    common prefix (corrupt-corpus edges; real corpora never hit them);
  *  - ONE deliberate improvement: a zero-norm vector yields NaN cosines
  *    (→ the last centroid, NaN-greatest rule) where the HOF form threw
  *    ANSI DIVIDE_BY_ZERO and killed the whole fit — a degenerate vector
  *    should land in SOME list, not crash a 100 TB job.
  */
private[expressions] trait CentroidKernel {
  def cents: Seq[Seq[Double]]
  def child: Expression

  @transient protected final lazy val centArrays: Array[Array[Double]] =
    cents.map(_.toArray).toArray

  /** sqrt(dot(c,c)) per centroid, same left-to-right accumulation. */
  @transient protected final lazy val centNorms: Array[Double] =
    centArrays.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }

  @transient private final lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  protected final def elem(arr: ArrayData, i: Int): Double =
    if (arr.isNullAt(i)) 0.0
    else if (isFloat) arr.getFloat(i).toDouble
    else arr.getDouble(i)

  /** Cosine of `arr` against every centroid (centroid order). */
  protected final def sims(arr: ArrayData): Array[Double] = {
    val n = arr.numElements()
    var vv = 0.0
    var j = 0
    while (j < n) { val x = elem(arr, j); vv += x * x; j += 1 }
    val sv = math.sqrt(vv)
    val out = new Array[Double](centArrays.length)
    var i = 0
    while (i < centArrays.length) {
      val c = centArrays(i)
      val m = math.min(n, c.length)
      var dot = 0.0
      j = 0
      while (j < m) { dot += elem(arr, j) * c(j); j += 1 }
      out(i) = dot / (sv * centNorms(i))
      i += 1
    }
    out
  }

  /** `(a, ia)` ranks strictly after `(b, ib)` under the [cos, idx]
    * lexicographic order (Double.compare: NaN greatest, NaN == NaN). */
  protected final def after(a: Double, ia: Int, b: Double, ib: Int): Boolean = {
    val c = java.lang.Double.compare(a, b)
    c > 0 || (c == 0 && ia > ib)
  }
}

/** Index of the max-cosine centroid (ties → larger index). Codegen'd
  * replacement for `Similarity.nearestList`'s HOF formula. */
case class NearestCentroid(child: Expression, cents: Seq[Seq[Double]])
    extends UnaryExpression with CentroidKernel {

  require(cents.nonEmpty, "nearest-centroid needs at least one centroid")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType | FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float|double> input, got $other")
  }
  override def dataType: DataType = IntegerType

  def compute(arr: ArrayData): Int = {
    val s = sims(arr)
    var best = 0
    var i = 1
    while (i < s.length) {
      if (after(s(i), i, s(best), best)) best = i
      i += 1
    }
    best
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroid", this,
      classOf[NearestCentroid].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
  override def prettyName: String = "graft_nearest_centroid"
}

/** Indices of the `m` nearest centroids, NEAREST LAST (ascending
  * [cos, idx] order — the `slice(array_sort(listSims), -m, m)` shape of
  * `Similarity.nearestLists`). O(k·m) selection; m is the multiprobe
  * width (2–4), never the list count. */
case class NearestCentroids(child: Expression, cents: Seq[Seq[Double]], m: Int)
    extends UnaryExpression with CentroidKernel {

  require(cents.nonEmpty, "nearest-centroids needs at least one centroid")
  require(m >= 1 && m <= cents.size,
    s"multiprobe width $m out of range 1..${cents.size}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType | FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float|double> input, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  def compute(arr: ArrayData): ArrayData = {
    val s = sims(arr)
    val picked = new Array[Int](m)
    val used = new Array[Boolean](s.length)
    var p = 0
    while (p < m) {
      var best = -1
      var i = 0
      while (i < s.length) {
        if (!used(i) && (best < 0 || after(s(i), i, s(best), best))) best = i
        i += 1
      }
      used(best) = true
      picked(p) = best
      p += 1
    }
    // picked is best-first; emit worst..best = ascending [cos, idx]
    val out = new Array[Any](m)
    var k = 0
    while (k < m) { out(k) = picked(m - 1 - k); k += 1 }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroids", this,
      classOf[NearestCentroids].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
  override def prettyName: String = "graft_nearest_centroids"
}
