package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Element readers for numeric arrays (each value cast to double, exactly
  * like the `x.cast("double")` inside the HOF lambdas these expressions
  * replace). */
private[expressions] object VectorKernel {
  def reader(dt: DataType): (ArrayData, Int) => Double = dt match {
    case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
    case ArrayType(FloatType, _) => (a, i) => a.getFloat(i).toDouble
    case ArrayType(ByteType, _) => (a, i) => a.getByte(i).toDouble
    case ArrayType(ShortType, _) => (a, i) => a.getShort(i).toDouble
    case ArrayType(IntegerType, _) => (a, i) => a.getInt(i).toDouble
    case ArrayType(LongType, _) => (a, i) => a.getLong(i).toDouble
    case other => throw new IllegalStateException(s"not a numeric array: $other")
  }

  def isNumericArray(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType | FloatType | ByteType | ShortType |
                   IntegerType | LongType, _) => true
    case _ => false
  }
}

/** Dot product of two numeric arrays as ONE codegen'd tight loop,
  * bit-exact vs the interpreted HOF form it replaces
  * (`aggregate(zip_with(x, y, (p, q) => p.cast(double) * q.cast(double)),
  * 0.0, _ + _)`): left-to-right accumulation in double, and the HOF null
  * algebra preserved — a null element, or a length mismatch (zip_with
  * pads the shorter side with nulls), nulls the product and therefore the
  * whole sum. Higher-order functions never codegen, so the HOF form paid
  * per-element lambda frames on EVERY candidate pair of every ANN probe —
  * the hot inner loop of the similarity surface.
  *
  * Used through `Similarity.dot`/`cosine`: the division and sqrt stay
  * ordinary Spark operators, so ANSI semantics (divide-by-zero on a
  * zero-norm vector) are exactly as before. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorKernel.isNumericArray(left.dataType) &&
        VectorKernel.isNumericArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two numeric arrays, got " +
        s"${left.dataType} and ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  @transient private lazy val readL = VectorKernel.reader(left.dataType)
  @transient private lazy val readR = VectorKernel.reader(right.dataType)

  /** Null (the boxed kind) when the HOF form would be null. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += readL(a, i) * readR(b, i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dotProduct", this, classOf[DotProduct].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = $ref.compute($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_dot"
}

/** Sign-bit LSH bucket of a vector under fixed hyperplanes, as one
  * codegen'd loop — replaces `Similarity.bucketOf`'s per-plane
  * interpreted folds (planes × dim lambda evaluations per row). Bit i is
  * set when `dot(vec, plane_i) >= 0`; the HOF null algebra carries over:
  * a null element or a length mismatch nulls that plane's dot, and
  * `when(d >= 0, ...)` then contributes 0 for the bit. */
case class SignBits(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.size <= 31,
    s"sign-bit bucket needs 1..31 planes, got ${planes.size}")

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorKernel.isNumericArray(child.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a numeric array, got ${child.dataType}")

  override def dataType: DataType = IntegerType

  @transient private lazy val planeArrays: Array[Array[Double]] =
    planes.map(_.toArray).toArray
  @transient private lazy val read = VectorKernel.reader(child.dataType)

  def compute(arr: ArrayData): Int = {
    val n = arr.numElements()
    // a null element anywhere nulls EVERY plane's fold (same vector feeds
    // each zip) → bucket 0, like the when(null >= 0, ...).otherwise(0) form
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) return 0
      j += 1
    }
    var bits = 0
    var i = 0
    while (i < planeArrays.length) {
      val p = planeArrays(i)
      if (p.length == n) { // zip_with length mismatch → null dot → bit 0
        var d = 0.0
        j = 0
        while (j < n) { d += read(arr, j) * p(j); j += 1 }
        if (d >= 0) bits |= 1 << i
      }
      i += 1
    }
    bits
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("signBits", this, classOf[SignBits].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SignBits =
    copy(child = newChild)
  override def prettyName: String = "graft_sign_bits"
}
