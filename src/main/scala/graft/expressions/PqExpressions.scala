package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization expressions (Jégou/Douze/Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011 — public
  * knowledge; the reference engine has no ANN surface at all).
  *
  * A PQ code compresses a dim-D vector to M bytes: the vector's RESIDUAL
  * against its coarse (IVF) centroid is split into M subspaces of D/M
  * dims, and each slice is replaced by the index of its nearest codeword
  * in that subspace's 256-entry-max codebook. A 64-dim float32 embedding
  * (256 bytes) becomes 8 bytes — 32× less data moved by the candidate-
  * ranking scan at any corpus size, which is the difference between an
  * in-memory and an IO-bound ranking phase at 100 TB.
  *
  * All three expressions are codegen'd tight loops (the same
  * addReferenceObj pattern as [[NearestCentroid]]): higher-order-function
  * spellings of residual slicing and table lookups never codegen and pay
  * per-element lambda frames on every corpus row.
  *
  * Kernel conventions, shared so fit / encode / probe can never drift:
  *  - L2 assignment: nearest = MIN squared distance, ties to the LARGER
  *    index (mirror of the cosine kernel's rule — any deterministic rule
  *    works, boundary rows belong to either cell equally well). PQ
  *    codebooks minimize L2 reconstruction error, so assignment is
  *    Euclidean, not cosine: residual MAGNITUDE matters.
  *  - null elements read as 0.0 (corrupt-corpus edge, same as
  *    [[CentroidKernel]]); a null vector/list/codes/lut nulls the output.
  */
private[expressions] object PqKernel {
  /** Index of the L2-nearest codeword; ties to the larger index.
    * `vec(off + j)` vs `book(c)(j)` over the codeword's length. */
  def l2Nearest(elem: Int => Double, off: Int, book: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < book.length) {
      val w = book(c)
      var d = 0.0
      var j = 0
      while (j < w.length) {
        val diff = elem(off + j) - w(j)
        d += diff * diff
        j += 1
      }
      // <= : equal distance prefers the later (larger) index, mirroring
      // the cosine kernel's tie rule; NaN compares false so a NaN
      // distance never wins over a finite one
      if (d <= bestD) { best = c; bestD = d }
      c += 1
    }
    best
  }

  def readerOf(dt: DataType, arr: ArrayData): Int => Double = {
    val read = VectorKernel.reader(dt)
    i => if (i >= arr.numElements() || arr.isNullAt(i)) 0.0 else read(arr, i)
  }
}

/** Index of the L2-nearest centroid (ties → larger index) — the
  * assignment step of per-subspace Lloyd iterations in
  * `Similarity.pqFit`. Distance over the centroid's length; vector
  * elements past its own length read as 0.0. */
case class NearestCentroidL2(child: Expression, cents: Seq[Seq[Double]])
    extends UnaryExpression {

  require(cents.nonEmpty, "nearest-centroid-l2 needs at least one centroid")

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorKernel.isNumericArray(child.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a numeric array, got ${child.dataType}")
  override def dataType: DataType = IntegerType

  @transient private lazy val book: Array[Array[Double]] =
    cents.map(_.toArray).toArray

  def compute(arr: ArrayData): Int =
    PqKernel.l2Nearest(PqKernel.readerOf(child.dataType, arr), 0, book)

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroidL2", this,
      classOf[NearestCentroidL2].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidL2 =
    copy(child = newChild)
  override def prettyName: String = "graft_nearest_centroid_l2"
}

/** One subspace slice of a vector's residual against its coarse centroid:
  * `out[j] = vec[from + j] - cents[list][from + j]`, `len` elements —
  * the per-subspace training column for `Similarity.pqFit`. A fused
  * kernel instead of `slice(zip_with(vec, element_at(...), _ - _))`
  * because that HOF chain evaluates interpreted, re-allocating lambda
  * frames per ELEMENT per row (the documented Catalyst trap that made
  * the naive ivfFit spelling 100× slower). */
case class ResidualSlice(left: Expression, right: Expression,
    cents: Seq[Seq[Double]], from: Int, len: Int) extends BinaryExpression {

  require(cents.nonEmpty && from >= 0 && len > 0 &&
    cents.forall(_.length >= from + len),
    "residual slice out of centroid range")

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorKernel.isNumericArray(left.dataType) &&
        right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (numeric array, int), got " +
        s"${left.dataType} and ${right.dataType}")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  @transient private lazy val centArrays: Array[Array[Double]] =
    cents.map(_.toArray).toArray

  def compute(arr: ArrayData, list: Int): ArrayData = {
    if (list < 0 || list >= centArrays.length)
      throw new IllegalStateException(
        s"list $list out of range 0..${centArrays.length - 1}")
    val read = PqKernel.readerOf(left.dataType, arr)
    val c = centArrays(list)
    val out = new Array[Any](len)
    var j = 0
    while (j < len) { out(j) = read(from + j) - c(from + j); j += 1 }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any, l: Any): Any =
    compute(v.asInstanceOf[ArrayData], l.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("residualSlice", this,
      classOf[ResidualSlice].getName)
    nullSafeCodeGen(ctx, ev, (v, l) => s"${ev.value} = $ref.compute($v, $l);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ResidualSlice =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_residual_slice"
}

/** PQ-encode a vector given its coarse list assignment: residual against
  * `cents(list)`, split into `books.size` subspaces (subspace m's width =
  * its codewords' length), each slice replaced by the byte index of its
  * L2-nearest codeword. Output: BinaryType, exactly M bytes — the
  * persisted `pqcodes` index column. Codebooks are capped at 256 entries
  * so a code always fits one byte (read back unsigned). */
case class PqEncode(left: Expression, right: Expression,
    cents: Seq[Seq[Double]], books: Seq[Seq[Seq[Double]]])
    extends BinaryExpression {

  require(books.nonEmpty && books.forall(b => b.nonEmpty && b.size <= 256),
    "PQ needs 1..256 codewords per subspace")
  require(books.forall(b => b.forall(_.length == b.head.length)),
    "ragged codewords within a subspace")
  require(cents.nonEmpty && books.map(_.head.length).sum == cents.head.length,
    s"subspace widths ${books.map(_.head.length)} must cover the " +
      s"vector dimension ${cents.headOption.map(_.length).getOrElse(0)}")

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorKernel.isNumericArray(left.dataType) &&
        right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (numeric array, int), got " +
        s"${left.dataType} and ${right.dataType}")
  override def dataType: DataType = BinaryType

  @transient private lazy val centArrays: Array[Array[Double]] =
    cents.map(_.toArray).toArray
  @transient private lazy val bookArrays: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val offsets: Array[Int] =
    bookArrays.scanLeft(0)((acc, b) => acc + b(0).length).init

  def compute(arr: ArrayData, list: Int): Array[Byte] = {
    if (list < 0 || list >= centArrays.length)
      throw new IllegalStateException(
        s"list $list out of range 0..${centArrays.length - 1}")
    val read = PqKernel.readerOf(left.dataType, arr)
    val c = centArrays(list)
    // residual read fused into the element reader: no intermediate array
    val res: Int => Double = i => read(i) - c(i)
    val out = new Array[Byte](bookArrays.length)
    var m = 0
    while (m < bookArrays.length) {
      out(m) = PqKernel.l2Nearest(res, offsets(m), bookArrays(m)).toByte
      m += 1
    }
    out
  }

  override protected def nullSafeEval(v: Any, l: Any): Any =
    compute(v.asInstanceOf[ArrayData], l.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, (v, l) => s"${ev.value} = $ref.compute($v, $l);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_pq_encode"
}

/** The query-side ADC lookup table as an expression — for DISTRIBUTED
  * query sets ([[graft.llm.IvfIndex.knnJoinPq]]), where the driver-side
  * LUT of the probe API can't exist: `out[m*ks + c] = dot(vec_m,
  * codeword_{m,c})`, computed once per query ROW before the probe
  * fan-out. ks is padded to the largest subspace codebook so the layout
  * matches [[PqAdc]]'s indexing. */
case class PqLut(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  require(books.nonEmpty && books.forall(b => b.nonEmpty && b.size <= 256),
    "PQ needs 1..256 codewords per subspace")

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorKernel.isNumericArray(child.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a numeric array, got ${child.dataType}")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  @transient private lazy val bookArrays: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val offsets: Array[Int] =
    bookArrays.scanLeft(0)((acc, b) => acc + b(0).length).init
  @transient private lazy val ks: Int = bookArrays.map(_.length).max

  def compute(arr: ArrayData): ArrayData = {
    val read = PqKernel.readerOf(child.dataType, arr)
    val out = new Array[Any](bookArrays.length * ks)
    java.util.Arrays.fill(out, 0.0d)
    var m = 0
    while (m < bookArrays.length) {
      val book = bookArrays(m)
      val off = offsets(m)
      var c = 0
      while (c < book.length) {
        val w = book(c)
        var s = 0.0
        var j = 0
        while (j < w.length) { s += read(off + j) * w(j); j += 1 }
        out(m * ks + c) = s
        c += 1
      }
      m += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqLut", this, classOf[PqLut].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
  override def prettyName: String = "graft_pq_lut"
}

/** Asymmetric distance computation (ADC): approximate `dot(query,
  * residual)` as `Σ_m lut[m*ks + code_m]` where the query-side lookup
  * table `lut[m*ks + c] = dot(query_m, codeword_{m,c})` was computed ONCE
  * per query on the driver. The per-candidate work is M unsigned-byte
  * lookups + M adds — no arithmetic on the vector at all; the float
  * column stays entirely unread until the exact rescore. */
case class PqAdc(left: Expression, right: Expression, ks: Int)
    extends BinaryExpression {

  require(ks >= 1 && ks <= 256, s"codebook size $ks out of range 1..256")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType &&
        (right.dataType == ArrayType(DoubleType, false) ||
         right.dataType == ArrayType(DoubleType, true)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (binary codes, array<double> lut), got " +
        s"${left.dataType} and ${right.dataType}")
  override def dataType: DataType = DoubleType

  def compute(codes: Array[Byte], lut: ArrayData): Double = {
    val n = lut.numElements()
    if (codes.length * ks != n)
      throw new IllegalStateException(
        s"ADC shape mismatch: ${codes.length} code bytes × ks=$ks " +
          s"!= lut length $n — index and query built with different PQ layouts")
    var s = 0.0
    var m = 0
    while (m < codes.length) {
      s += lut.getDouble(m * ks + (codes(m) & 0xff))
      m += 1
    }
    s
  }

  override protected def nullSafeEval(c: Any, l: Any): Any =
    compute(c.asInstanceOf[Array[Byte]], l.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdc].getName)
    nullSafeCodeGen(ctx, ev, (c, l) => s"${ev.value} = $ref.compute($c, $l);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_pq_adc"
}
