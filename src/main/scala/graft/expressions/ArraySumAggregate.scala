package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise sum of `array<double>` rows as a partial-aggregating
  * Catalyst aggregate.
  *
  * The natural DataFrame spelling of a per-group vector mean —
  * `posexplode(vec)` then `groupBy(g, pos).agg(avg)` — multiplies the input
  * by `dim` rows BEFORE the exchange, and (worse) Catalyst collapses any
  * computed grouping column into the post-Generate projection, re-evaluating
  * it once per array ELEMENT instead of once per row. For k-means fit, whose
  * grouping key is the interpreted nearest-centroid transform (a
  * `transform` × cosine fold that higher-order functions keep out of
  * codegen), that collapse cost dim× the most expensive expression in the
  * job (measured: 335 s to fit 8 centroids over 20k×64 vectors).
  *
  * This aggregate keeps ONE running `double[dim]` per group per partition
  * instead: the input row count never changes, the grouping expression runs
  * once per row, and the exchange carries `groups × partitions` buffers of
  * `dim` doubles (for an IVF fit: k×dim scalars per partition — constant in
  * the corpus size).
  *
  * Null rows are skipped (like built-in sums); null ELEMENTS count as 0.
  * Rows of differing length raise — a vector corpus with mixed dims is
  * corrupt, and padding would silently skew the means.
  */
case class ArraySum(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArraySum.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): ArraySum.Buf = new ArraySum.Buf

  override def update(buf: ArraySum.Buf, input: InternalRow): ArraySum.Buf = {
    val a = child.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val s = buf.ensure(n, "input row")
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) s(i) += arr.getDouble(i)
        i += 1
      }
    }
    buf
  }

  override def merge(buf: ArraySum.Buf, other: ArraySum.Buf): ArraySum.Buf = {
    val o = other.sums
    if (o != null) {
      val s = buf.ensure(o.length, "merge buffer")
      var i = 0
      while (i < o.length) { s(i) += o(i); i += 1 }
    }
    buf
  }

  override def eval(buf: ArraySum.Buf): Any = {
    val s = buf.sums
    new GenericArrayData(if (s == null) Array.emptyDoubleArray else s)
  }

  override def serialize(buf: ArraySum.Buf): Array[Byte] = {
    val s = buf.sums
    val n = if (s == null) -1 else s.length
    val bb = java.nio.ByteBuffer.allocate(4 + math.max(0, n) * 8)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(s(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArraySum.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArraySum.Buf
    if (n >= 0) {
      val s = buf.ensure(n, "deserialize")
      var i = 0
      while (i < n) { s(i) = bb.getDouble; i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): ArraySum =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ArraySum =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ArraySum =
    copy(child = newChildren(0))
  override def prettyName: String = "graft_array_sum"
}

object ArraySum {
  /** Running sums; dim fixed by the first row seen (null until then, so an
    * all-null group evals to an empty array rather than inventing a dim). */
  final class Buf {
    var sums: Array[Double] = _
    def ensure(n: Int, what: String): Array[Double] = {
      if (sums == null) sums = new Array[Double](n)
      else require(sums.length == n,
        s"graft_array_sum: $what has ${n} elements, expected ${sums.length}")
      sums
    }
  }
}
