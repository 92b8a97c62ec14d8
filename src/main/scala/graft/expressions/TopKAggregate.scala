package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a partial-aggregating Catalyst aggregate.
  *
  * The standard Spark top-k-per-group shape —
  * `Window.partitionBy(g).orderBy(desc(ord)) … filter(rank <= k)` — moves
  * EVERY candidate row of a group through one task and sorts it there: for
  * an ANN query probing millions of candidates that single task is the
  * whole job's straggler. This aggregate keeps a k-bounded binary min-heap
  * per group instead, so the map side shrinks each partition's
  * contribution to ≤ k rows BEFORE the exchange (classic partial
  * aggregation; no built-in Spark aggregate bounds its state this way —
  * `collect_list` ships everything).
  *
  * Input: `(ord double, id long)`. Output: `array<struct<ord, id>>` sorted
  * by (ord DESC, id ASC) — ties break to the SMALLER id, matching the
  * `orderBy(desc(sim), asc(neighbor_id))` window the ANN operators used.
  * Nulls in either input are skipped (a null ordering value cannot rank).
  *
  * DOCUMENTED DIVERGENCE from the window it replaces: Spark's descending
  * sort order puts NaN FIRST (NaN > any double in its total order), so the
  * window form would rank a NaN-similarity candidate at the top. This
  * aggregate SKIPS NaN ordering values instead — a NaN cosine comes from a
  * degenerate (zero-norm) vector, and "best match" should never mean
  * "the arithmetic broke". LlmSpec pins both behaviors side by side. */
case class BoundedTopK(k: Int, ord: Expression, id: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedTopK.Heap] {

  require(k > 0, s"top-k needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(ord, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ord", DoubleType), StructField("id", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): BoundedTopK.Heap =
    new BoundedTopK.Heap(k)

  override def update(buf: BoundedTopK.Heap, input: InternalRow): BoundedTopK.Heap = {
    val o = ord.eval(input)
    val i = id.eval(input)
    // null/NaN ordering values cannot rank (a NaN similarity is a
    // degenerate vector, not a best match) — skipped, like agg nulls
    if (o != null && i != null && !java.lang.Double.isNaN(o.asInstanceOf[Double]))
      buf.offer(o.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BoundedTopK.Heap, other: BoundedTopK.Heap): BoundedTopK.Heap = {
    other.foreach((o, i) => buf.offer(o, i))
    buf
  }

  override def eval(buf: BoundedTopK.Heap): Any = {
    val sorted = buf.sortedDesc
    val rows = new Array[Any](sorted.length)
    var i = 0
    while (i < sorted.length) {
      rows(i) = InternalRow(sorted(i)._1, sorted(i)._2); i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: BoundedTopK.Heap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { (o, i) => bb.putDouble(o); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopK.Heap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new BoundedTopK.Heap(k)
    var i = 0
    while (i < n) { h.offer(bb.getDouble, bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(offset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BoundedTopK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(ord = newChildren(0), id = newChildren(1))
  override def prettyName: String = "graft_top_k"
}

object BoundedTopK {
  /** k-bounded binary min-heap over (ord, id) with the rank order
    * ord DESC, id ASC — the heap root is the WORST kept entry, i.e. the
    * minimum under `better`. Primitive parallel arrays, no boxing. */
  final class Heap(k: Int) {
    private val ords = new Array[Double](k)
    private val ids = new Array[Long](k)
    private var n = 0

    def size: Int = n

    // a beats b when (ord DESC, id ASC) ranks a first
    private def better(oa: Double, ia: Long, ob: Double, ib: Long): Boolean =
      oa > ob || (oa == ob && ia < ib)

    def offer(o: Double, i: Long): Unit = {
      if (n < k) {
        ords(n) = o; ids(n) = i; n += 1
        siftUp(n - 1)
      } else if (better(o, i, ords(0), ids(0))) {
        ords(0) = o; ids(0) = i
        siftDown(0)
      }
    }

    private def siftUp(start: Int): Unit = {
      var c = start
      while (c > 0) {
        val p = (c - 1) >> 1
        // min-heap on `better`: parent must be worse-or-equal than child
        if (better(ords(p), ids(p), ords(c), ids(c))) {
          swap(p, c); c = p
        } else return
      }
    }

    private def siftDown(start: Int): Unit = {
      var p = start
      while (true) {
        val l = 2 * p + 1; val r = l + 1
        var worst = p
        if (l < n && better(ords(worst), ids(worst), ords(l), ids(l))) worst = l
        if (r < n && better(ords(worst), ids(worst), ords(r), ids(r))) worst = r
        if (worst == p) return
        swap(p, worst); p = worst
      }
    }

    private def swap(a: Int, b: Int): Unit = {
      val to = ords(a); ords(a) = ords(b); ords(b) = to
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    def foreach(f: (Double, Long) => Unit): Unit = {
      var i = 0
      while (i < n) { f(ords(i), ids(i)); i += 1 }
    }

    /** Entries ranked best-first: ord DESC, ties to the smaller id. */
    def sortedDesc: Array[(Double, Long)] = {
      val out = new Array[(Double, Long)](n)
      var i = 0
      while (i < n) { out(i) = (ords(i), ids(i)); i += 1 }
      scala.util.Sorting.stableSort(out,
        (a: (Double, Long), b: (Double, Long)) => better(a._1, a._2, b._1, b._2))
      out
    }
  }
}
