package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature over pre-hashed shingles as ONE codegen'd loop,
  * bit-exact vs the interpreted HOF fold it replaces
  * (`Dedup.minHashSignatureFromHashesHof`):
  *
  * {{{
  * aggregate(hs, array_repeat(Long.MaxValue, H),
  *   (acc, h) => zip_with(acc, sequence(0, H-1),
  *     (m, i) => least(m, xxhash64(h, i))))
  * }}}
  *
  * The HOF form is O(|shingles| × H) interpreted lambda evaluations AND
  * allocates a fresh H-long accumulator array per shingle (each fold step
  * materializes `zip_with`'s output) — per document, on the hottest path
  * of the minhash/fuzzy-dedup pipeline. This expression keeps one
  * primitive `long[H]` and calls Spark's own XXH64 kernels, so the bits
  * are identical:
  *
  *  - `xxhash64(h, i)` = `XXH64.hashInt(i, XXH64.hashLong(h, 42))` (the
  *    multi-column xxhash64 folds each value into the running seed; `i`
  *    comes from `sequence(0, H-1)` and is an INT);
  *  - a null shingle hash is SKIPPED by the hash function (the running
  *    seed passes through): `xxhash64(null, i)` = `XXH64.hashInt(i, 42)`;
  *  - an empty array leaves the signature at Long.MaxValue everywhere.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes >= 1, s"minhash needs numHashes >= 1, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<bigint> (pre-hashed shingles), got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def compute(arr: ArrayData): ArrayData = {
    val acc = new Array[Long](numHashes)
    java.util.Arrays.fill(acc, Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val base =
        if (arr.isNullAt(j)) 42L
        else XXH64.hashLong(arr.getLong(j), 42L)
      var i = 0
      while (i < numHashes) {
        val v = XXH64.hashInt(i, base)
        if (v < acc(i)) acc(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(acc)
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashSig", this,
      classOf[MinHashSignature].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash_signature"
}
