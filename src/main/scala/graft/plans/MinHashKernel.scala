package graft.plans

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData

/** MinHash signature kernel: one pass over a document's base hashes
  * computing min((a_i*h + b_i) mod p) for every affine permutation i.
  *
  * Static and Java-callable so [[VectorExpressions.MinHashSig]]'s
  * `doGenCode` can invoke it from whole-stage-codegen'd Java with the
  * permutation tables attached as codegen reference objects — the same
  * kernel-object pattern as [[ShingleKernel]]/[[SimHashKernel]]/[[Lev]].
  *
  * Overflow invariant: a_i <= 2^31-1, 0 <= b_i <= 2^31-1, and
  * 0 <= h < 2^32 give a_i*h + b_i <= (2^31-1)*2^32 < Long.MaxValue with
  * only ~0.001% margin — a_i < 2^32 would NOT be safe. The caller
  * (Dedup.affineParams) enforces the parameter domain at
  * table-construction time; callers feeding hashes must keep them in the
  * prime field (h < p < 2^32, i.e. non-negative). */
object MinHashKernel {
  def sig(hashes: ArrayData, as: Array[Long], bs: Array[Long], prime: Long): ArrayData = {
    val k = as.length
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = hashes.numElements()
    var j = 0
    while (j < n) {
      val h = hashes.getLong(j)
      var i = 0
      while (i < k) {
        val p = (as(i) * h + bs(i)) % prime
        if (p < out(i)) out(i) = p
        i += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
