package graft.plans

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData

/** Multi-table random-hyperplane bucket kernel: all `nTables` sign-LSH
  * bucket ids of a vector in ONE compiled loop.
  *
  * Table t's bucket is `(t << 32) | bits`, where bit b is set iff
  * `v . plane_{t,b} >= 0` — bit-for-bit the per-table composition
  * `sum_b when(dot(v, h_b) >= 0, 1L << b) + (t << 32)` that
  * [[graft.operators.Similarity.lshBucket]] builds from column
  * expressions (a sum of distinct powers of two IS the bitwise OR, and
  * the dot accumulates ascending like [[VectorExpressions.DotProduct]]).
  *
  * Why a kernel instead of `explode(array(lshBucket(t=0..L)))`: the
  * composed form inlines nTables*nBits literal plane arrays into one
  * projection — at the auto operating points (L grows ~n^rho, 163
  * tables at the 10x corpus) janino rejects the generated method
  * ("Code grows beyond 64 KB") and the whole sketch projection falls
  * back to interpreted eval with 500+ boxed literal references. Here
  * the flattened plane tensor rides as ONE codegen reference object
  * and the loop is this static method — the [[MinHashKernel]] /
  * [[SignPackKernel]] pattern.
  *
  * `planes` is row-major nTables x nBits x dim; vectors shorter than
  * `dim` contribute only their leading elements (the
  * [[VectorExpressions.DotProduct]] min-length rule). */
object LshBucketsKernel {
  def buckets(v: ArrayData, planes: Array[Double], dim: Int, nBits: Int): ArrayData = {
    val nTables = planes.length / (nBits * dim)
    val d = math.min(dim, v.numElements())
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var key = t.toLong << 32
      var b = 0
      while (b < nBits) {
        val off = (t * nBits + b) * dim
        var s = 0.0
        var i = 0
        while (i < d) { s += planes(off + i) * v.getDouble(i); i += 1 }
        if (s >= 0) key |= (1L << b)
        b += 1
      }
      out(t) = key
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** The same nTables x nBits sign bits as [[buckets]], bit-packed
    * table-major into ceil(nTables*nBits/64) longs: bit `t*nBits + b` is
    * table t's bit b. 6x leaner than the bucket-keys array (nBits bits vs
    * a 64-bit key per table) — the exactly-once-emission form each banded
    * row carries so the pair join can test "is THIS table the first where
    * the two rows collide?" ([[firstCollidingTable]]) without a second
    * lookup. Bit b of bucket key t == bit `t*nBits+b` here (same planes,
    * same dot accumulation; spec-pinned). */
  def packedBuckets(v: ArrayData, planes: Array[Double], dim: Int, nBits: Int): ArrayData = {
    val nTables = planes.length / (nBits * dim)
    val d = math.min(dim, v.numElements())
    val out = new Array[Long]((nTables * nBits + 63) >>> 6)
    var t = 0
    while (t < nTables) {
      var b = 0
      while (b < nBits) {
        val off = (t * nBits + b) * dim
        var s = 0.0
        var i = 0
        while (i < d) { s += planes(off + i) * v.getDouble(i); i += 1 }
        if (s >= 0) { val p = t * nBits + b; out(p >>> 6) |= (1L << (p & 63)) }
        b += 1
      }
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Smallest table index whose nBits-bit slices of two [[packedBuckets]]
    * arrays are equal (i.e. the first table where the two vectors share a
    * bucket), or -1 if none. The exactly-once-emission predicate: a
    * within-bucket pair at table t is emitted iff t == firstColliding —
    * a near pair colliding in MANY of the nTables tables (the common case
    * for the very-near pairs dedup cares about) reaches the pair exchange
    * once instead of once per shared bucket. Early-exits at the first
    * match, so the scan averages far fewer than nTables slice compares. */
  def firstCollidingTable(a: ArrayData, b: ArrayData, nBits: Int, nTables: Int): Int = {
    val mask = if (nBits >= 64) -1L else (1L << nBits) - 1L
    var t = 0
    while (t < nTables) {
      val pos = t * nBits
      val w = pos >>> 6
      val off = pos & 63
      // off + nBits > 64 implies off > 0, so the << (64 - off) is well-defined
      var sa = a.getLong(w) >>> off
      var sb = b.getLong(w) >>> off
      if (off + nBits > 64) {
        sa |= a.getLong(w + 1) << (64 - off)
        sb |= b.getLong(w + 1) << (64 - off)
      }
      if ((sa & mask) == (sb & mask)) return t
      t += 1
    }
    -1
  }
}
