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
}
