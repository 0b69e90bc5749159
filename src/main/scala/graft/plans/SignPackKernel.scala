package graft.plans

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData

/** Random-hyperplane sign-signature kernel: packs the sign bits of
  * `nBits` plane dot-products into a long array (bit b of word b/64 set
  * iff v . plane_b >= 0).
  *
  * This is the staged-fetch prefilter for the sign-LSH verify stage
  * (the q22 sizes-before-arrays discipline applied to embeddings): a
  * candidate pair's Hamming distance over these signatures estimates
  * its angle (E[ham]/nBits = theta/pi — the sign-LSH collision
  * identity), so hopeless pairs are pruned on a 16-long signature
  * (~128 B/row) BEFORE the 8*dim-byte float vectors are fetched.
  *
  * Static and Java-callable so [[VectorExpressions.SignPack]]'s
  * `doGenCode` can invoke it from whole-stage-codegen'd Java with the
  * flattened plane matrix attached as a codegen reference object —
  * the same kernel-object pattern as [[MinHashKernel]]/[[SimHashKernel]].
  *
  * `planes` is row-major nBits x dim; vectors shorter than `dim`
  * contribute only their leading elements (mirrors [[VectorExpressions.DotProduct]]'s
  * min-length rule). */
object SignPackKernel {
  def pack(v: ArrayData, planes: Array[Double], dim: Int): ArrayData = {
    val nBits = planes.length / dim
    val d = math.min(dim, v.numElements())
    val out = new Array[Long]((nBits + 63) >>> 6)
    var b = 0
    while (b < nBits) {
      val off = b * dim
      var s = 0.0
      var i = 0
      while (i < d) { s += planes(off + i) * v.getDouble(i); i += 1 }
      if (s >= 0) out(b >>> 6) |= (1L << (b & 63))
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
