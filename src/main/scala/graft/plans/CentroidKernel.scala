package graft.plans

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData

/** Coarse-quantizer kernels: nearest-centroid assignment and probe-list
  * selection over a flattened (nlist x dim) centroid tensor riding as ONE
  * codegen reference object — the [[LshBucketsKernel]] pattern applied to
  * IVF. The column-composed forms (`array(round(dot(v, array(lit...))))`
  * per centroid) inline nlist*dim literal doubles into a single generated
  * method; at production quantizer sizes (nlist ~ sqrt(n): 450 cells at
  * the 100x semantic-dedup point, thousands at corpus scale) that blows
  * janino's 64 KB method limit and silently drops the whole assignment
  * projection to interpreted eval over boxed literals.
  *
  * Tie/rounding semantics are bit-identical to the composed forms they
  * replace (spec-pinned):
  *  - dot accumulates ascending over min(dim, |v|) like
  *    [[VectorExpressions.DotProduct]];
  *  - `rounded` applies Catalyst Round's HALF_UP at scale 6
  *    (BigDecimal.valueOf(x).setScale(6)) per cell BEFORE comparison —
  *    the cross-engine float rule of the oracle-gated assignments;
  *  - argmax keeps the FIRST max (array_position semantics); probe lists
  *    order by (dot desc, index asc) — array_sort over (-d, c) structs. */
object CentroidKernel {

  private def dotAt(v: ArrayData, cents: Array[Double], dim: Int, c: Int,
      d: Int): Double = {
    val off = c * dim
    var s = 0.0
    var i = 0
    while (i < d) { s += cents(off + i) * v.getDouble(i); i += 1 }
    s
  }

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Index of the centroid with the highest (optionally rounded) dot
    * against `v`; first max wins ties. */
  def nearest(v: ArrayData, cents: Array[Double], dim: Int,
      rounded: Boolean): Int = {
    val nlist = cents.length / dim
    val d = math.min(dim, v.numElements())
    var bi = 0
    var best = Double.NegativeInfinity
    var c = 0
    while (c < nlist) {
      var s = dotAt(v, cents, dim, c, d)
      if (rounded) s = round6(s)
      if (s > best) { best = s; bi = c }
      c += 1
    }
    bi
  }

  /** The `nprobe` centroid indices ordered by (dot desc, index asc) —
    * the probe list of the IVF query side. Bounded insertion selection
    * (O(nlist * nprobe), primitive arrays, no boxing) instead of a full
    * O(nlist log nlist) sort: nprobe is single-digit-to-32 while nlist
    * grows with the corpus (sqrt n cells — thousands at corpus scale, a
    * million-cell quantizer someday), so the per-row cost must be ~one
    * linear scan. Tie rule preserved exactly: centroids arrive in index
    * order and an incoming EQUAL dot never displaces a seated one
    * (strict `>` at the shift), so equal-dot cells keep index-asc —
    * bit-identical to the stable sort this replaces (spec-pinned against
    * the composed struct-sort AND a dense-tie reference). */
  def probes(v: ArrayData, cents: Array[Double], dim: Int, nprobe: Int,
      rounded: Boolean): ArrayData = {
    val nlist = cents.length / dim
    val d = math.min(dim, v.numElements())
    val k = math.min(nprobe, nlist)
    if (k <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyIntArray)
    val topDot = new Array[Double](k)
    val topIdx = new Array[Int](k)
    var filled = 0
    var c = 0
    while (c < nlist) {
      var s = dotAt(v, cents, dim, c, d)
      if (rounded) s = round6(s)
      // skip non-finite dots (s != s is NaN): an unconditionally-seated
      // NaN would freeze the selection (every `>` against it is false),
      // diverging from the NaN-last total ordering this kernel replaced
      if (s == s && (filled < k || s > topDot(filled - 1))) {
        // seat at the end (dropping the displaced last when full), then
        // shift up past strictly-smaller dots only
        var i = if (filled < k) { filled += 1; filled - 1 } else k - 1
        while (i > 0 && topDot(i - 1) < s) {
          topDot(i) = topDot(i - 1); topIdx(i) = topIdx(i - 1); i -= 1
        }
        topDot(i) = s; topIdx(i) = c
      }
      c += 1
    }
    // filled < k only when non-finite dots were skipped — return the
    // seated prefix rather than zero-padded slots
    UnsafeArrayData.fromPrimitiveArray(
      if (filled == k) topIdx else java.util.Arrays.copyOf(topIdx, filled))
  }
}
