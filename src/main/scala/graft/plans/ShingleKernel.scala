package graft.plans

import org.apache.spark.sql.catalyst.expressions.{UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData

/** Shingle hashing without shingle strings.
  *
  * The previous pipeline materialized every word n-gram as a string
  * (`concat_ws` over a token slice), deduped and sorted the strings, and
  * only then hashed them (`xxhash64` per shingle for the verify kernel,
  * `pmod(xxhash64, p)` for minhash). That built and cached
  * O(tokens * n) string bytes per document — the cached shingle frame was
  * the dominant storage consumer at bench time and the prime suspect for
  * the round-5 q31/q32 run-to-run variance (storage pressure/spill).
  *
  * This kernel computes the sorted deduped 64-bit hash set of all n-token
  * shingles directly from the token array in one pass:
  *
  *   1. one xxhash64 per token ([[XXH64.hashUTF8String]] — the same
  *      primitive behind Spark's `xxhash64`),
  *   2. a rolling polynomial over the window of n token hashes in
  *      mod-2^64 arithmetic: H_{i+1} = (H_i - h_i * M^(n-1)) * M + h_{i+n}
  *      — O(tokens) total work independent of n,
  *   3. a murmur3 finalizer (fmix64) so downstream band/bucket hashing
  *      sees uniformly-mixed bits despite the weak high bits of raw
  *      polynomial hashes,
  *   4. primitive sort + in-place dedup -> [[UnsafeArrayData]] of longs.
  *
  * Downstream consumers (Jaccard verify via sorted-merge intersection,
  * minhash base hashes, the shared-shingle candidate join) only ever need
  * set cardinalities, set intersections, and per-element hashes — all
  * preserved by any injective-in-practice hash. A 64-bit collision between
  * two distinct shingles of one document undercounts its set size by one
  * (~1e-17 per document at ~40 shingles); the DuckDB string-set oracle
  * gates the end-to-end results, so any material collision would surface
  * as a hash mismatch.
  */
object ShingleKernel {
  /** Odd multiplier (2^64 / golden ratio) for the rolling polynomial. */
  private final val M = 0x9e3779b97f4a7c15L
  final val TokenSeed = 42L

  private val Empty = UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)

  /** Murmur3 64-bit finalizer — bijective, so it cannot introduce
    * collisions beyond the polynomial's own. */
  def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** Sorted, deduped 64-bit hashes of all `n`-token shingles of `toks`.
    * Fewer than n tokens -> empty array (callers drop those docs, matching
    * the string formulation's `len(t) >= n` guard). */
  def hashSet(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    val cnt = m - n + 1
    if (cnt <= 0) return Empty
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      th(i) = XXH64.hashUTF8String(toks.getUTF8String(i), TokenSeed)
      i += 1
    }
    // M^(n-1) for the rolling subtract
    var mp = 1L
    i = 0
    while (i < n - 1) { mp *= M; i += 1 }
    val out = new Array[Long](cnt)
    var h = 0L
    i = 0
    while (i < n) { h = h * M + th(i); i += 1 }
    out(0) = fmix64(h)
    i = 1
    while (i < cnt) {
      h = (h - th(i - 1) * mp) * M + th(i + n - 1)
      out(i) = fmix64(h)
      i += 1
    }
    java.util.Arrays.sort(out)
    var w = 0
    i = 1
    while (i < cnt) {
      if (out(i) != out(w)) { w += 1; out(w) = out(i) }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (w + 1 == cnt) out else java.util.Arrays.copyOf(out, w + 1))
  }
}
