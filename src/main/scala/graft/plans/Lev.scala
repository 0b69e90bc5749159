package graft.plans

import org.apache.spark.unsafe.types.UTF8String

/** Bit-parallel Levenshtein distance (Myers 1999 / Hyyrö 2001).
  *
  * For a pattern of <= 64 code units the inner loop advances one TEXT
  * character per iteration with a constant number of word operations —
  * O(n) total — versus the O(n * (2t+1)) cell updates of the banded DP
  * behind Spark's built-in `levenshtein(l, r, t)`. On the fuzzy-match
  * self-joins (q19/q21/q22) the per-pair kernel is the dominant cost, so
  * this is the hot path; called from a codegen'd expression
  * ([[VectorExpressions.lev]]) as a static method, no boxing.
  *
  * Semantics match the built-in exactly (verified by LevSpec against a
  * classic-DP reference and the builtin on random inputs):
  *  - distance counts code POINTS, like UTF8String.levenshteinDistance;
  *    inputs containing surrogate pairs fall back to the built-in so
  *    astral chars keep code-point semantics (the bit-parallel loop works
  *    in UTF-16 units, which only coincide with code points for BMP).
  *  - with a threshold t >= 0, returns -1 when the distance exceeds t.
  *  - patterns longer than 64 units fall back to the built-in.
  */
object Lev {

  /** Unbounded distance. */
  def dist(a: UTF8String, b: UTF8String): Int = dist(a, b, -1)

  /** Distance, or -1 if `t >= 0` and the distance exceeds `t`. */
  def dist(a: UTF8String, b: UTF8String, t: Int): Int = {
    // ASCII fast path (r18): for all-ASCII operands, bytes == UTF-16 units
    // == code points, so the bit loop can run straight over the UTF8String
    // bytes — no java.lang.String materialization (the toString pair was
    // measured at ~2/3 of the kernel's per-call cost on the q19/q21 name
    // workloads: decode + copy + alloc per operand per pair).
    if (isAscii(a) && isAscii(b)) return distAscii(a, b, t)
    var p = a.toString
    var q = b.toString
    // surrogate fallback BEFORE any length math: UTF-16 lengths over- and
    // the bit loop mis-count astral chars, so every shortcut below is only
    // valid once units == code points is established
    if (hasSurrogate(p) || hasSurrogate(q)) {
      return if (t >= 0) a.levenshteinDistance(b, t) else a.levenshteinDistance(b)
    }
    if (p.length > q.length) { val tmp = p; p = q; q = tmp }
    val m = p.length
    val n = q.length
    // cheap exits: the length gap is a lower bound on the distance
    if (t >= 0 && n - m > t) return -1
    if (m == 0) return n // n - m <= t already checked when t >= 0
    if (m > 64) {
      return if (t >= 0) a.levenshteinDistance(b, t) else a.levenshteinDistance(b)
    }
    val score = myers64(p, q)
    if (t >= 0 && score > t) -1 else score
  }

  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes
    var i = 0
    while (i < n) {
      if (s.getByte(i) < 0) return false
      i += 1
    }
    true
  }

  /** [[dist]] for all-ASCII operands, straight over the UTF8String bytes. */
  private def distAscii(a: UTF8String, b: UTF8String, t: Int): Int = {
    var p = a
    var q = b
    if (p.numBytes > q.numBytes) { val tmp = p; p = q; q = tmp }
    val m = p.numBytes
    val n = q.numBytes
    if (t >= 0 && n - m > t) return -1
    if (m == 0) return n
    if (m > 64) {
      return if (t >= 0) a.levenshteinDistance(b, t) else a.levenshteinDistance(b)
    }
    val score = myers64Ascii(p, m, q, n)
    if (t >= 0 && score > t) -1 else score
  }

  /** Per-thread 128-entry pattern-mask table for [[myers64Ascii]]: one
    * 1 KB allocation per task thread instead of per pair. Only the
    * pattern's own positions are dirtied, and they are re-zeroed on exit,
    * so the table is always all-zero between calls. */
  private val asciiMasks = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](128)
  }

  private def myers64Ascii(p: UTF8String, m: Int, q: UTF8String, n: Int): Int = {
    val masks = asciiMasks.get()
    var i = 0
    while (i < m) {
      masks(p.getByte(i)) |= 1L << i
      i += 1
    }
    val last = 1L << (m - 1)
    var pv = -1L
    var mv = 0L
    var score = m
    var j = 0
    while (j < n) {
      val eq = masks(q.getByte(j))
      val xv = eq | mv
      val xh = (((eq & pv) + pv) ^ pv) | eq
      var ph = mv | ~(xh | pv)
      var mh = pv & xh
      if ((ph & last) != 0L) score += 1
      if ((mh & last) != 0L) score -= 1
      ph = (ph << 1) | 1L
      mh = mh << 1
      pv = mh | ~(xv | ph)
      mv = ph & xv
      j += 1
    }
    // restore the all-zero invariant for the next call on this thread
    i = 0
    while (i < m) {
      masks(p.getByte(i)) = 0L
      i += 1
    }
    score
  }

  private def hasSurrogate(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (Character.isSurrogate(s.charAt(i))) return true
      i += 1
    }
    false
  }

  /** Myers' algorithm for pattern length <= 64: one word op block per text
    * char. Standard Hyyrö formulation; `last` tracks the pattern's final
    * row bit, whose horizontal deltas adjust the running score. */
  private def myers64(p: String, q: String): Int = {
    val m = p.length
    // position bitmask per pattern char: ASCII direct-indexed, other BMP
    // chars through a small map (built only when present)
    val ascii = new Array[Long](128)
    var wide: scala.collection.mutable.LongMap[Long] = null
    var i = 0
    while (i < m) {
      val c = p.charAt(i)
      if (c < 128) ascii(c) |= 1L << i
      else {
        if (wide == null) wide = scala.collection.mutable.LongMap.empty[Long]
        wide(c.toLong) = wide.getOrElse(c.toLong, 0L) | (1L << i)
      }
      i += 1
    }
    val last = 1L << (m - 1)
    var pv = -1L
    var mv = 0L
    var score = m
    val n = q.length
    var j = 0
    while (j < n) {
      val c = q.charAt(j)
      val eq =
        if (c < 128) ascii(c)
        else if (wide != null) wide.getOrElse(c.toLong, 0L)
        else 0L
      val xv = eq | mv
      val xh = (((eq & pv) + pv) ^ pv) | eq
      var ph = mv | ~(xh | pv)
      var mh = pv & xh
      if ((ph & last) != 0L) score += 1
      if ((mh & last) != 0L) score -= 1
      ph = (ph << 1) | 1L
      mh = mh << 1
      pv = mh | ~(xv | ph)
      mv = ph & xv
      j += 1
    }
    score
  }
}
