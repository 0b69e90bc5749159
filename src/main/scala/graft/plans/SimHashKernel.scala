package graft.plans

import org.apache.spark.sql.catalyst.util.ArrayData

/** SimHash-64 kernel: FNV-1a-64 over each token's UTF-16 code units,
  * +/-1 bit votes across tokens, sign fold to a 64-bit signature.
  *
  * Static and Java-callable so [[VectorExpressions.SimHash64]]'s
  * `doGenCode` can invoke it from whole-stage-codegen'd Java — the same
  * kernel-object pattern as [[ShingleKernel]]/[[Lev]]. Byte-identical to
  * the Scala reference `Dedup.simhash64` (the UTF-16 `charAt` xor, gated
  * by OperatorsSpec) and to the q33 DuckDB oracle's HUGEINT emulation of
  * this exact arithmetic.
  */
object SimHashKernel {
  def sig(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      // decode to a Java String: the vote hash is defined over UTF-16
      // code units (reference semantics), not UTF-8 bytes
      val s = tokens.getUTF8String(t).toString
      var h = 0xcbf29ce484222325L // FNV-1a 64
      var i = 0
      while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      t += 1
    }
    var sigv = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) sigv |= (1L << j); j += 1 }
    sigv
  }
}
