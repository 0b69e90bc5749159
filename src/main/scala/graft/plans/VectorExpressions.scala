package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native Catalyst expressions for the vector/sketch hot paths.
  *
  * The higher-order-function formulations (`aggregate(zip_with(...))`)
  * are correct but allocate an intermediate array per row-pair and box
  * every element; on the O(n^2) similarity joins that dominates runtime.
  * These expressions stay primitive end-to-end and participate in
  * whole-stage codegen (hand-written `doGenCode` loops).
  */
object VectorExpressions {

  /** Dot product of two array<double> columns — the cosine kernel.
    * Null if either side is null; assumes equal lengths (extra elements on
    * the longer side are ignored). */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double ${ev.value}Acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  ${ev.value}Acc += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = ${ev.value}Acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** Full MinHash signature in ONE pass over the base hashes: for each of
    * the `a.length` affine permutations (a_i*h + b_i) mod p, the minimum
    * over all hashes. Replaces bands*rows separate `aggregate` calls that
    * each re-iterate the hash array. Codegen'd via [[MinHashKernel]] (the
    * permutation tables ride as referenced objects) so the signature pass
    * stays inside the whole-stage span — it WAS the one CodegenFallback
    * on the minhash hot path (q32/q22 compute bands*rows permutations per
    * document; at the corpus-sized q22 point that is thousands). */
  case class MinHashSig(child: Expression, as: Array[Long], bs: Array[Long], prime: Long)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(LongType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def nullSafeEval(v: Any): Any =
      MinHashKernel.sig(v.asInstanceOf[ArrayData], as, bs, prime)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val asRef = ctx.addReferenceObj("minhashAs", as, "long[]")
      val bsRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.plans.MinHashKernel.sig($a, $asRef, $bsRef, ${prime}L);")
    }

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Sorted deduped 64-bit shingle-hash set straight from a token array —
    * the whole shingle pipeline (n-gram materialization, dedup, sort,
    * per-shingle hash) as ONE codegen'd call into [[ShingleKernel]].
    * Replaces the `array_sort(array_distinct(transform(... concat_ws ...)))`
    * string formulation whose cached frames dominated bench-time storage
    * (round-5 q31/q32 variance). Output feeds [[SortedLongIntersectSize]]
    * (Jaccard verify), minhash base hashing, and the shared-shingle
    * candidate join directly. */
  case class ShingleHashSet(child: Expression, n: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(n >= 1, s"shingle size must be >= 1, got $n")
    override def inputTypes = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def nullSafeEval(v: Any): Any =
      ShingleKernel.hashSet(v.asInstanceOf[ArrayData], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.plans.ShingleKernel.hashSet($a, $n);")

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def shingleHashSet(tokens: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashSet(ColumnBridge.expression(tokens), n))

  /** 64-bit SimHash of a token array — [[SimHashKernel]] as a codegen'd
    * expression. Retires the last hot-path UDF (the per-token vote loop is
    * the same shape [[MinHashSig]] hand-codegens): no row-converter
    * boundary, no Seq boxing, stays inside the whole-stage span. */
  case class SimHash64(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(StringType))
    override def dataType: DataType = LongType

    override def nullSafeEval(v: Any): Any =
      SimHashKernel.sig(v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.plans.SimHashKernel.sig($a);")

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  /** |A intersect B| for SORTED array<long> columns — the exact-Jaccard
    * verify kernel (jac = i / (|A| + |B| - i)): one zero-allocation merge
    * pass over primitive longs per row-pair, vs `array_intersect` +
    * `array_union` which each build a hash set and materialize a result
    * array; on a multi-million-pair candidate verify that difference
    * dominates the stage. Callers sort once per DOCUMENT (inside
    * [[ShingleHashSet]]); unsorted input silently undercounts. 64-bit
    * collisions would overcount by one; at ~14-40 elements/doc the
    * probability is ~1e-17 per pair — below any oracle's noise floor. */
  case class SortedLongIntersectSize(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes =
      Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = IntegerType

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      val m = y.numElements()
      var i = 0; var j = 0; var c = 0
      while (i < n && j < m) {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
      c
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val c = ctx.freshName("c")
        val n = ctx.freshName("n")
        val m = ctx.freshName("m")
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        s"""
           |int $n = $a.numElements();
           |int $m = $b.numElements();
           |int $i = 0; int $j = 0; int $c = 0;
           |while ($i < $n && $j < $m) {
           |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
           |  if ($xv == $yv) { $c++; $i++; $j++; }
           |  else if ($xv < $yv) { $i++; } else { $j++; }
           |}
           |${ev.value} = $c;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  def sortedLongIntersectSize(a: Column, b: Column): Column =
    ColumnBridge.column(SortedLongIntersectSize(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Packed random-hyperplane sign signature of an array<double> vector —
    * [[SignPackKernel]] as a codegen'd expression (plane matrix rides as a
    * codegen reference object, like [[MinHashSig]]'s permutation tables).
    * Output: array<long> of (nBits+63)/64 words. The verify-stage
    * prefilter key for the sign-LSH paths. */
  case class SignPack(child: Expression, planes: Array[Double], dim: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(dim >= 1 && planes.length % dim == 0,
      s"planes length ${planes.length} must be a positive multiple of dim $dim")
    override def inputTypes = Seq(ArrayType(DoubleType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def nullSafeEval(v: Any): Any =
      SignPackKernel.pack(v.asInstanceOf[ArrayData], planes, dim)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val planesRef = ctx.addReferenceObj("signPlanes", planes, "double[]")
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.plans.SignPackKernel.pack($a, $planesRef, $dim);")
    }

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def signPack(v: Column, planes: Array[Double], dim: Int): Column =
    ColumnBridge.column(SignPack(ColumnBridge.expression(v), planes, dim))

  /** All multi-table sign-LSH bucket ids of an array<double> vector —
    * [[LshBucketsKernel]] as a codegen'd expression (the flattened
    * nTables x nBits x dim plane tensor rides as ONE codegen reference
    * object). Output: array<long> of nTables keys, `(t << 32) | signbits`.
    * Replaces `array(lshBucket(t=0), ..., lshBucket(t=L-1))`, whose
    * inlined literal planes blow janino's 64 KB method limit at the
    * auto operating points (L ~ n^rho) and drop the whole sketch
    * projection to interpreted eval. */
  case class LshBuckets(child: Expression, planes: Array[Double],
      dim: Int, nBits: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(dim >= 1 && nBits >= 1 && nBits <= 32 &&
      planes.length % (nBits * dim) == 0 && planes.nonEmpty,
      s"planes length ${planes.length} must be a positive multiple of nBits*dim = ${nBits * dim}")
    override def inputTypes = Seq(ArrayType(DoubleType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def nullSafeEval(v: Any): Any =
      LshBucketsKernel.buckets(v.asInstanceOf[ArrayData], planes, dim, nBits)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[]")
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.plans.LshBucketsKernel.buckets($a, $planesRef, $dim, $nBits);")
    }

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def lshBuckets(v: Column, planes: Array[Double], dim: Int, nBits: Int): Column =
    ColumnBridge.column(LshBuckets(ColumnBridge.expression(v), planes, dim, nBits))

  /** [[LshBuckets]]'s sign bits packed table-major into
    * ceil(nTables*nBits/64) longs ([[LshBucketsKernel.packedBuckets]]) —
    * the per-row collision map the exactly-once pair emission carries
    * through the band join (~nBits/64 the bytes of the bucket-keys
    * array). */
  case class LshBucketPack(child: Expression, planes: Array[Double],
      dim: Int, nBits: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(dim >= 1 && nBits >= 1 && nBits <= 32 &&
      planes.length % (nBits * dim) == 0 && planes.nonEmpty,
      s"planes length ${planes.length} must be a positive multiple of nBits*dim = ${nBits * dim}")
    override def inputTypes = Seq(ArrayType(DoubleType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def nullSafeEval(v: Any): Any =
      LshBucketsKernel.packedBuckets(v.asInstanceOf[ArrayData], planes, dim, nBits)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[]")
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.plans.LshBucketsKernel.packedBuckets($a, $planesRef, $dim, $nBits);")
    }

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def lshBucketPack(v: Column, planes: Array[Double], dim: Int, nBits: Int): Column =
    ColumnBridge.column(LshBucketPack(ColumnBridge.expression(v), planes, dim, nBits))

  /** Smallest table whose nBits-slices of two [[LshBucketPack]] arrays are
    * equal, -1 if none ([[LshBucketsKernel.firstCollidingTable]]). The
    * band join's exactly-once-emission predicate:
    * `firstCollidingTable(a.pk, b.pk) === a.bucket >> 32` keeps ONE of a
    * colliding pair's up-to-nTables shared-bucket join hits, so duplicate
    * emissions never reach a pair-dedup exchange (the q57 grid-block
    * discipline applied to multi-table LSH). */
  case class FirstCollidingTable(left: Expression, right: Expression,
      nBits: Int, nTables: Int)
      extends BinaryExpression with ExpectsInputTypes {
    require(nBits >= 1 && nBits <= 32 && nTables >= 1,
      s"need 1 <= nBits <= 32 (got $nBits) and nTables >= 1 (got $nTables)")
    override def inputTypes =
      Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = IntegerType

    override def nullSafeEval(a: Any, b: Any): Any =
      LshBucketsKernel.firstCollidingTable(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], nBits, nTables)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.plans.LshBucketsKernel.firstCollidingTable($a, $b, $nBits, $nTables);")

    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  def firstCollidingTable(a: Column, b: Column, nBits: Int, nTables: Int): Column =
    ColumnBridge.column(FirstCollidingTable(
      ColumnBridge.expression(a), ColumnBridge.expression(b), nBits, nTables))

  /** Nearest-centroid assignment over a flattened centroid tensor
    * ([[CentroidKernel.nearest]]) — replaces the per-centroid literal
    * column composition whose nlist*dim inlined doubles blow janino's
    * 64 KB method limit at production quantizer sizes (nlist ~ sqrt n). */
  case class NearestCentroid(child: Expression, cents: Array[Double],
      dim: Int, rounded: Boolean)
      extends UnaryExpression with ExpectsInputTypes {
    require(dim >= 1 && cents.length % dim == 0 && cents.nonEmpty,
      s"centroid tensor length ${cents.length} must be a positive multiple of dim $dim")
    override def inputTypes = Seq(ArrayType(DoubleType))
    override def dataType: DataType = IntegerType

    override def nullSafeEval(v: Any): Any =
      CentroidKernel.nearest(v.asInstanceOf[ArrayData], cents, dim, rounded)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val centsRef = ctx.addReferenceObj("centroids", cents, "double[]")
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.plans.CentroidKernel.nearest($a, $centsRef, $dim, $rounded);")
    }

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def nearestCentroid(v: Column, cents: Array[Double], dim: Int,
      rounded: Boolean): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(v), cents, dim, rounded))

  /** IVF probe list — the `nprobe` centroid indices by (dot desc, index
    * asc), [[CentroidKernel.probes]] as a codegen'd expression. */
  case class CentroidProbes(child: Expression, cents: Array[Double],
      dim: Int, nprobe: Int, rounded: Boolean)
      extends UnaryExpression with ExpectsInputTypes {
    require(dim >= 1 && cents.length % dim == 0 && cents.nonEmpty && nprobe >= 1,
      s"centroid tensor length ${cents.length} must be a positive multiple of dim $dim; nprobe $nprobe >= 1")
    override def inputTypes = Seq(ArrayType(DoubleType))
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

    override def nullSafeEval(v: Any): Any =
      CentroidKernel.probes(v.asInstanceOf[ArrayData], cents, dim, nprobe, rounded)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val centsRef = ctx.addReferenceObj("centroids", cents, "double[]")
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.plans.CentroidKernel.probes($a, $centsRef, $dim, $nprobe, $rounded);")
    }

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def centroidProbes(v: Column, cents: Array[Double], dim: Int, nprobe: Int,
      rounded: Boolean): Column =
    ColumnBridge.column(CentroidProbes(ColumnBridge.expression(v), cents, dim,
      nprobe, rounded))

  /** Hamming distance between two packed-bit array<long> columns — one
    * XOR+popcount pass over primitive longs (extra words on the longer
    * side are ignored, mirroring [[DotProduct]]'s min-length rule). The
    * prune predicate of the sign-LSH staged verify: at ~2 words/row this
    * runs over the candidate stream BEFORE any float vector is fetched. */
  case class HammingDistance(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes =
      Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = IntegerType

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var i = 0
      var c = 0
      while (i < n) { c += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i)); i += 1 }
      c
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val c = ctx.freshName("c")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |int $c = 0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $c += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
           |}
           |${ev.value} = $c;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  def hammingDistance(a: Column, b: Column): Column =
    ColumnBridge.column(HammingDistance(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Levenshtein distance via the bit-parallel Myers kernel ([[Lev]]) —
    * same semantics as the built-in `levenshtein` (including the
    * `-1`-beyond-threshold contract of the 3-arg form) but O(text) word
    * ops instead of O(text * band) DP cells for patterns <= 64 chars.
    * `threshold < 0` means unbounded. */
  case class BitParallelLevenshtein(left: Expression, right: Expression, threshold: Int)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType, StringType)
    override def dataType: DataType = IntegerType

    override def nullSafeEval(a: Any, b: Any): Any =
      Lev.dist(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], threshold)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.plans.Lev.dist($a, $b, $threshold);")

    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** The full weighted bibliographic matching score as ONE expression —
    * [[BiblioScoreKernel.score]] over the twenty metadata strings. The
    * equivalent Column tree (~100 Catalyst nodes) was measured at
    * ~4.5 us/pair generated-code overhead on q21's verify, ~9x its three
    * Levenshtein kernels; this keeps the whole score one JIT-compiled
    * method. Never null (null operands score like empty strings, exactly
    * like the tree's `isNotNull && length > 0` guards).
    * BiblioScoreEquivalenceSpec pins kernel == tree bit-exactly. */
  case class BiblioScore(children: Seq[Expression])
      extends Expression with ExpectsInputTypes {
    require(children.length == 20, s"BiblioScore takes 20 inputs, got ${children.length}")
    override def inputTypes = Seq.fill(20)(StringType)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = false
    override def foldable: Boolean = children.forall(_.foldable)

    override def eval(input: InternalRow): Any = {
      val v = new Array[org.apache.spark.unsafe.types.UTF8String](20)
      var i = 0
      while (i < 20) {
        v(i) = children(i).eval(input)
          .asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        i += 1
      }
      BiblioScoreKernel.score(v(0), v(1), v(2), v(3), v(4), v(5), v(6), v(7),
        v(8), v(9), v(10), v(11), v(12), v(13), v(14), v(15), v(16), v(17),
        v(18), v(19))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val evals = children.map(_.genCode(ctx))
      val childCode = evals.map(_.code.toString).mkString("\n")
      val args = evals
        .map(e => s"(${e.isNull} ? null : ${e.value})").mkString(", ")
      ev.copy(
        code = code"""
          |$childCode
          |double ${ev.value} = graft.plans.BiblioScoreKernel.score($args);
          """.stripMargin,
        isNull = FalseLiteral)
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
  }

  def biblioScore(cols: Seq[Column]): Column =
    ColumnBridge.column(BiblioScore(cols.map(ColumnBridge.expression)))

  def lev(a: Column, b: Column): Column =
    ColumnBridge.column(BitParallelLevenshtein(
      ColumnBridge.expression(a), ColumnBridge.expression(b), -1))

  def lev(a: Column, b: Column, threshold: Int): Column =
    ColumnBridge.column(BitParallelLevenshtein(
      ColumnBridge.expression(a), ColumnBridge.expression(b), threshold))

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def minhashSig(hashes: Column, as: Array[Long], bs: Array[Long], prime: Long): Column =
    ColumnBridge.column(MinHashSig(
      ColumnBridge.expression(hashes), as, bs, prime))
}
