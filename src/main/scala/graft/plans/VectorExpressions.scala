package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}
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
  case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
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
    * each re-iterate the hash array. */
  case class MinHashSig(child: Expression, as: Array[Long], bs: Array[Long], prime: Long)
      extends Expression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def children: Seq[Expression] = Seq(child)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) return null
      val hashes = v.asInstanceOf[ArrayData]
      val k = as.length
      val sig = Array.fill(k)(Long.MaxValue)
      val n = hashes.numElements()
      var j = 0
      while (j < n) {
        val h = hashes.getLong(j)
        var i = 0
        while (i < k) {
          val p = (as(i) * h + bs(i)) % prime
          if (p < sig(i)) sig(i) = p
          i += 1
        }
        j += 1
      }
      new GenericArrayData(sig)
    }

    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
      copy(child = c.head)
  }

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def minhashSig(hashes: Column, as: Array[Long], bs: Array[Long], prime: Long): Column =
    ColumnBridge.column(MinHashSig(
      ColumnBridge.expression(hashes), as, bs, prime))
}
