package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels as Catalyst expressions (C36).
  *
  * The 32×64-centroid geometry the trained IVF-PQ search uses would be
  * ~2048 literal fold expressions per pass if written with
  * zip_with/aggregate — an expression tree Catalyst spends longer
  * analyzing than executing. These two expressions keep the plan one
  * node wide and run the loops in the JVM, with EXACTLY the oracle's
  * fixed-point arithmetic: per-dim squared residuals
  * floor((x−c)²·1e6 + 0.5) summed as long, argmin ties to the lowest
  * centroid index (1-based, matching the SQL k convention).
  *
  * The codebook argument is a foldable nested-array literal
  * (sub → centroid → dims), decoded once per executor thread and
  * cached — per-row work is pure primitive loops over it.
  */
object PqOps {

  private[functions] def decodeCodebooks(cbExpr: Expression): Array[Array[Array[Double]]] = {
    val top = cbExpr.eval(null).asInstanceOf[ArrayData]
    (0 until top.numElements()).map { s =>
      val subArr = top.getArray(s)
      (0 until subArr.numElements()).map { k =>
        subArr.getArray(k).toDoubleArray()
      }.toArray
    }.toArray
  }

  /** fp distance of subvector [off, off+dim) of v to centroid cen. */
  @inline private[functions] def fpDist(v: Array[Double], off: Int,
      cen: Array[Double]): Long = {
    var d = 0L
    var i = 0
    while (i < cen.length) {
      val r = v(off + i) - cen(i)
      d += math.floor(r * r * 1000000 + 0.5).toLong
      i += 1
    }
    d
  }

  /** pq_codes(v, codebooks) → array<int>: per subspace, the 1-based
    * index of the nearest centroid under the fixed-point metric. */
  case class PqCodes(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    @transient private lazy val cb = decodeCodebooks(right)
    override def nullSafeEval(vAny: Any, _cb: Any): Any = {
      val v = vAny.asInstanceOf[ArrayData].toDoubleArray()
      val out = new Array[Any](cb.length)
      var s = 0
      while (s < cb.length) {
        val dim = cb(s)(0).length
        var best = 0; var bestD = Long.MaxValue
        var k = 0
        while (k < cb(s).length) {
          val d = fpDist(v, s * dim, cb(s)(k))
          if (d < bestD) { bestD = d; best = k }
          k += 1
        }
        out(s) = best + 1
        s += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): PqCodes =
      copy(left = l, right = r)
  }

  /** pq_adc_lut(v, codebooks) → array<array<long>>: the per-query ADC
    * lookup table — fixed-point distance from v's subvector s to every
    * centroid k of subspace s. */
  case class PqAdcLut(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType =
      ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
    @transient private lazy val cb = decodeCodebooks(right)
    override def nullSafeEval(vAny: Any, _cb: Any): Any = {
      val v = vAny.asInstanceOf[ArrayData].toDoubleArray()
      val out = new Array[Any](cb.length)
      var s = 0
      while (s < cb.length) {
        val dim = cb(s)(0).length
        val row = new Array[Any](cb(s).length)
        var k = 0
        while (k < cb(s).length) {
          row(k) = fpDist(v, s * dim, cb(s)(k))
          k += 1
        }
        out(s) = new GenericArrayData(row)
        s += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcLut =
      copy(left = l, right = r)
  }
}
