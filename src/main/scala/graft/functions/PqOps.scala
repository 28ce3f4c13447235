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

  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  private[functions] def decodeCodebooks(cbExpr: Expression): Array[Array[Array[Double]]] = {
    val top = cbExpr.eval(null).asInstanceOf[ArrayData]
    (0 until top.numElements()).map { s =>
      val subArr = top.getArray(s)
      (0 until subArr.numElements()).map { k =>
        subArr.getArray(k).toDoubleArray()
      }.toArray
    }.toArray
  }

  /** Subvector start offset per subspace — CUMULATIVE widths, so
    * codebooks with non-uniform subspace dims slice the right vector
    * range (the old `s * dim` used the current subspace's width for
    * every predecessor — silently wrong slices the moment widths
    * differ; r10 review finding). */
  private[functions] def subOffsets(cb: Array[Array[Array[Double]]]): Array[Int] =
    cb.scanLeft(0)((acc, sub) => acc + sub(0).length).init

  /** The codebook argument must be a literal: [[decodeCodebooks]]
    * evals it with a null input row ONCE and caches — a real column
    * there would either throw or silently freeze one arbitrary row's
    * value for the whole query (r10 review finding). */
  private[functions] def requireFoldableCodebooks(name: String,
      right: Expression): TypeCheckResult =
    if (right.foldable) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name codebooks must be a foldable literal (decoded once per executor), " +
        s"got ${right.sql}")

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
    override def checkInputDataTypes(): TypeCheckResult =
      requireFoldableCodebooks("pq_codes", right)
    @transient private lazy val cb = decodeCodebooks(right)
    @transient private lazy val offs = subOffsets(cb)
    override def nullSafeEval(vAny: Any, _cb: Any): Any = {
      val v = vAny.asInstanceOf[ArrayData].toDoubleArray()
      val out = new Array[Any](cb.length)
      var s = 0
      while (s < cb.length) {
        var best = 0; var bestD = Long.MaxValue
        var k = 0
        while (k < cb(s).length) {
          val d = fpDist(v, offs(s), cb(s)(k))
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
    override def checkInputDataTypes(): TypeCheckResult =
      requireFoldableCodebooks("pq_adc_lut", right)
    @transient private lazy val cb = decodeCodebooks(right)
    @transient private lazy val offs = subOffsets(cb)
    override def nullSafeEval(vAny: Any, _cb: Any): Any = {
      val v = vAny.asInstanceOf[ArrayData].toDoubleArray()
      val out = new Array[Any](cb.length)
      var s = 0
      while (s < cb.length) {
        val row = new Array[Any](cb(s).length)
        var k = 0
        while (k < cb(s).length) {
          row(k) = fpDist(v, offs(s), cb(s)(k))
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
