package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Perceptual hash of a binary raster payload as ONE codegen'd kernel —
  * the m06 semantics (box-resample the payload viewed as a `rasterW`-wide
  * grayscale raster down to `outDim`×`outDim`, 64-point Walsh–Hadamard
  * transform, sign bits of coefficients 1..60) compiled into the
  * surrounding whole-stage-codegen loop instead of a `mapPartitions`
  * barrier: the scan→hash→window plan stays one codegen span and the
  * expression composes with any other projection.
  *
  * All arithmetic is exact 64-bit integer (box averages are floor
  * divisions, WHT weights are ±1), so the hash is bit-identical to the
  * DuckDB oracle's recomputation. Payloads too short to fill one full box
  * partition (length < rasterW*outDim) hash to NULL — a malformed row
  * degrades, never throws. `outDim >= 8` so coefficients 1..60 exist.
  */
case class WhtPhash(child: Expression, outDim: Int, rasterW: Int)
    extends UnaryExpression {
  require(outDim >= 8 && rasterW >= outDim,
    s"wht_phash: need outDim >= 8 and rasterW >= outDim, got ($outDim, $rasterW)")

  private val PhashBits = 60

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "wht_phash"

  override protected def nullSafeEval(a: Any): Any = {
    val bytes = a.asInstanceOf[Array[Byte]]
    if (bytes.length < rasterW * outDim) null
    else java.lang.Long.valueOf(
      WhtPhash.hash(bytes, outDim, rasterW, PhashBits))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |if ($a.length < ${rasterW * outDim}) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.WhtPhash.hash(
         |    $a, $outDim, $rasterW, $PhashBits);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WhtPhash {
  /** The shared interpreted/codegen kernel (generated code calls this
    * static method — the loops are data-sized, so a Java method the JIT
    * compiles once beats splicing them into every codegen site). */
  def hash(bytes: Array[Byte], outDim: Int, rasterW: Int, bits: Int): Long = {
    val n = outDim * outDim
    val h0 = bytes.length / rasterW
    val sums = new Array[Long](n)
    val counts = new Array[Long](n)
    var yy = 0
    while (yy < h0) {
      val y = yy * outDim / h0
      var xx = 0
      while (xx < rasterW) {
        val k = y * outDim + xx * outDim / rasterW
        sums(k) += bytes(yy * rasterW + xx) & 0xFF
        counts(k) += 1
        xx += 1
      }
      yy += 1
    }
    val px = new Array[Long](n)
    var k = 0
    while (k < n) { px(k) = sums(k) / counts(k); k += 1 }
    var out = 0L
    k = 1
    while (k <= bits) {
      var c = 0L
      var i = 0
      while (i < n) {
        if ((java.lang.Long.bitCount((k & i).toLong) & 1) == 0) c += px(i)
        else c -= px(i)
        i += 1
      }
      if (c > 0) out |= 1L << (k - 1)
      k += 1
    }
    out
  }
}
