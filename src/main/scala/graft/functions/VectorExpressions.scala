package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions (with `doGenCode`) for the hot vector
  * kernels of the similarity operators — the extension path the engine
  * prefers over Scala UDFs and interpreted higher-order functions
  * (`aggregate(zip_with(...))` lambdas evaluate interpreted per element;
  * these compile into the surrounding whole-stage-codegen loop).
  *
  * Semantics are exact 64-bit integer arithmetic over quantized embedding
  * vectors, so results are bit-identical to the DuckDB oracle's integer
  * SUMs regardless of evaluation order.
  */
case class DotI64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType match {
      case ArrayType(LongType, _) => true; case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>), got " +
        children.map(_.dataType.simpleString).mkString(", "))
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_i64"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sum of squares of an array<bigint> — the squared L2 norm. */
case class NormSqI64(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "normsq_i64"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) { val v = x.getLong(i); acc += v * v; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $v = $a.getLong($i);
         |  $acc += $v * $v;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The deterministic pseudo-random hyperplane family shared by the LSH
  * operators and [[SignBandsI64]]: plane `p`'s component `k` is a
  * splitmix64-style avalanche hash in {-1000..1000} (a linear generator's
  * planes are correlated slices of one arithmetic progression — the
  * round-3 recall bug; see graft.queries.SimilarityOps). The DuckDB
  * oracles replicate these values as literal VALUES rows. */
object GraftPlanes {
  val Dim = 64

  def component(p: Int, k: Int): Long = {
    var z = p.toLong * Dim + k + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    ((z % 2001L) + 2001L) % 2001L - 1000L
  }

  def plane(p: Int): Vector[Long] =
    (0 until Dim).map(k => component(p, k)).toVector
}

/** All LSH band signatures of one quantized vector in ONE pass: the
  * banded sign-LSH construction (`bands` × `rowsPerBand` hyperplanes from
  * [[GraftPlanes]]) as a single codegen'd kernel returning per-band bit
  * patterns (`array<bigint>`, band number = array index, consumed via
  * posexplode). Replaces a tree of bands×rowsPerBand literal-plane
  * `dot_i64` calls: the wide (32×8) construction's 2048 array literals
  * cost seconds of driver-side analysis per invocation and re-read every
  * plane element through Literal ArrayData per row; here the planes live
  * in one flat long[] referenced by the generated loop. */
case class SignBandsI64(child: Expression, numBands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  require(numBands >= 1 && rowsPerBand >= 1 && rowsPerBand <= 62,
    s"sign_bands_i64: need numBands >= 1 and 1 <= rowsPerBand <= 62, " +
      s"got ($numBands, $rowsPerBand)")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_bands_i64"

  /** Flattened plane matrix: plane p's component k at [p*Dim + k]. */
  @transient private lazy val planes: Array[Long] =
    Array.tabulate(numBands * rowsPerBand * GraftPlanes.Dim)(i =>
      GraftPlanes.component(i / GraftPlanes.Dim, i % GraftPlanes.Dim))

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val dim = math.min(GraftPlanes.Dim, x.numElements())
    val out = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var bits = 0L
      var r = 0
      while (r < rowsPerBand) {
        val base = (b * rowsPerBand + r) * GraftPlanes.Dim
        var acc = 0L
        var j = 0
        while (j < dim) { acc += x.getLong(j) * planes(base + j); j += 1 }
        if (acc > 0) bits |= 1L << r
        r += 1
      }
      out(b) = bits
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("signBandsPlanes", planes, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val dim = ctx.freshName("dim")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val r = ctx.freshName("r")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val bits = ctx.freshName("bits")
      val base = ctx.freshName("base")
      s"""
         |int $dim = Math.min(${GraftPlanes.Dim}, $a.numElements());
         |long[] $out = new long[$numBands];
         |for (int $b = 0; $b < $numBands; $b++) {
         |  long $bits = 0L;
         |  for (int $r = 0; $r < $rowsPerBand; $r++) {
         |    int $base = ($b * $rowsPerBand + $r) * ${GraftPlanes.Dim};
         |    long $acc = 0L;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      $acc += $a.getLong($j) * $planesRef[$base + $j];
         |    }
         |    if ($acc > 0) $bits |= 1L << $r;
         |  }
         |  $out[$b] = $bits;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric-distance (ADC) table lookup for product quantization
  * (Jégou et al. 2011, "Product Quantization for Nearest Neighbor
  * Search"): given a vector's PQ `codes` (array<bigint>, one centroid id
  * per subquantizer) and a query's precomputed lookup table `lut`
  * (array<array<bigint>>, lut[m][k] = exact integer dot of the query's
  * m-th subvector with centroid k of subquantizer m), returns
  * Σ_m lut[m][codes[m]] — the approximate query·vector dot product — as
  * one codegen'd loop (the FAISS IVFPQ scan kernel; a per-row
  * interpreted `aggregate(zip_with(...))` here would leave whole-stage
  * codegen on the candidate hot path). Out-of-range codes contribute 0
  * (defensive; assignment never produces them). */
case class PqAdcI64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<array<bigint>>), " +
          s"got ${l.simpleString}, ${r.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc_i64"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val n = math.min(codes.numElements(), lut.numElements())
    var acc = 0L
    var m = 0
    while (m < n) {
      val row = lut.getArray(m)
      val c = codes.getLong(m)
      if (c >= 0 && c < row.numElements()) acc += row.getLong(c.toInt)
      m += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val m = ctx.freshName("m")
      val row = ctx.freshName("row")
      val c = ctx.freshName("c")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $m = 0; $m < $n; $m++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $row = $b.getArray($m);
         |  long $c = $a.getLong($m);
         |  if ($c >= 0 && $c < $row.numElements()) {
         |    $acc += $row.getLong((int) $c);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration: per-session temp functions plus a
  * [[SparkSessionExtensions]] hook (`spark.sql.extensions=graft.functions.
  * GraftExtensions`) so `dot_i64` / `normsq_i64` resolve in plain SQL. */
object GraftFunctions {
  /** Extract a foldable int argument (e.g. `lit(32)`) at build time. */
  private def intArg(e: Expression, fn: String): Int = {
    require(e.foldable, s"$fn: band-shape arguments must be literals")
    e.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: expected an integer literal, got $other")
    }
  }

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_i64" -> (args => DotI64(args(0), args(1))),
    "normsq_i64" -> (args => NormSqI64(args.head)),
    "pq_adc_i64" -> (args => PqAdcI64(args(0), args(1))),
    "sign_bands_i64" -> (args => SignBandsI64(args(0),
      intArg(args(1), "sign_bands_i64"), intArg(args(2), "sign_bands_i64"))),
    "wht_phash" -> (args => WhtPhash(args(0),
      intArg(args(1), "wht_phash"), intArg(args(2), "wht_phash"))),
    "collect_list_capped" -> (args =>
      CollectListCappedI64(args(0), args(1)).toAggregateExpression()),
    "sum_vec_scaled_i64" -> (args =>
      SumVecScaledI64(args(0), args(1)).toAggregateExpression()),
    // Spark ships BloomFilterAggregate / BloomFilterMightContain as
    // INTERNAL-only expressions (used by the runtime-filter optimizer,
    // absent from the public registry) — surface the codegen'd pair under
    // graft names so d09's probe scan stays whole-stage codegen instead of
    // falling back to a scalar udf over a broadcast sketch
    "graft_bloom_agg" -> (args =>
      org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(args(0), args(1), args(2), 0, 0)
        .toAggregateExpression()),
    "graft_might_contain" -> (args =>
      org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(args(0), args(1))),
    "cf_num2date" -> (args => CfNum2Date(args(0),
      strArg(args(1), "cf_num2date"), strArg(args(2), "cf_num2date"))))

  /** Extract a foldable string argument (units/calendar literals). */
  private def strArg(e: Expression, fn: String): String = {
    require(e.foldable, s"$fn: units/calendar arguments must be literals")
    e.eval(null) match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case s: String => s
      case other => throw new IllegalArgumentException(
        s"$fn: expected a string literal, got $other")
    }
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    fns.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }

  def inject(ext: SparkSessionExtensions): Unit =
    fns.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.VectorExpressions", name),
        builder))
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.inject(ext)
}
