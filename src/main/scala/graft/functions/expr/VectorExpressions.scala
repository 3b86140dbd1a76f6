package graft.functions.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd dot product over two double arrays.
  *
  * Spark's higher-order functions (`transform`/`zip_with`/`aggregate`)
  * are CodegenFallback — every lambda application is interpreted with
  * boxing, which is the bottleneck of O(n²) similarity stages. This
  * expression emits a tight primitive loop inside whole-stage codegen:
  * on the 64-dim corpus it replaces ~200 interpreted expression evals
  * per pair with 64 fused multiply-adds.
  *
  * Fold order is ascending-index, identical to the sequential
  * left-to-right fold of `aggregate(zip_with(...))` and DuckDB's
  * list_dot_product — bit-for-bit the same result, so swapping the
  * implementation does not disturb the oracle parity contract.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd Hamming distance between two sign-bit signature strings
  * ('0'/'1' chars, see VectorFunctions.signBits): differing positions
  * over the common prefix plus the length difference. Integer-only —
  * the LSH re-rank path that never touches a float. Same
  * codegen-vs-CodegenFallback rationale as DotProduct.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(
      _.dataType == org.apache.spark.sql.types.StringType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hamming expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val y = b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val n = math.min(x.numBytes(), y.numBytes())
    var acc = math.abs(x.numBytes() - y.numBytes())
    var i = 0
    while (i < n) { if (x.getByte(i) != y.getByte(i)) acc += 1; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($a.numBytes(), $b.numBytes());
         |int $acc = Math.abs($a.numBytes() - $b.numBytes());
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getByte($i) != $b.getByte($i)) $acc++;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** L2 normalization in one native pass: out[i] = x[i] / sqrt(Σ x[j]²),
  * the sum folded ascending — bit-identical to the previous
  * sqrt(graft_dot(e,e)) + interpreted `transform(e, x / nrm)`
  * composition (and to the oracle's list_transform over
  * list_dot_product), but one JVM call per row instead of an
  * interpreted lambda eval per ELEMENT. Used by unitEmb, the shared
  * scan under every cosine-based similarity query. CodegenFallback at
  * the row level: the loop body dwarfs one virtual call, and
  * array-returning codegen buys nothing here. */
case class UnitVector(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_unit expects array<double>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val v = x.getDouble(i); ss += v * v; i += 1 }
    val nrm = math.sqrt(ss)
    val out = new Array[Any](n)
    i = 0
    while (i < n) { out(i) = x.getDouble(i) / nrm; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Int8 symmetric scalar quantization in one native pass: returns
  * struct(scale = max |x|, r = round(x / scale * 127) * scale / 127)
  * — the reconstruction the sq8 error query scores. round matches
  * Spark's (and DuckDB's) HALF_UP exactly: BigDecimal.valueOf +
  * setScale(0, HALF_UP), NaN/Infinity passed through — bit-identical
  * to the previous array_max(transform(abs)) + interpreted per-element
  * round composition. */
case class Sq8Recon(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = new org.apache.spark.sql.types.StructType()
    .add("scale", DoubleType, nullable = true)
    .add("r", ArrayType(DoubleType, containsNull = false), nullable = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_sq8 expects array<double>, got ${other.simpleString}")
  }

  private def roundHalfUp(v: Double): Double =
    if (v.isNaN || v.isInfinite) v
    else java.math.BigDecimal.valueOf(v)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n == 0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](null, new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])))
    var scale = x.getDouble(0).abs
    var i = 1
    // same NaN-is-greatest semantics as array_max over abs
    while (i < n) {
      val v = x.getDouble(i).abs
      if (java.lang.Double.compare(v, scale) > 0) scale = v
      i += 1
    }
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) = roundHalfUp(x.getDouble(i) / scale * 127) * scale / 127
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale, new org.apache.spark.sql.catalyst.util.GenericArrayData(out)))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Merge-able quantized vector sum: per group, the elementwise sum of
  * `round(v_i · 1e9)::long` over array<double> rows — the centroid
  * kernel (`sum(round(v*1e9)::long)::double / 1e9 / count`) as ONE
  * aggregate over whole arrays instead of a posexplode to (row × dim)
  * rows. The explode form shuffles N·d rows per k-means round; this
  * buffer shuffles N-row partial sums (map-side combined), a d× cut in
  * exchange volume on every IVF build/split/PQ-train path.
  *
  * Bit-exactness contract: rounding is Spark's own HALF_UP
  * (BigDecimal.valueOf, NaN/Inf rejected by the long conversion the
  * explode form would also throw on under ANSI), and long addition is
  * associative+commutative, so ANY partial-aggregation order yields
  * the identical sums — the same guarantee the per-dim
  * `sum(long)` had. Caller divides by 1e9 and the group count,
  * exactly as before. Empty/absent input → null (a group with no
  * non-null arrays has no centroid). Mixed dims in one group are
  * corrupt input and refuse loudly — the explode form would silently
  * mis-fold them. */
case class VecSumQ(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[Array[Long]]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_vecsum_q expects array<double>, got ${other.simpleString}")
  }

  // the double multiply happens FIRST (identical to the Column form
  // `round(v * 1e9)` computing the product in IEEE double), then
  // Spark's HALF_UP decimal rounding of that product
  private def q(v: Double): Long =
    java.math.BigDecimal.valueOf(v * 1e9)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buffer: Array[Long],
      input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val b = if (buffer.length == 0 && n > 0) new Array[Long](n) else buffer
    require(b.length == n,
      s"graft_vecsum_q: mixed vector dims in one group ($n vs ${b.length})")
    var i = 0
    while (i < n) {
      require(!arr.isNullAt(i), "graft_vecsum_q: null vector element")
      b(i) += q(arr.getDouble(i)); i += 1
    }
    b
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    if (b2.length == 0) return b1
    if (b1.length == 0) return b2
    require(b1.length == b2.length,
      s"graft_vecsum_q: mixed vector dims across partials (${b1.length} vs ${b2.length})")
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any =
    if (buffer.length == 0) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(offset: Int): VecSumQ =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VecSumQ =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): VecSumQ =
    copy(child = c)
}

object VectorExpressions {
  /** Register the SQL-callable forms once per session; idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hamming", exprs => HammingDistance(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_unit", exprs => UnitVector(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sq8", exprs => Sq8Recon(exprs.head), "built-in")
    // a bare AggregateFunction: the analyzer wraps it into its
    // AggregateExpression, same as the built-in agg builders
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vecsum_q", exprs => VecSumQ(exprs.head), "built-in")
  }
}
