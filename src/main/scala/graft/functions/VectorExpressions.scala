package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Left-fold dot product of two Array[Float] columns in double precision —
  * the hot kernel of every similarity/ANN operator (ops/VectorOps).
  *
  * Why a custom expression: Spark's higher-order functions
  * (`aggregate(zip_with(...))`) are CodegenFallback and allocate a lambda
  * frame per element — ~50× slower on a 64-dim dot product evaluated
  * millions of times in a pair join. This expression compiles to a tight
  * primitive loop inside whole-stage codegen (`doGenCode`), keeping the
  * similarity join fully codegen'd at 100 TB scale.
  *
  * Semantics are IDENTICAL to the HOF form and to DuckDB's
  * `list_reduce(list_transform(...), +)`: per-index float→double widening,
  * strict left-to-right IEEE addition starting at 0.0 — bit-exact results
  * for the oracle compare. Null elements are treated as 0 contribution
  * (embeddings carry no null elements; documented engine contract).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // loud on length mismatch: a silent min() would hand corrupted or
    // mixed-model embeddings a plausible partial dot product — confident
    // wrong similarity scores are strictly worse than a failed job
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"float_vec_dot: length mismatch ${x.numElements()} vs ${y.numElements()}")
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  throw new IllegalArgumentException(
         |    "float_vec_dot: length mismatch " + $x.numElements() + " vs " + $y.numElements());
         |}
         |int $n = $x.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** Argmax-cosine cell assignment against a DRIVER-HELD codebook — the
  * kernel that keeps corpus-proportional clustering (SemDeDup at scale)
  * off the quadratic row-explosion path. A `crossJoin(broadcast(cent))`
  * assignment materializes n×k scored rows before any aggregate can
  * collapse them; with k ∝ n (the sizing that keeps cells constant) that
  * intermediate is n²/perCell rows and dominated the x65 decade
  * measurement (3.0× per sf2 doubling). This expression evaluates the
  * same k cosines as a tight generated loop over a plan-embedded float
  * matrix — one output row per vector, zero extra rows, O(k·dim) flops
  * per row that 32 cores chew through in milliseconds at fixture scale.
  *
  * Literal-tree alternative rejected: `array_max(array(k structs))` (the
  * k-means trainer's shape, fine at k=8) emits k·dim literal nodes —
  * hundreds of thousands of constants at k≈10³ — which overflows the
  * generated method/constant-pool budget and falls back to interpreted.
  * Here the codebook is ONE reference object (`ctx.addReferenceObj`), so
  * generated code size is independent of k.
  *
  * Semantics are bit-identical to the join form the DuckDB oracle
  * mirrors: cos = leftFoldDot(vec, cent_c) / (nrm · cn_c) in IEEE double,
  * winner = highest cos, ties → LOWEST cid (enforced by ascending-cid
  * iteration with a strict `>`). Constructor demands ascending cids,
  * positive norms, and a consistent dim, so a malformed codebook fails at
  * plan time, not as silently wrong cells.
  */
case class NearestCentroid(left: Expression, right: Expression,
                           cids: Array[Long], flat: Array[Float],
                           cns: Array[Double], dim: Int)
    extends BinaryExpression {
  require(cids.nonEmpty, "nearest_centroid: empty codebook")
  require(dim > 0, s"nearest_centroid: dim must be positive (got $dim)")
  require(flat.length == cids.length * dim,
    s"nearest_centroid: flat codebook length ${flat.length} != " +
      s"${cids.length} centroids * $dim dims")
  require(cns.length == cids.length,
    s"nearest_centroid: ${cns.length} norms for ${cids.length} centroids")
  require(cns.forall(_ > 0),
    "nearest_centroid: zero/negative-norm centroid (filter before building)")
  require(cids.zip(cids.tail).forall { case (a, b) => a < b },
    "nearest_centroid: cids must be strictly ascending (tie rule = lowest cid)")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, double), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "nearest_centroid"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val nrm = b.asInstanceOf[Double]
    if (x.numElements() != dim)
      throw new IllegalArgumentException(
        s"nearest_centroid: vector length ${x.numElements()} != codebook dim $dim")
    var best = Double.NegativeInfinity
    var bestId = cids(0)
    var c = 0
    while (c < cids.length) {
      var acc = 0.0
      val off = c * dim
      var i = 0
      while (i < dim) {
        if (!x.isNullAt(i)) acc += x.getFloat(i).toDouble * flat(off + i).toDouble
        i += 1
      }
      val cos = acc / (nrm * cns(c))
      if (cos > best) { best = cos; bestId = cids(c) }
      c += 1
    }
    bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("ncFlat", flat, "float[]")
    val cidsRef = ctx.addReferenceObj("ncCids", cids, "long[]")
    val cnsRef = ctx.addReferenceObj("ncCns", cns, "double[]")
    nullSafeCodeGen(ctx, ev, (x, nrm) => {
      val best = ctx.freshName("best")
      val bestId = ctx.freshName("bestId")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val off = ctx.freshName("off")
      val cos = ctx.freshName("cos")
      s"""
         |if ($x.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "nearest_centroid: vector length " + $x.numElements() + " != codebook dim $dim");
         |}
         |double $best = Double.NEGATIVE_INFINITY;
         |long $bestId = $cidsRef[0];
         |for (int $c = 0; $c < $cidsRef.length; $c++) {
         |  double $acc = 0.0;
         |  int $off = $c * $dim;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if (!$x.isNullAt($i)) {
         |      $acc += (double) $x.getFloat($i) * (double) $flatRef[$off + $i];
         |    }
         |  }
         |  double $cos = $acc / ($nrm * $cnsRef[$c]);
         |  if ($cos > $best) { $best = $cos; $bestId = $cidsRef[$c]; }
         |}
         |${ev.value} = $bestId;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
}
