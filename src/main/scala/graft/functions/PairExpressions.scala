package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All ordered pairs of an array<struct<id: long, n: long>> (sorted by id
  * upstream via sort_array) as array<struct<i, an, j, bn>> — the pair
  * enumeration inside a dedup bucket (same-shingle docs, same-LSH-band
  * docs) as ONE tight loop per bucket instead of a nested higher-order
  * `transform`/`slice`/`flatten` (interpreted lambda per generated element,
  * the difference is ~2× on pair-heavy plans). Downstream `explode` of the
  * result stays in whole-stage codegen, as does this via the static call.
  *
  * Quadratic by construction — identical cardinality to the equivalent
  * self-join. Callers in DedupOps bound bucket sizes (`maxBucket` filter
  * before this expression evaluates); as a backstop, `compute` checks the
  * pair count in Long arithmetic and fails loudly — never allocates a
  * negative/overflowed array — if an unbounded caller feeds it a bucket
  * over 65,535 docs (the largest whose pair count fits an array).
  */
case class DocPairs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("an", LongType, nullable = false),
    StructField("j", LongType, nullable = false),
    StructField("bn", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "doc_pairs"

  override protected def nullSafeEval(input: Any): Any =
    DocPairs.compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DocPairs.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): DocPairs =
    copy(child = newChild)
}

object DocPairs {
  def compute(arr: ArrayData): GenericArrayData = {
    val m = arr.numElements()
    val pairs = m.toLong * (m - 1L) / 2L
    if (pairs > Int.MaxValue) {
      throw new IllegalArgumentException(
        s"doc_pairs: bucket of $m rows yields $pairs pairs (exceeds array " +
          "capacity); cap bucket sizes upstream (DedupOps maxBucket)")
    }
    val ids = new Array[Long](m)
    val ns = new Array[Long](m)
    var x = 0
    while (x < m) {
      val row = arr.getStruct(x, 2)
      ids(x) = row.getLong(0)
      ns(x) = row.getLong(1)
      x += 1
    }
    val out = new Array[Any](pairs.toInt)
    var idx = 0
    var a = 0
    while (a < m) {
      var b = a + 1
      while (b < m) {
        out(idx) = new GenericInternalRow(
          Array[Any](ids(a), ns(a), ids(b), ns(b))): InternalRow
        idx += 1
        b += 1
      }
      a += 1
    }
    new GenericArrayData(out)
  }
}
