package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
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
  * `minRatioBp` > 0 applies the classic similarity-join LENGTH FILTER at
  * the source: Jaccard(A,B) ≤ min(|A|,|B|)/max(|A|,|B|), so a pair whose
  * size ratio is below the threshold can never qualify and is never
  * emitted — an EXACT prune (~40% of candidate pairs on a typical corpus)
  * that shrinks the pair shuffle before it exists.
  *
  * Quadratic by construction — identical cardinality to the equivalent
  * self-join. Callers in DedupOps bound bucket sizes (`maxBucket` filter
  * before this expression evaluates); as a backstop, `compute` checks the
  * pair count in Long arithmetic and fails loudly — never allocates a
  * negative/overflowed array — if an unbounded caller feeds it a bucket
  * over 65,535 docs (the largest whose pair count fits an array).
  */
case class DocPairs(child: Expression, minRatioBp: Long = 0L)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("an", LongType, nullable = false),
    StructField("j", LongType, nullable = false),
    StructField("bn", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "doc_pairs"

  override protected def nullSafeEval(input: Any): Any =
    DocPairs.compute(input.asInstanceOf[ArrayData], minRatioBp)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DocPairs.compute($c, ${minRatioBp}L)")
  override protected def withNewChildInternal(newChild: Expression): DocPairs =
    copy(child = newChild)
}

object DocPairs {
  def compute(arr: ArrayData, minRatioBp: Long): GenericArrayData = {
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
    val out = new ArrayBuffer[Any](if (pairs < 64L) pairs.toInt else 64)
    var a = 0
    while (a < m) {
      var b = a + 1
      while (b < m) {
        val lo = math.min(ns(a), ns(b))
        val hi = math.max(ns(a), ns(b))
        if (minRatioBp <= 0L || lo * 10000L >= minRatioBp * hi) {
          out += (new GenericInternalRow(
            Array[Any](ids(a), ns(a), ids(b), ns(b))): InternalRow)
        }
        b += 1
      }
      a += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** SimHash pair enumeration inside a (chunk, value) blocking bucket,
  * emitting each qualifying pair EXACTLY ONCE across all buckets — the
  * canonical-chunk rule: a pair (whose codes agree on ≥1 of the
  * `chunks` disjoint bit ranges whenever its Hamming distance ≤
  * chunks−1) is emitted only from the bucket of the FIRST chunk the two
  * codes agree on. That makes the pair stream globally distinct, so the
  * downstream per-pair dedup shuffle the naive plan needs disappears —
  * the whole operator becomes scan → one shuffle → kernel → result.
  *
  * The Hamming filter runs inside the kernel too (bit_count of the xor),
  * so only final result rows ever leave the bucket.
  *
  * Input: array<struct<id: long, code: long>> (sorted by id) + the
  * bucket's chunk index. Output: array<struct<i, j, ham>>.
  * `chunks == 1` is the degenerate all-pairs mode (maxHamming ≥ 60):
  * every pair within distance is emitted from the single bucket.
  */
case class SimhashChunkPairs(left: Expression, right: Expression,
                             chunks: Int, maxHamming: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("j", LongType, nullable = false),
    StructField("ham", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "simhash_chunk_pairs"

  override protected def nullSafeEval(ds: Any, ck: Any): Any =
    SimhashChunkPairs.compute(ds.asInstanceOf[ArrayData],
      ck.asInstanceOf[Int], chunks, maxHamming)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (ds, ck) =>
      s"graft.functions.SimhashChunkPairs.compute($ds, $ck, $chunks, $maxHamming)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimhashChunkPairs =
    copy(left = newLeft, right = newRight)
}

object SimhashChunkPairs {
  def compute(arr: ArrayData, ck: Int, chunks: Int, maxHamming: Int): GenericArrayData = {
    val m = arr.numElements()
    val ids = new Array[Long](m)
    val codes = new Array[Long](m)
    var x = 0
    while (x < m) {
      val row = arr.getStruct(x, 2)
      ids(x) = row.getLong(0)
      codes(x) = row.getLong(1)
      x += 1
    }
    // chunk masks over the 60-bit code (same split as the blocking keys)
    val masks = new Array[Long](chunks)
    var k = 0
    while (k < chunks) {
      val lo = k * 60 / chunks
      val width = (k + 1) * 60 / chunks - lo
      masks(k) = ((1L << width) - 1L) << lo
      k += 1
    }
    val out = new ArrayBuffer[Any]()
    var a = 0
    while (a < m) {
      var b = a + 1
      while (b < m) {
        val xor = codes(a) ^ codes(b)
        val ham = java.lang.Long.bitCount(xor)
        if (ham <= maxHamming) {
          var first = -1
          var c = 0
          while (first < 0 && c < chunks) {
            if ((xor & masks(c)) == 0L) first = c
            c += 1
          }
          // chunks == 1: degenerate all-pairs bucket — emit unconditionally
          if (chunks == 1 || first == ck) {
            out += (new GenericInternalRow(
              Array[Any](ids(a), ids(b), ham.toLong)): InternalRow)
          }
        }
        b += 1
      }
      a += 1
    }
    new GenericArrayData(out.toArray)
  }
}
