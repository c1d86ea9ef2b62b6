package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, NullType}

/** The repo's 60-bit deterministic hash — `hash60` — as ONE fused
  * codegen'd kernel (r20, guide §4 "expressions and codegen").
  *
  * Value contract (unchanged, the cross-engine convention every oracle
  * mirrors): the first 15 hex chars of `md5(bytes)` read as a base-16
  * BIGINT — i.e. the first 60 bits of the digest. The previous spelling,
  * `conv(substring(md5(c), 1, 15), 16, 10)`, materialized a 32-char hex
  * UTF8String per eval, substringed it, and radix-parsed the result —
  * three throwaway allocations per shingle/position/id occurrence, in
  * the hottest per-row path the engine has (span dedup evaluates it per
  * token position, the samplers per corpus row, DSIR per n-gram
  * occurrence). This kernel takes the digest's first 8 bytes as a
  * big-endian long shifted right 4 bits — bit-identical, zero
  * intermediate strings. Equality with the old spelling is
  * property-tested (`Hash60Spec`).
  *
  * Null contract: null in, null out (the md5/conv chain's behavior).
  */
case class Hash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  // the conv(...) chain this replaces reported nullable=true; keep the
  // schema byte-identical for the oracle's schema compare
  override def nullable: Boolean = true
  override def prettyName: String = "hash60"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hash60 requires binary input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(bytes: Any): Any =
    Hash60.compute(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    if (child.dataType == NullType)
      ev.copy(code = code"""
        |boolean ${ev.isNull} = true;
        |long ${ev.value} = -1L;
        """.stripMargin)
    else
      nullSafeCodeGen(ctx, ev, b =>
        s"${ev.value} = graft.functions.Hash60.compute($b);")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

object Hash60 {
  // MessageDigest.getInstance allocates (provider lookup + state) —
  // per-thread reuse keeps the per-row cost to digest+reset. MD5 state
  // is 16 bytes; one instance per executor thread is bounded.
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes) as a non-negative long — exactly
    * `conv(substring(md5(bytes), 1, 15), 16, 10)`.
    */
  def compute(bytes: Array[Byte]): Long = {
    val md = md5.get()
    md.reset()
    val d = md.digest(bytes)
    // first 8 digest bytes big-endian, dropping the low nibble (16 hex
    // chars → 15): identical to parsing hex[0..14] base-16
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }
}
