package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed byte length of a string — the kernel behind the
  * compression-ratio quality signal (Gopher §A.1.1 uses exactly this:
  * highly compressible text is boilerplate/repetition, incompressible text
  * is noise). One Deflater per eval, fixed level for reproducibility
  * within a JVM; zlib output can differ across zlib builds, so this signal
  * is spec-gated (no cross-engine oracle) by design.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_len"

  // plan-time gate (the NGramTypeCheck rationale): SQL-registered, so a
  // wrong-typed argument would otherwise pass analysis and die mid-job
  // in an anonymous ClassCastException after the Janino fallback
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // NullType accepted alongside StringType (standard Spark expression
      // convention): a literal NULL argument is a null row, not a type bug
      case org.apache.spark.sql.types.StringType |
           org.apache.spark.sql.types.NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"deflate_len requires string, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    DeflateLen.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // a NullType child's generated value is Object-typed, which Janino
    // rejects where UTF8String is expected — the result is constant null
    if (child.dataType == org.apache.spark.sql.types.NullType)
      ev.copy(code = code"""
        |boolean ${ev.isNull} = true;
        |long ${ev.value} = -1L;
        """.stripMargin)
    else
      defineCodeGen(ctx, ev, c => s"graft.functions.DeflateLen.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {
  // one native zlib stream per executor THREAD, reset between rows —
  // allocating and end()ing a Deflater per row put a native malloc/free
  // pair on the per-document hot path. Determinism is unaffected: output
  // depends on the fixed level, not the instance. Daemon threads drop the
  // native handle with the JVM; Deflater also frees it on finalization.
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(java.util.zip.Deflater.BEST_COMPRESSION)
  }

  def compute(s: UTF8String): Long = {
    val in = s.getBytes
    val d = local.get()
    d.reset()
    d.setInput(in)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}
