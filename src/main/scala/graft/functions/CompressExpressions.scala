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

/** gzip-compress a string's UTF-8 bytes into one gzip member — the
  * producer side of the `.warc.gz` tier (fixtures, tests, and sinks
  * that ship gzip members). Pure JDK (`GZIPOutputStream` — NOT
  * jar-gated like Delta/Iceberg); deterministic: the JDK writes
  * MTIME=0 and fixed flags, so equal inputs give equal bytes within a
  * JDK, and every consumer round-trips through [[GunzipToString]]
  * rather than comparing raw members across JVMs.
  */
case class GzipBytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "gzip_bytes"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType |
           org.apache.spark.sql.types.NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    GzipBytes.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (child.dataType == org.apache.spark.sql.types.NullType)
      ev.copy(code = code"""
        |boolean ${ev.isNull} = true;
        |byte[] ${ev.value} = null;
        """.stripMargin)
    else
      defineCodeGen(ctx, ev, c => s"graft.functions.GzipBytes.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): GzipBytes =
    copy(child = newChild)
}

object GzipBytes {
  def compute(s: UTF8String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(256)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(s.getBytes)
    gz.close()
    bos.toByteArray
  }
}

/** Decompress a gzip STREAM — including the concatenated-member form a
  * real `.warc.gz` ships (one gzip member per WARC record; the JDK's
  * `GZIPInputStream` reads successive members transparently) — to a
  * string. Malformed input decodes to NULL rather than failing the
  * job: at 100 TB a corrupt member must surface as a filterable NULL
  * row (the WarcOps `length_ok` self-diagnosis class), not kill the
  * stage. Pure JDK; the byte-faithful entry the r15 string-tier WARC
  * parser documented as its boundary (`WarcOps` scaladoc).
  */
case class GunzipToString(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def nullable: Boolean = true
  override def prettyName: String = "gunzip_to_string"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.BinaryType |
           org.apache.spark.sql.types.NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires binary, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    GunzipToString.compute(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (child.dataType == org.apache.spark.sql.types.NullType)
      ev.copy(code = code"""
        |boolean ${ev.isNull} = true;
        |UTF8String ${ev.value} = null;
        """.stripMargin)
    else
      // compute() returns null for malformed input — explicit re-check
      // (the CanonicalizeUrl nullSafeCodeGen pattern)
      nullSafeCodeGen(ctx, ev, c => s"""
        |${ev.value} = graft.functions.GunzipToString.compute($c);
        |${ev.isNull} = (${ev.value} == null);
        """.stripMargin)
  override protected def withNewChildInternal(newChild: Expression): GunzipToString =
    copy(child = newChild)
}

object GunzipToString {
  def compute(bytes: Array[Byte]): UTF8String = {
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val bos = new java.io.ByteArrayOutputStream(
        math.max(256, bytes.length * 4))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        bos.write(buf, 0, n)
        n = in.read(buf)
      }
      in.close()
      UTF8String.fromBytes(bos.toByteArray)
    } catch {
      case _: java.io.IOException => null
    }
  }
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
