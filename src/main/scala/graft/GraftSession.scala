package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** SparkSessionExtensions injector: registers every custom expression for
  * SQL use. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or through
  * `GraftSession.builder()`. The idiomatic extension point — works with a
  * plain spark-submit too, no GraftSession required.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("base58_encode"),
      info("base58_encode", "base58_encode(bin) - bitcoin-alphabet base58 string"),
      (es: Seq[Expression]) => Base58Encode(es.head)))
    ext.injectFunction((FunctionIdentifier("base58_decode"),
      info("base58_decode", "base58_decode(str) - bytes, null on bad alphabet"),
      (es: Seq[Expression]) => Base58Decode(es.head)))
    ext.injectFunction((FunctionIdentifier("keccak256"),
      info("keccak256", "keccak256(bin) - 32-byte Keccak-256 digest"),
      (es: Seq[Expression]) => Keccak256(es.head)))
    ext.injectFunction((FunctionIdentifier("u256_to_decimal"),
      info("u256_to_decimal", "u256_to_decimal(bin32) - DECIMAL(38,0), null on overflow"),
      (es: Seq[Expression]) => U256ToDecimal(es.head)))
    ext.injectFunction((FunctionIdentifier("u256_to_string"),
      info("u256_to_string", "u256_to_string(bin32) - decimal string"),
      (es: Seq[Expression]) => U256ToString(es.head)))
    ext.injectFunction((FunctionIdentifier("u256_from_string"),
      info("u256_from_string", "u256_from_string(str) - 32-byte big-endian binary"),
      (es: Seq[Expression]) => U256FromString(es.head)))
    ext.injectFunction((FunctionIdentifier("float_vec_dot"),
      info("float_vec_dot", "float_vec_dot(a, b) - left-fold double dot product"),
      (es: Seq[Expression]) => FloatVecDot(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("char_ngrams"),
      info("char_ngrams", "char_ngrams(str, n) - distinct character n-grams"),
      (es: Seq[Expression]) => CharNGrams(es.head, foldToInt(es(1)))))
    ext.injectFunction((FunctionIdentifier("word_ngrams"),
      info("word_ngrams", "word_ngrams(str, n) - distinct word n-grams"),
      (es: Seq[Expression]) => WordNGrams(es.head, foldToInt(es(1)))))
    ext.injectFunction((FunctionIdentifier("md5_bottom_k"),
      info("md5_bottom_k", "md5_bottom_k(arr, k) - k smallest md5 digests, concat"),
      (es: Seq[Expression]) => Md5BottomK(es.head, foldToInt(es(1)))))
    ext.injectFunction((FunctionIdentifier("deflate_len"),
      info("deflate_len", "deflate_len(str) - DEFLATE-compressed byte length"),
      (es: Seq[Expression]) => DeflateLen(es.head)))
  }

  private def foldToInt(e: Expression): Int = e.eval(null) match {
    case i: Int  => i
    case l: Long => l.toInt
    case other   => throw new IllegalArgumentException(
      s"expected integer literal, got $other")
  }
}

/** Engine session bootstrap: the scale-posture defaults every entry point
  * (Verify, Bench, user apps) shares. local[*] here is the test harness —
  * on a cluster the same settings ride on whatever master the submit
  * provides.
  */
object GraftSession {
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              shufflePartitions: Int =
                sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts is parquet TIMESTAMP(NANOS); Spark has no nanos type —
      // read as long, Tables.load rebuilds the timestamp.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // Spark-default AQE coalescing (parallelismFirst=true): never shrink a
      // post-shuffle stage below the cluster's parallelism. Round 1 set this
      // to false, which coalesced every small-SF shuffle to ONE partition and
      // serialized the compute-heavy pair/kernel stages (x21-x24) through a
      // single task; at 100 TB partitions are data-sized either way, so the
      // default is both the local and the cluster posture.

  def getOrCreate(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
