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

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.sqlFunctions.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
}

/** THE canonical SQL-function list — both registration channels (the
  * session-extension injector above and `GraftFunctions.register`'s
  * temp-function path) iterate this one table, so they cannot drift (they
  * did: register() was missing four functions the extension served).
  */
object GraftExtensions {
  private def foldToInt(e: Expression): Int = e.eval(null) match {
    case i: Int  => i
    case l: Long => l.toInt
    case other   => throw new IllegalArgumentException(
      s"expected integer literal, got $other")
  }

  val sqlFunctions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("base58_encode", "base58_encode(bin) - bitcoin-alphabet base58 string",
      es => Base58Encode(es.head)),
    ("base58_decode", "base58_decode(str) - bytes, null on bad alphabet",
      es => Base58Decode(es.head)),
    ("keccak256", "keccak256(bin) - 32-byte Keccak-256 digest",
      es => Keccak256(es.head)),
    ("u256_to_decimal", "u256_to_decimal(bin32) - DECIMAL(38,0), null on overflow",
      es => U256ToDecimal(es.head)),
    ("u256_to_string", "u256_to_string(bin32) - decimal string",
      es => U256ToString(es.head)),
    ("u256_from_string", "u256_from_string(str) - 32-byte big-endian binary",
      es => U256FromString(es.head)),
    ("float_vec_dot", "float_vec_dot(a, b) - left-fold double dot product",
      es => FloatVecDot(es.head, es(1))),
    ("char_ngrams", "char_ngrams(str, n) - distinct character n-grams",
      es => CharNGrams(es.head, foldToInt(es(1)))),
    ("word_ngrams", "word_ngrams(str, n) - distinct word n-grams",
      es => WordNGrams(es.head, foldToInt(es(1)))),
    ("md5_bottom_k", "md5_bottom_k(arr, k) - k smallest md5 digests, concat",
      es => Md5BottomK(es.head, foldToInt(es(1)))),
    ("deflate_len", "deflate_len(str) - DEFLATE-compressed byte length",
      es => DeflateLen(es.head)))
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
