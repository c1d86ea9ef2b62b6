package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.SparkSpec
import graft.ops.TextOps

/** The r20 fused hash60 kernel must be BIT-IDENTICAL to the spelling
  * every DuckDB oracle mirrors: `conv(substring(md5(c), 1, 15), 16, 10)`.
  * A silent divergence here would flip every sampler's keep set, every
  * span boundary, and every DSIR bucket at once — so the equivalence is
  * checked over adversarial strings (empty, multi-byte UTF-8, an
  * astral-plane codepoint, digest edge shapes) and a 5000-row bulk
  * column, not spot-checked.
  */
class Hash60Spec extends SparkSpec {

  private def oldHash(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  test("hash60 equals the md5/conv oracle spelling on adversarial strings") {
    val cases = Seq("", " ", "a", "0", "the quick brown fox",
      "w1 shingle text 7", "café résumé",
      "日本語の文", "𝄞 clef",
      "a|b|c", "0x00", "\r\n\t", "x" * 4096)
    cases.foreach { s =>
      val row = spark.range(1).select(
        TextOps.hash60(lit(s)).as("nw"), oldHash(lit(s)).as("od"))
        .head()
      assert(row.getLong(0) == row.getLong(1), s"diverged on '$s'")
    }
  }

  test("hash60 matches on a bulk corpus-shaped column and handles null") {
    val df = spark.range(5000).select(
      concat(lit("w"), col("id"), lit(" shingle text "), col("id") * 7)
        .as("s"))
    val n = df.select(TextOps.hash60(col("s")).as("nw"),
        oldHash(col("s")).as("od"))
      .filter(col("nw") =!= col("od")).count()
    assert(n == 0)
    val nulls = spark.range(1)
      .select(TextOps.hash60(lit(null).cast("string")).as("h"))
      .head()
    assert(nulls.isNullAt(0))
  }
}
