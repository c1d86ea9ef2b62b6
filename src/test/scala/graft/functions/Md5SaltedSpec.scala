package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{DedupOps, TextOps}

/** The r21 binary MinHash-band fast path must pick EXACTLY the winners
  * the hex spelling picked: band signatures decide which documents ever
  * meet in the LSH bucket stage, so a divergent min would silently move
  * candidate pairs on every dedup query at once. Three layers of proof:
  *
  *  1. value: `hex(md5Salted(p, s)) == md5(concat(p, s))` over
  *     adversarial strings (the digest bytes are the hex string's bytes);
  *  2. ordering: DataFrame `min` over raw digests == `unhex(min(hex))`
  *     over a bulk column — binary unsigned-lexicographic order equals
  *     hex-string order (md5 bytes routinely carry the high bit, so a
  *     SIGNED byte comparison would fail this instantly);
  *  3. end to end: `minhashBands`' binary sig hex-encodes to exactly the
  *     old concat-of-hex-strings sig, row for row.
  */
class Md5SaltedSpec extends SparkSpec {

  private val adversarial = Seq("", " ", "a", "0", "the quick brown fox",
    "w1 shingle text 7", "café résumé", "日本語の文", "𝄞 clef",
    "a|b|c", "0x00", "\r\n\t", "x" * 4096)

  test("md5Salted equals unhex of the md5(concat) oracle spelling") {
    for (p <- Seq("", "0|", "15|", "sal|t"); s <- adversarial) {
      val row = spark.range(1).select(
        lower(hex(TextOps.md5Salted(p, lit(s)))).as("nw"),
        md5(concat(lit(p), lit(s))).as("od")).head()
      assert(row.getString(0) == row.getString(1),
        s"diverged on salt='$p' s='$s'")
    }
    val nulls = spark.range(1)
      .select(TextOps.md5Salted("7|", lit(null).cast("string")).as("h"))
      .head()
    assert(nulls.isNullAt(0))
  }

  test("min over raw digests picks the same winner as min over hex") {
    val df = spark.range(5000).select((col("id") % 17).as("g"),
      concat(lit("w"), col("id"), lit(" shingle "), col("id") * 31).as("s"))
    val agg = df.groupBy("g").agg(
      lower(hex(min(TextOps.md5Salted("3|", col("s"))))).as("nw"),
      min(md5(concat(lit("3|"), col("s")))).as("od"))
    assert(agg.filter(col("nw") =!= col("od")).count() == 0)
  }

  test("minhashBands binary sig hex-encodes to the old hex-concat sig") {
    val docs = spark.range(200).select(col("id").as("doc_id"),
      concat(lit("doc "), col("id"), lit(" shared body text plus "),
        col("id") % 5).as("text"))
    val sh = TextOps.charShingles(col("text"), 4)
    val nw = DedupOps.minhashBands(docs, "doc_id", sh, 8, 2)
      .select(col("id"), col("band"), lower(hex(col("sig"))).as("sig"))
    // the pre-r21 spelling, inlined verbatim
    val mins = (0 until 8).map(h =>
      min(md5(concat(lit(h), lit("|"), col("s")))).as(s"m$h"))
    val sigs = docs.select(col("doc_id").as("id"), explode(sh).as("s"))
      .groupBy(col("id")).agg(mins.head, mins.tail: _*)
    val bandStructs = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        concat((0 until 2).map(r => col(s"m${b * 2 + r}")): _*).as("sig"))
    }
    val od = sigs.select(col("id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    assert(nw.exceptAll(od).count() == 0 && od.exceptAll(nw).count() == 0)
  }
}
