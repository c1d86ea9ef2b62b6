package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bigram-LM scoring: hand-computed surprisals on a tiny corpus, the two
  * backoff tiers, the no-evidence exclusion, and the ModelIO round-trip
  * (load-then-score ≡ train-then-score bit-for-bit).
  */
class LmOpsSpec extends SparkSpec {
  import spark.implicits._

  // "a b a b": bigrams (a b), (b a), (a b) → n2(a b)=2, n2(b a)=1;
  // prefix counts n1(a)=2, n1(b)=1; vocab V = {a, b} = 2.
  private lazy val corpus = Seq((0L, "a b a b")).toDF("doc_id", "text")
  private lazy val model = LmOps.trainBigramLm(corpus).localCheckpoint()

  private def nll(num: Double, den: Double): Long =
    math.floor(math.log(num / den) * 1000000).toLong

  test("trained model carries hand-checked counts and surprisals") {
    val rows = model.orderBy("s").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a b", "b a"))
    val ab = rows(0)
    assert(ab.getAs[Long]("n2") == 2L && ab.getAs[Long]("n1") == 2L &&
      ab.getAs[Long]("v") == 2L)
    // -ln p(b|a) = ln((n1+V)/(n2+1)) = ln(4/3)
    assert(ab.getAs[Long]("nll_scaled") == nll(4d, 3d))
    val ba = rows(1)
    assert(ba.getAs[Long]("n2") == 1L && ba.getAs[Long]("n1") == 1L)
    assert(ba.getAs[Long]("nll_scaled") == nll(3d, 2d))
  }

  test("same-corpus score sums quantized surprisals exactly") {
    val r = LmOps.scoreBigramNll(corpus, model).collect()
    assert(r.length == 1)
    val sum = 2 * nll(4d, 3d) + nll(3d, 2d)
    assert(r(0).getAs[Long]("n_bigrams") == 3L)
    assert(r(0).getAs[Long]("nll_sum") == sum)
    assert(r(0).getAs[Long]("avg_nll_scaled") ==
      math.floor(sum.toDouble / 3d).toLong)
  }

  test("unseen bigram with seen prefix backs off to the smoothed tail") {
    // "a a": prefix a seen (n1=2, V=2) → nll = ln((2+2)/1) = ln 4
    val r = LmOps.scoreBigramNll(Seq((7L, "a a")).toDF("doc_id", "text"),
      model).collect()
    assert(r.length == 1 && r(0).getAs[Long]("nll_sum") == nll(4d, 1d))
  }

  test("unseen prefix backs off to uniform 1/V") {
    val r = LmOps.scoreBigramNll(Seq((8L, "z q")).toDF("doc_id", "text"),
      model).collect()
    assert(r.length == 1 && r(0).getAs[Long]("nll_sum") == nll(2d, 1d))
  }

  test("docs shorter than two tokens emit no row") {
    val r = LmOps.scoreBigramNll(
      Seq((1L, "solo"), (2L, "")).toDF("doc_id", "text"), model)
    assert(r.count() == 0L)
  }

  test("bigram LM round-trips through ModelIO bit-for-bit") {
    val docs = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "the cat ran off the mat"),
      (2L, "a dog sat on a log")).toDF("doc_id", "text")
    val trained = LmOps.trainBigramLm(docs).localCheckpoint()
    val path = Files.createTempDirectory("graft-lm").resolve("m").toString
    ModelIO.saveBigramLm(trained, path)
    val loaded = ModelIO.loadBigramLm(spark, path)
    val score = Seq((9L, "the dog sat on the log unseen"), (10L, "zz yy"))
      .toDF("doc_id", "text")
    val fresh = LmOps.scoreBigramNll(score, trained).orderBy("doc_id").collect()
    val replay = LmOps.scoreBigramNll(score, loaded).orderBy("doc_id").collect()
    assert(fresh.toSeq == replay.toSeq,
      "persisted LM scored differently from the trained one")
  }

  test("loadBigramLm rejects a non-LM artifact") {
    val path = Files.createTempDirectory("graft-lm-bad").resolve("m").toString
    Seq((1L, "x")).toDF("a", "b").write.parquet(path)
    val e = intercept[IllegalArgumentException](ModelIO.loadBigramLm(spark, path))
    assert(e.getMessage.contains("expected artifact"))
  }
}
