package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Token Naive Bayes: hand-computed weights on a tiny corpus, the
  * unseen-token default, the empty-text contract, score exactness
  * (integer micro-nats), and the loud single-class gate.
  */
class ClassifyOpsSpec extends SparkSpec {
  import spark.implicits._

  // pos docs: "good good fine", "good stuff"; neg: "bad bad stuff"
  private val train = Seq(
    (1L, "good good fine", true), (2L, "good stuff", true),
    (3L, "bad bad stuff", false))
    .toDF("doc_id", "text", "pos")

  private def ln(x: Double) = math.log(x)
  private def sl(x: Double) = math.floor(1e6 * ln(x)).toLong

  test("weights match the hand computation (Laplace, micro-nat floor)") {
    val m = ClassifyOps.trainTokenNb(train, "pos")
    val w = m.weights.select("token", "w").as[(String, Long)]
      .collect().toMap
    // n_pos=5, n_neg=3, vocab=4 → denomPos=9, denomNeg=7
    assert(w("good") == sl(4.0 / 9) - sl(1.0 / 7))
    assert(w("bad") == sl(1.0 / 9) - sl(3.0 / 7))
    assert(w("stuff") == sl(2.0 / 9) - sl(2.0 / 7))
    assert(w("fine") == sl(2.0 / 9) - sl(1.0 / 7))
    val c = m.consts.select("w_default", "prior", "vocab")
      .as[(Long, Long, Long)].head()
    assert(c._1 == sl(1.0 / 9) - sl(1.0 / 7))
    assert(c._2 == sl(2.0) - sl(1.0))
    assert(c._3 == 4L)
  }

  test("scoring: seen tokens sum their weights, unseen get the default, " +
      "empty text is one unseen token; every doc appears") {
    val m = ClassifyOps.trainTokenNb(train, "pos")
    val w = m.weights.select("token", "w").as[(String, Long)]
      .collect().toMap
    val c = m.consts.select("w_default", "prior")
      .as[(Long, Long)].head()
    val scored = ClassifyOps.scoreTokenNb(
      Seq((10L, "good bad zzz"), (11L, "")).toDF("doc_id", "text"), m)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(scored(0) == ((10L, 3L,
      c._2 + w("good") + w("bad") + c._1,
      c._2 + w("good") + w("bad") + c._1 > 0)))
    assert(scored(1)._1 == 11L && scored(1)._2 == 1L &&
      scored(1)._3 == c._2 + c._1)
  }

  test("a single-class training set fails loudly") {
    val oneClass = train.filter(col("pos"))
    val e = intercept[IllegalArgumentException] {
      ClassifyOps.trainTokenNb(oneClass, "pos")
    }
    assert(e.getMessage.contains("both classes"))
  }
}
