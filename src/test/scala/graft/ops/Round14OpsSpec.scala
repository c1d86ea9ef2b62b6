package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-14 wave 1: the advisory-hardening fixes — token-budget mixture
  * absent-domain semantics, the winnow position-pad guard, and the
  * knn-label-noise label-domain validation.
  */
class Round14OpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenBudgetMixture: a weighted domain ABSENT from the corpus " +
      "zeroes T — the mix goes empty, never silently reweighted") {
    val docs = Seq((1L, "a", 100L), (2L, "a", 50L), (3L, "b", 30L))
      .toDF("doc_id", "dom", "n_tok")
    // domain 'c' is weighted but has no corpus rows: T = min(.., 0/0.2)=0
    val kept = SampleOps.tokenBudgetMixture(docs, "doc_id", "dom", "n_tok",
      Seq("a" -> 0.5, "b" -> 0.3, "c" -> 0.2))
    assert(kept.count() == 0L,
      "an infeasible mix (weighted domain with zero tokens) must be empty")
    // control: same corpus, feasible weights → non-empty
    val ok = SampleOps.tokenBudgetMixture(docs, "doc_id", "dom", "n_tok",
      Seq("a" -> 0.7, "b" -> 0.3))
    assert(ok.count() > 0L)
  }

  test("mixtureSample: a weighted domain ABSENT from the corpus zeroes " +
      "T — same loud-empty contract as tokenBudgetMixture") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "src")
    val kept = SampleOps.mixtureSample(docs, "doc_id", "src",
      Seq("a" -> 0.5, "b" -> 0.3, "zz_typo" -> 0.2))
    assert(kept.count() == 0L,
      "a typo'd domain must not yield a silently reweighted mix")
    val ok = SampleOps.mixtureSample(docs, "doc_id", "src",
      Seq("a" -> 0.7, "b" -> 0.3))
    assert(ok.count() > 0L)
  }

  test("winnowFingerprints: a doc at the position-pad limit fails " +
      "LOUDLY instead of silently misordering the window-min key") {
    // 12 words, k=3 → 10 gram positions (0..9); posLimit=9 triggers
    val docs = Seq(
      (1L, "a b c d e f g h i j k l")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      TextOps.winnowFingerprints(docs, "doc_id", k = 3, w = 4,
        posLimit = 9L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++
        Option(x.getCause).toSeq.flatMap(msgs))
    assert(msgs(e).exists(_.contains("gram positions")),
      s"expected the pad-guard message, got: $e")
    // AT the limit: exactly posLimit grams still fit the pad (positions
    // 0..posLimit−1) — no spurious rejection at the boundary
    assert(TextOps.winnowFingerprints(docs, "doc_id", k = 3, w = 4,
      posLimit = 10L).count() > 0L)
  }

  test("knnLabelNoise: a non-numeric label column fails at plan time") {
    val e = Seq((1L, Seq(1.0f, 0.0f), "cat"), (2L, Seq(0.9f, 0.1f), "dog"))
      .toDF("vec_id", "embedding", "label")
    val ex = intercept[IllegalArgumentException] {
      VectorOps.knnLabelNoise(e, "vec_id", "embedding", "label")
    }
    assert(ex.getMessage.contains("must be numeric"))
  }
}
