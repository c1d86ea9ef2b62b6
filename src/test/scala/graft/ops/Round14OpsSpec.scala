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

  test("asOfJoin: null keys never match each other (SQL equality, not " +
      "window-partition grouping)") {
    val left = Seq((Option(1L), 10L, "a"), (Option.empty[Long], 10L, "b"))
      .toDF("k", "ts", "tag")
    val right = Seq((Option(1L), 5L, "P"), (Option.empty[Long], 5L, "Q"))
      .toDF("k", "ts", "p")
    val out = JoinOps.asOfJoinBackward(left, right, "k", "ts", Seq("p"))
      .collect().map(r => (Option(r.get(0)), r.getString(2),
        Option(r.get(3)).map(_.toString))).toSet
    // k=1 matches P; the null-key left row keeps a NULL payload — a
    // null-key right row must never be fabricated as its match
    assert(out == Set((Some(1L), "a", Some("P")), (None, "b", None)))
  }

  test("bloomProbe: wrong probe parameters fail loudly even when every " +
      "probed position lands on an absent word") {
    val sketch = StatOps.bloomSketch(
      Seq("alpha").toDF("v"), "v", mBits = 4096, kHashes = 4)
    val probe = Seq((9L, "zzz-not-present")).toDF("id", "v")
    val e = intercept[Exception] {
      StatOps.bloomProbe(probe, "id", "v", sketch,
        mBits = 2048, kHashes = 4).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++
        Option(x.getCause).toSeq.flatMap(msgs))
    assert(msgs(e).exists(_.contains("sketch built with m/k")),
      s"expected the parameter-mismatch error, got: $e")
    // matching parameters: non-member is definitively absent, member hits
    val ok = StatOps.bloomProbe(
        Seq((1L, "alpha"), (2L, "zzz-not-present")).toDF("id", "v"),
        "id", "v", sketch, mBits = 4096, kHashes = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok == Map(1L -> 1L, 2L -> 0L))
  }

  test("incrementalDedup bloom path routes per CONTENT, not per id: a " +
      "duplicated id carrying one known and one novel content matches " +
      "the plain path row-for-row") {
    // the known content is SHORTER than one 3-gram shingle so only the
    // exact-hash stage (the bloom-gated one) can drop it — the near-dup
    // stage is id-keyed and would otherwise kill both rows of id 7 on
    // both paths, masking the bloom-routing question this test pins
    val ref = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    // id 7 appears twice: once with the reference's exact content (must
    // drop), once with novel content (must survive)
    val nw = Seq(
      (7L, "alpha beta"),
      (7L, "totally different words living here now"))
      .toDF("doc_id", "text")
    def run(bloom: Boolean) =
      DedupOps.incrementalDedup(nw, ref, "doc_id", "text",
          TextOps.wordShingles(col("text"), 3), 0.9, bloom = bloom)
        .collect().map(_.getLong(0)).toSeq.sorted
    val plain = run(bloom = false)
    val bloomed = run(bloom = true)
    assert(plain == Seq(7L), s"plain path must keep exactly the novel row: $plain")
    assert(bloomed == plain,
      s"bloom path diverged: $bloomed vs $plain")
  }

  test("knnLabelNoise: a non-numeric label column fails at plan time") {
    val e = Seq((1L, Seq(1.0f, 0.0f), "cat"), (2L, Seq(0.9f, 0.1f), "dog"))
      .toDF("vec_id", "embedding", "label")
    val ex = intercept[IllegalArgumentException] {
      VectorOps.knnLabelNoise(e, "vec_id", "embedding", "label")
    }
    assert(ex.getMessage.contains("must be numeric"))
  }

  test("semanticDedupScaled fails LOUDLY past the plan-embedded codebook " +
      "regime (MaxPlanCentroids), naming the handoff") {
    // perCell 1 makes k = n, so a corpus barely past the bound trips the
    // guard without materializing anything expensive: the count() runs,
    // the codebook collect must NOT
    val n = VectorOps.MaxPlanCentroids + 1
    val vecs = spark.range(n)
      .select(col("id").as("vec_id"),
        array(lit(1.0f), lit(0.0f)).as("embedding"))
    val ex = intercept[IllegalArgumentException] {
      VectorOps.semanticDedupScaled(vecs, "vec_id", "embedding", perCell = 1)
    }
    assert(ex.getMessage.contains("MaxPlanCentroids"), ex.getMessage)
    assert(ex.getMessage.contains("two-level assignment"), ex.getMessage)
  }
}
