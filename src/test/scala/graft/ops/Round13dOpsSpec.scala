package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-13 fourth wave: epoch up-sampling (x101), the pipeline funnel
  * report (x102), and feature-hashed bag-of-words vectors (x103).
  */
class Round13dOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------ epoch upsample

  private def mixDocs = (0L until 8L).map { i =>
    (i, if (i < 4) "a" else "b")
  }.toDF("doc_id", "source")

  test("epochUpsample: full epochs exact, partial epoch hash-gated") {
    // a: n=4, w=0.5, T=24 → want 12 → 3 full epochs, no partial
    // b: n=4, w=0.25 → want 6 → 1 full epoch + 5000 bp partial
    val out = SampleOps.epochUpsample(mixDocs, "doc_id", "source",
      Seq("a" -> 0.5, "b" -> 0.25), totalDocs = 24L, maxEpochs = 10)
    val byDomEpoch = out.groupBy("source", "epoch").count()
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(byDomEpoch.filter(_._1._1 == "a") ==
      Map(("a", 0L) -> 4L, ("a", 1L) -> 4L, ("a", 2L) -> 4L))
    assert(byDomEpoch(("b", 0L)) == 4L)
    // the partial epoch keeps exactly the ids whose hash-mod < 5000 —
    // computed with the engine's own hash so the assertion can't drift
    val expectedPartial = mixDocs.filter(col("source") === "b")
      .filter(TextOps.hash60(col("doc_id").cast("string")) % 10000 < 5000)
      .select("doc_id").as[Long].collect().toSet
    val gotPartial = out.filter(col("source") === "b" && col("epoch") === 1L)
      .select("doc_id").as[Long].collect().toSet
    assert(gotPartial == expectedPartial)
    assert(expectedPartial.nonEmpty && expectedPartial.size < 4,
      s"fixture should exercise a strict subset, got $expectedPartial")
  }

  test("epochUpsample: the maxEpochs cap binds with no partial epoch") {
    // a: want = 0.9*40 = 36 → full0 = 9 ≥ cap 2 → exactly 2 full epochs
    val out = SampleOps.epochUpsample(mixDocs, "doc_id", "source",
      Seq("a" -> 0.9), totalDocs = 40L, maxEpochs = 2)
    val epochs = out.groupBy("epoch").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(epochs == Map(0L -> 4L, 1L -> 4L))
    // domain b has no weight: dropped entirely
    assert(out.filter(col("source") === "b").count() == 0L)
  }

  test("epochUpsample degrades to down-sampling when want < n") {
    // a: want = 0.05*40 = 2 of n=4 → 0 full epochs, 5000 bp partial —
    // exactly hashSample(a-rows, 5000) with epoch 0 attached
    val out = SampleOps.epochUpsample(mixDocs, "doc_id", "source",
      Seq("a" -> 0.05), totalDocs = 40L, maxEpochs = 3)
    assert(out.select("epoch").distinct().as[Long].collect().toSeq == Seq(0L))
    val expected = SampleOps.hashSample(
        mixDocs.filter(col("source") === "a"), "doc_id", 5000)
      .select("doc_id").as[Long].collect().toSet
    assert(out.select("doc_id").as[Long].collect().toSet == expected)
  }

  test("epochUpsample is insensitive to input partitioning") {
    val w = Seq("a" -> 0.5, "b" -> 0.25)
    val x = SampleOps.epochUpsample(mixDocs, "doc_id", "source", w, 24L, 10)
      .select("doc_id", "epoch").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val y = SampleOps.epochUpsample(mixDocs.repartition(7), "doc_id",
        "source", w, 24L, 10)
      .select("doc_id", "epoch").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(x == y)
  }

  test("epochUpsample argument validation") {
    assertThrows[IllegalArgumentException] {
      SampleOps.epochUpsample(mixDocs, "doc_id", "source", Seq(), 10L, 1)
    }
    assertThrows[IllegalArgumentException] {
      SampleOps.epochUpsample(mixDocs, "doc_id", "source",
        Seq("a" -> 0.5), 0L, 1)
    }
    assertThrows[IllegalArgumentException] {
      SampleOps.epochUpsample(mixDocs, "doc_id", "source",
        Seq("a" -> 0.5), 10L, 0)
    }
  }

  // ------------------------------------------------------- funnel report

  test("funnelReport: one row per stage, docs + tokens, empty stage = 0") {
    val raw = Seq((1L, "a b c"), (2L, "d e"), (3L, "f")).toDF("doc_id", "text")
    val filtered = raw.filter(col("doc_id") <= 2L)
    val empty = raw.filter(col("doc_id") < 0L)
    val rows = StatOps.funnelReport(
        Seq("raw" -> raw, "filtered" -> filtered, "empty" -> empty),
        size(split(col("text"), " ")))
      .orderBy("stage_idx").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      (0L, "raw", 3L, 6L),
      (1L, "filtered", 2L, 5L),
      (2L, "empty", 0L, 0L)))
  }

  test("funnelReport rejects an empty stage list") {
    assertThrows[IllegalArgumentException] {
      StatOps.funnelReport(Seq(), lit(1L))
    }
  }

  // --------------------------------------------------------- hashed BoW

  test("hashedBow: signed sums, magnitude = occurrences, stable buckets") {
    val docs = Seq((1L, "a a b"), (2L, "a")).toDF("doc_id", "text")
    val rows = TextOps.hashedBow(docs, "doc_id", "text", dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // per-doc total magnitude = token occurrences (no collisions here:
    // "a" and "b" may collide in 16 buckets, so assert via doc 2 first)
    val aBucket = rows.keys.collect { case (2L, b) => b }.toSeq
    assert(aBucket.size == 1)
    val aVal = rows((2L, aBucket.head))
    assert(math.abs(aVal) == 1L) // one occurrence, sign ±1
    // doc 1 has "a" twice: its value in a's bucket is 2× doc 2's ±1,
    // plus b's contribution iff b collided into the same bucket
    val d1a = rows.getOrElse((1L, aBucket.head), 0L)
    assert(d1a == 2 * aVal || math.abs(d1a - 2 * aVal) == 1L)
    // total signed magnitude across buckets ≤ 3 tokens for doc 1
    assert(rows.collect { case ((1L, _), v) => math.abs(v) }.sum <= 3L)
  }

  test("hashedBow: identical texts produce identical sparse vectors") {
    val docs = Seq((1L, "spark join filter scan"), (2L, "spark join filter scan"),
      (3L, "completely different words here")).toDF("doc_id", "text")
    val rows = TextOps.hashedBow(docs, "doc_id", "text", dim = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def vec(id: Long) = rows.filter(_._1 == id).map(r => (r._2, r._3)).toSet
    assert(vec(1L) == vec(2L))
    assert(vec(1L) != vec(3L))
  }

  test("hashedBow is insensitive to input partitioning") {
    val docs = Seq((1L, "a b c d"), (2L, "c d e f"), (3L, "x y"))
      .toDF("doc_id", "text")
    val x = TextOps.hashedBow(docs, "doc_id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val y = TextOps.hashedBow(docs.repartition(5), "doc_id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(x == y)
  }

  test("hashedBowDense: dim-length float array matching the sparse rows") {
    val docs = Seq((1L, "a a b c"), (2L, "z")).toDF("doc_id", "text")
    val sparse = TextOps.hashedBow(docs, "doc_id", "text", 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val dense = TextOps.hashedBowDense(docs, "doc_id", "text", 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(dense(1L).size == 16 && dense(2L).size == 16)
    for (((id, bucket), v) <- sparse)
      assert(dense(id)(bucket.toInt) == v.toFloat,
        s"dense($id)($bucket) != $v")
    // buckets with no tokens are exactly 0
    val nonZero = dense(2L).count(_ != 0f)
    assert(nonZero == sparse.keys.count(_._1 == 2L))
  }

  test("hashedBowDense vectors drive the vector ops: near-dup texts " +
      "are nearest neighbors") {
    // two near-identical docs + two unrelated ones; cosine over hashed
    // vectors must pair the near-dups (the text→vector bridge contract)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and once"),
      (3L, "completely unrelated text about spark shuffle partitions"),
      (4L, "numbers one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val vecs = TextOps.hashedBowDense(docs, "doc_id", "text", 64)
    val top1 = VectorOps.bruteForceTopK(vecs, vecs, "doc_id", "embedding", 1)
    val best = top1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(best(1L) == 2L && best(2L) == 1L)
  }

  // ------------------------------------------------------ sparse cosine

  test("sparseCosineTopK: hand-checked dots, non-co-occurring absent, " +
      "zero-norm excluded") {
    val sparse = Seq(
      (1L, 0L, 2L),              // query doc
      (2L, 0L, 1L), (2L, 1L, 1L), // shares bucket 0: cos = 2/(2·√2)
      (3L, 1L, 5L),              // no shared bucket: never a candidate
      (4L, 0L, -1L),             // shares bucket 0, NEGATIVE cosine
      (5L, 0L, 0L))              // zero norm: excluded outright
      .toDF("doc_id", "bucket", "val")
    val out = VectorOps.sparseCosineTopK(
        sparse.filter(col("doc_id") === 1L), sparse,
        "doc_id", "bucket", "val", k = 5)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 2: dot 2, norms 2·√2 → cos ≈ 0.7071 → 7071 bp, rank 1
    // doc 4: dot −2, norms 2·1 → cos −1 → −10000 bp, rank 2
    assert(out.toSeq == Seq((2L, 1L, 7071L), (4L, 2L, -10000L)))
  }

  test("sparseCosineTopK agrees with dense brute force on hashed vectors") {
    // every doc shares tokens with its intended neighbor so each query's
    // best candidate has POSITIVE cosine — the regime where the sparse
    // (co-occurring-pairs-only) and dense candidate sets must agree; a
    // query whose candidates are all negative may legitimately differ
    // (dense ranks an absent zero-cosine pair above them — the declared
    // inverted-index semantic)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "spark shuffle partitions broadcast join seven eight"),
      (4L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val sparse = TextOps.hashedBow(docs, "doc_id", "text", 64)
    val dense = TextOps.hashedBowDense(docs, "doc_id", "text", 64)
    val sTop = VectorOps.sparseCosineTopK(sparse, sparse, "doc_id",
        "bucket", "val", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dTop = VectorOps.bruteForceTopK(dense, dense, "doc_id",
        "embedding", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sTop == dTop)
  }

  // --------------------------------------------- per-group funnel report

  test("funnelReportBy: per-(stage, group) counts; a fully-filtered " +
      "group is absent, not zero") {
    val raw = Seq((1L, "a", "x y"), (2L, "a", "z"), (3L, "b", "w v u"))
      .toDF("doc_id", "source", "text")
    val noB = raw.filter(col("source") =!= "b")
    val rows = StatOps.funnelReportBy(
        Seq("raw" -> raw, "no_b" -> noB),
        size(split(col("text"), " ")), "source")
      .collect()
      .map(r => (r.getLong(0), r.getString(2)) -> ((r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows == Map(
      (0L, "a") -> ((2L, 3L)), (0L, "b") -> ((1L, 3L)),
      (1L, "a") -> ((2L, 3L))))
  }

  // -------------------------------------------------------- replay layout

  test("replayLayout: contiguous permutation, ±1 shard balance, " +
      "partition-insensitive, matches the (hash, id, epoch) rank") {
    val reps = (0L until 37L).flatMap(i => Seq((i, 0L), (i, 1L)))
      .toDF("doc_id", "epoch")
    val out = SampleOps.replayLayout(reps, "doc_id", "epoch", numShards = 8)
      .select("doc_id", "epoch", "global_pos", "shard", "shard_pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.map(_._3).sorted.toSeq == (0L until 74L).toSeq)
    val shardCounts = out.groupBy(_._4).view.mapValues(_.size).values.toSeq
    assert(shardCounts.max - shardCounts.min <= 1)
    out.foreach { case (_, _, gp, sh, sp) =>
      assert(sh == gp % 8 && sp == gp / 8)
    }
    // the permutation is the rank by (hash60(epoch‖'_'‖id), id, epoch) —
    // recomputed with the engine's own hash so the assertion can't drift
    val expected = reps
      .withColumn("__h", TextOps.hash60(
        concat(col("epoch").cast("string"), lit("_"),
          col("doc_id").cast("string"))))
      .collect().map(r => (r.getLong(2), r.getLong(0), r.getLong(1)))
      .sortBy(identity).zipWithIndex
      .map { case ((_, id, ep), i) => (id, ep) -> i.toLong }.toMap
    out.foreach { case (id, ep, gp, _, _) =>
      assert(expected((id, ep)) == gp, s"doc $id epoch $ep")
    }
    val rep2 = SampleOps.replayLayout(reps.repartition(7), "doc_id",
        "epoch", 8)
      .select("doc_id", "epoch", "global_pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rep2 == out.map(t => (t._1, t._2, t._3)).toSet)
  }

  // -------------------------------------------------- filter config diff

  test("filter-config flip matrix: strict vs lax decided off one " +
      "signal table") {
    // 4-char words keep the mean word length above the 3.00 Gopher floor
    // even after the 2–3-char stopwords join the doc
    val ws = (for { a <- 'a' to 'z'; b <- 'a' to 'z' }
      yield s"$a${b}xx").take(48)
    val docs = Seq(
      (1L, (ws :+ "the" :+ "be").mkString(" ")), // 50 words, 2 stops: both
      (2L, (ws.take(19) :+ "the").mkString(" ")), // 20 words, 1 stop: lax only
      (3L, "zzz"))                                // 1 word: neither
      .toDF("doc_id", "text")
    val g = TextOps.gopherFilter(docs)
    val m = g.withColumn("keep_lax",
        col("n_words") >= 20L && col("n_words") <= 100000L &&
        col("keep_word_len") && col("keep_dup") && col("keep_alpha") &&
        col("keep_sym") && col("stop_hits") >= 1L)
      .groupBy(col("keep").as("keep_strict"), col("keep_lax"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2))
      .toMap
    assert(m == Map((true, true) -> 1L, (false, true) -> 1L,
      (false, false) -> 1L))
  }
}
