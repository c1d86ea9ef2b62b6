package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-13 third wave: prototypicality pruning (x95) and the remaining
  * training-layout ops.
  */
class Round13cOpsSpec extends SparkSpec {
  import spark.implicits._

  // ----------------------------------------------------- prototypicality

  test("prototypicality: cosine to the assigned centroid in floor bp") {
    val vecs = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0f, 1f)), // seeds (2 lowest ids)
      (3L, Array(1f, 0.1f)), (4L, Array(0.1f, 1f)), (5L, Array(0f, 0f)))
      .toDF("vec_id", "embedding")
    val rows = VectorOps.prototypicality(vecs, "vec_id", "embedding", 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(!rows.contains(5L)) // zero-norm: no direction, excluded
    assert(rows(1L) == ((1L, 10000L))) // a seed is its own centroid
    assert(rows(2L) == ((2L, 10000L)))
    assert(rows(3L)._1 == 1L && rows(4L)._1 == 2L) // nearest-axis cells
    // cos((1,0.1),(1,0)) = 1/sqrt(1.01) ≈ 0.99504 → 9950
    assert(rows(3L)._2 == 9950L)
  }

  test("prototypePrune keeps the hardest ceil(n*keepBp/10000) per cell") {
    val vecs = Seq(
      (1L, Array(1f, 0f)),  // seed → proto_bp 10000 (most prototypical)
      (2L, Array(1f, 0.5f)), // cos ≈ 0.894
      (3L, Array(1f, 2f)))   // cos ≈ 0.447 (hardest)
      .toDF("vec_id", "embedding")
    val keep = VectorOps.prototypePrune(vecs, "vec_id", "embedding",
        numCentroids = 1, keepBp = 5000)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    // n=3, keepBp=5000 → keep ⌈1.5⌉ = 2 hardest; the seed itself drops
    assert(keep == Map(1L -> false, 2L -> true, 3L -> true))
  }

  test("prototypePrune keepBp bounds: 0 keeps nothing, 10000 everything") {
    val vecs = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)),
      (3L, Array(1f, 1f))).toDF("vec_id", "embedding")
    val all = VectorOps.prototypePrune(vecs, "vec_id", "embedding", 1, 10000)
      .filter(col("keep")).count()
    assert(all == 3L)
    val none = VectorOps.prototypePrune(vecs, "vec_id", "embedding", 1, 0)
      .filter(col("keep")).count()
    assert(none == 0L)
    assertThrows[IllegalArgumentException] {
      VectorOps.prototypePrune(vecs, "vec_id", "embedding", 1, 10001)
    }
  }

  // ------------------------------------------------------ CCNet buckets

  test("ccnetBuckets terciles within language, head = lowest NLL") {
    // lang A: 6 scoreable docs (terciles of 2); lang B: 1 doc (all head).
    // "x x" repeated bigrams are cheap; rare bigrams are expensive.
    val docs = Seq(
      (1L, "x x x x x x x x", "A"), (2L, "x x x x x x x x", "A"),
      (3L, "x x x q1 x x", "A"), (4L, "x x q2 x x", "A"),
      (5L, "q3 q4 q5 q6", "A"), (6L, "q7 q8 q9 q10", "A"),
      (7L, "x x", "B"), (8L, "solo", "B")) // 8: 1 token → no row
      .toDF("doc_id", "text", "lang")
    val model = LmOps.trainBigramLm(docs)
    val out = LmOps.ccnetBuckets(docs, model).collect()
      .map(r => r.getLong(0) -> ((r.getString(4), r.getLong(3)))).toMap
    assert(!out.contains(8L))
    assert(out(1L) == (("head", 1L)) && out(2L) == (("head", 1L)))
    assert(out(3L)._1 == "middle" && out(4L)._1 == "middle")
    assert(out(5L)._1 == "tail" && out(6L)._1 == "tail")
    assert(out(7L) == (("head", 1L))) // per-language: B's only doc is head
  }

  test("ccnetBuckets tie docs split deterministically by id") {
    val docs = Seq((1L, "a b", "A"), (2L, "a b", "A"), (3L, "a b", "A"))
      .toDF("doc_id", "text", "lang")
    val model = LmOps.trainBigramLm(docs)
    val b = LmOps.ccnetBuckets(docs, model).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(b == Map(1L -> "head", 2L -> "middle", 3L -> "tail"))
  }

  // ------------------------------------------------- top-n-gram coverage

  test("topNgramCoverage: top gram, tie break, coverage bp, cap") {
    // doc 1: "ab cd ab cd ab" len=14; bigrams: "ab cd"×2, "cd ab"×2,
    // tie → "ab cd" (lex); top_bp = 2*5*10000 div 14 = 7142 (no cap)
    val docs = Seq((1L, "ab cd ab cd ab"), (2L, "x x x")).toDF("doc_id", "text")
    val out = TextOps.topNgramCoverage(docs, minN = 2, maxN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out((1L, 2L)) == (("ab cd", 2L, 7142L,
      10000L))) // dupc = 2*5 + 2*5 = 20 chars > len 14 → capped
    // doc 2 len=5: "x x"×2 overlapping → 2*3*10000 div 5 = 12000 → capped
    assert(out((2L, 2L)) == (("x x", 2L, 10000L, 10000L)))
    // n=3: doc 2 has one gram "x x x" ×1 → top 10000 (5*10000 div 5), dup 0
    assert(out((2L, 3L)) == (("x x x", 1L, 10000L, 0L)))
  }

  test("topNgramCoverage: short docs emit no row for large n") {
    val docs = Seq((1L, "a b"), (2L, "")).toDF("doc_id", "text")
    val out = TextOps.topNgramCoverage(docs, minN = 2, maxN = 4).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("topNgramCoverage: the r20 per-row kernel is row-identical to the " +
      "aggregation form on adversarial docs") {
    // the aggregation shape the kernel replaced (r20) — kept here as the
    // equivalence oracle: same winner, tie rule, char accounting
    def aggForm(docs: org.apache.spark.sql.DataFrame, minN: Int,
                maxN: Int): org.apache.spark.sql.DataFrame = {
      val w = col("__w")
      def gramStructs(n: Int) = transform(
        when(size(w) >= n,
          transform(sequence(lit(1), size(w) - (n - 1)),
            k => concat_ws(" ", slice(w, k, lit(n)))))
          .otherwise(array().cast("array<string>")),
        g => struct(lit(n).cast("long").as("n"), g.as("g")))
      docs.filter(length(col("text")) > 0)
        .withColumn("__w", split(col("text"), " "))
        .select(col("doc_id"), length(col("text")).cast("long").as("__len"),
          explode(flatten(array((minN to maxN).map(gramStructs): _*))).as("__x"))
        .select(col("doc_id"), col("__len"),
          col("__x.n").as("n"), col("__x.g").as("g"))
        .groupBy(col("doc_id"), col("__len"), col("n"), col("g"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("glen", length(col("g")).cast("long"))
        .groupBy(col("doc_id"), col("__len"), col("n"))
        .agg(min(struct((-col("cnt")).as("nc"), col("g"), col("glen"))).as("top"),
          sum(when(col("cnt") >= 2, col("cnt") * col("glen"))
            .otherwise(lit(0L))).as("dupc"))
        .withColumn("cnt", -col("top.nc"))
        .withColumn("glen", col("top.glen"))
        .select(col("doc_id"), col("n"), col("top.g").as("top_gram"),
          col("cnt").as("top_cnt"),
          least(expr("(cnt * glen * 10000) div __len"), lit(10000L)).as("top_bp"),
          least(expr("(dupc * 10000) div __len"), lit(10000L)).as("dup_bp"))
    }
    val docs = Seq(
      (1L, "ab cd ab cd ab"),
      (2L, "x x x"),
      (3L, "a"), // 1 token: no rows
      (4L, "a b  c a b"), // double space → empty token (split -1 keeps it)
      (5L, "日本 語 日本 語 テスト"), // multi-byte, repeated bigram
      (6L, "𝄞 � 𝄞 �"), // astral vs BMP tie class
      (7L, "z y x w v u t s r q p o n m"), // all-distinct long doc
      (8L, "t t t t t t t t t t t t"), // one token repeated
      (9L, " leading and trailing "), // boundary empties
      (10L, "aa b aa b c aa b aa b c d")
    ).toDF("doc_id", "text")
    val a = aggForm(docs, 2, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val k = TextOps.topNgramCoverage(docs, minN = 2, maxN = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(k == a)
  }

  // --------------------------------------------------- shuffleOrder

  test("shuffleOrder: a permutation with exact round-robin shard balance") {
    val docs = (1L to 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val out = SampleOps.shuffleOrder(docs, "doc_id", numShards = 8)
      .select("doc_id", "global_pos", "shard", "shard_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._2).sorted.toSeq == (0L until 100L)) // a permutation
    val sizes = out.groupBy(_._3).map(_._2.size).toSet
    assert(sizes.subsetOf(Set(12, 13))) // 100 over 8 shards: ±1 balance
    out.foreach { case (_, gp, sh, sp) =>
      assert(sh == gp % 8 && sp == gp / 8)
    }
    // not the identity order: the hash actually permutes
    assert(out.sortBy(_._1).map(_._2).toSeq != (0L until 100L))
  }

  test("shuffleOrder: epochs permute differently but deterministically") {
    val docs = (1L to 50L).map(i => (i, "t")).toDF("doc_id", "text")
    def order(epoch: Long) =
      SampleOps.shuffleOrder(docs, "doc_id", 4, epoch)
        .select("doc_id", "global_pos").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e0 = order(0L)
    assert(order(0L) == e0)    // replayable
    assert(order(1L) != e0)    // epoch reshuffles
  }

  // ------------------------------------------------------ hardNegatives

  test("hardNegatives ranks only different-label corpus vectors") {
    val e = Seq(
      (1L, Array(1f, 0f), 0), (2L, Array(0.9f, 0.1f), 0), // same label
      (3L, Array(0.8f, 0.2f), 1), (4L, Array(0f, 1f), 1), // negatives
      (5L, Array(0.99f, 0.05f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = VectorOps.hardNegatives(e.filter(col("vec_id") === 1), e,
        "vec_id", "embedding", "label", 2)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // top-2 negatives of vec 1 (label 0): 5 (label 2, cos≈0.999) then 3
    // (label 1, cos≈0.970); same-label vec 2 never appears
    assert(out.toSeq == Seq((5L, 1L), (3L, 2L)))
  }

  // ------------------------------------------------------ knnLabelNoise

  test("knnLabelNoise flags minority labels; singleton cells emit no row") {
    // the 8 lowest ids are the seed centroids: identical seeds tie to the
    // LOWEST cid, so ids 1-4 share cell 1 (+x), ids 5-7 cell 5 (+y), and
    // id 8 (+z) is a seed alone in its own cell. Ids 9/10 assign to their
    // nearest cluster. Id 4 is the mislabeled member of cell 1.
    val e = Seq(
      (1L, Array(1f, 0f, 0f), 0), (2L, Array(1f, 0f, 0f), 0),
      (3L, Array(1f, 0f, 0f), 0), (4L, Array(1f, 0f, 0f), 1), // noisy
      (5L, Array(0f, 1f, 0f), 1), (6L, Array(0f, 1f, 0f), 1),
      (7L, Array(0f, 1f, 0f), 1), (8L, Array(0f, 0f, 1f), 0), // singleton
      (9L, Array(0.99f, 0.01f, 0f), 0), (10L, Array(0f, 0.99f, 0.01f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = VectorOps.knnLabelNoise(e, "vec_id", "embedding", "label",
        k = 3, perCell = 32)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(4), r.getBoolean(5)))).toMap
    assert(!out.contains(8L)) // alone in its cell: no neighbors, no row
    assert(out(4L) == ((1L, 0L, true))) // nbrs 1,2,3 all label 0 vs own 1
    Seq(1L, 2L, 3L, 9L).foreach(i => assert(out(i) == ((1L, 0L, false))))
    Seq(5L, 6L, 7L, 10L).foreach(i => assert(out(i) == ((5L, 1L, false))))
  }
}
