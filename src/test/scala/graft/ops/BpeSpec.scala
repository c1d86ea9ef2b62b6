package graft.ops

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BPE trainer: the distributed implementation must agree with a plain
  * single-machine reference (the Sennrich et al. algorithm written the
  * obvious way) — merges, tie-breaks, and tokenization counts.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- single-machine reference implementation ------------------------------

  /** Greedy left-to-right scan merge — the textbook formulation. */
  private def scanMerge(s: List[String], l: String, r: String): List[String] =
    s match {
      case a :: b :: rest if a == l && b == r => (l + r) :: scanMerge(rest, l, r)
      case a :: rest                          => a :: scanMerge(rest, l, r)
      case Nil                                => Nil
    }

  /** Reference BPE trainer over a word list (occurrence-weighted). */
  private def refBpe(words: Seq[String], n: Int): List[(String, String, Long)] = {
    var vocab: Map[List[String], Long] = words.filter(_.nonEmpty)
      .groupBy(w => w.toList.map(_.toString))
      .map { case (k, v) => k -> v.size.toLong }
    var out = List.empty[(String, String, Long)]
    var done = false
    for (_ <- 1 to n if !done) {
      val counts = vocab.toSeq.flatMap { case (syms, f) =>
        syms.sliding(2).collect { case Seq(a, b) => ((a, b), f) }
      }.groupBy(_._1).map { case (p, fs) => (p, fs.map(_._2).sum) }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        out = out :+ (l, r, c)
        vocab = vocab.map { case (syms, f) => scanMerge(syms, l, r) -> f }
      }
    }
    out
  }

  // ---- specs ----------------------------------------------------------------

  test("mergePair fold reproduces the greedy scan on random symbol sequences") {
    val rnd = new Random(42)
    val cases = (1 to 300).map { _ =>
      val alphabet = Seq("a", "b", "c", "ab", "bc", "x")
      val syms = List.fill(rnd.nextInt(9) + 1)(alphabet(rnd.nextInt(alphabet.size)))
      val l = alphabet(rnd.nextInt(alphabet.size))
      val r = alphabet(rnd.nextInt(alphabet.size))
      (syms.mkString(" "), l, r, scanMerge(syms, l, r).mkString(" "))
    }
    val df = cases.toDF("syms", "l", "r", "expected")
    val bad = df
      .withColumn("got", BpeOps.mergePair(col("syms"), col("l"), col("r")))
      .filter(col("got") =!= col("expected"))
      .collect()
    assert(bad.isEmpty, s"fold != scan on: ${bad.take(3).mkString("; ")}")
  }

  test("trainMerges matches the reference on the classic corpus (with ties)") {
    // Sennrich-flavored corpus: repeated suffixes force multi-step merges,
    // duplicate words exercise frequency weighting, and "aa aa" exercises
    // the overlapping-pair rule (aaa counts (a,a) twice, merges once).
    val words = Seq("low", "low", "lower", "lowest", "newest", "widest",
      "newest", "aaa", "aa")
    val docs = Seq(words.mkString(" ")).toDF("text")
    val expected = refBpe(words, 6)
    val (got, _) = BpeOps.trainMerges(docs, merges = 6)
    assert(got.map(m => (m.left, m.right, m.pairCount)) == expected,
      s"got=$got expected=$expected")
    assert(got.map(_.rank) == (1 to 6).toList)
  }

  test("trainMerges matches the reference on random corpora") {
    val rnd = new Random(7)
    for (seed <- 1 to 3) {
      val vocabWords = Seq.fill(10)(
        (1 to rnd.nextInt(6) + 1).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
      val words = Seq.fill(40)(vocabWords(rnd.nextInt(vocabWords.size)))
      // split the corpus across several doc rows — training must not care
      val docs = words.grouped(7).map(_.mkString(" ")).toSeq.toDF("text")
      val expected = refBpe(words, 5)
      val (got, _) = BpeOps.trainMerges(docs, merges = 5)
      assert(got.map(m => (m.left, m.right, m.pairCount)) == expected,
        s"seed $seed: got=$got expected=$expected")
    }
  }

  test("tokenize counts match reference tokenization") {
    val words = Seq("low", "lower", "lowest", "newest", "widest", "low")
    val docs = Seq(
      (1L, "low lower lowest"),
      (2L, "newest widest low"),
      (3L, "low low")
    ).toDF("doc_id", "text")
    val (merges, _) = BpeOps.trainMerges(docs, merges = 4)
    // reference: apply merges to each word, count symbols
    def tok(w: String): Int = merges.foldLeft(w.toList.map(_.toString)) {
      (s, m) => scanMerge(s, m.left, m.right)
    }.size
    val got = BpeOps.tokenize(docs, "doc_id", merges)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val exp = Seq(
      (1L, 3L, ("low lower lowest").split(" ").map(tok).sum.toLong),
      (2L, 3L, ("newest widest low").split(" ").map(tok).sum.toLong),
      (3L, 2L, ("low low").split(" ").map(tok).sum.toLong))
    assert(got.toSeq == exp)
  }

  test("batch-B trainMerges output is identical to sequential greedy") {
    // the batch contract: batching compresses ROUNDS, never changes the
    // learned sequence — so batch ∈ {2, 4, 8} must equal the
    // single-machine sequential reference on every corpus
    val rnd = new Random(11)
    for (seed <- 1 to 4) {
      val vocabWords = Seq.fill(12)(
        (1 to rnd.nextInt(6) + 1).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
      val words = Seq.fill(50)(vocabWords(rnd.nextInt(vocabWords.size)))
      val docs = words.grouped(9).map(_.mkString(" ")).toSeq.toDF("text")
      val expected = refBpe(words, 7)
      for (b <- Seq(2, 4, 8)) {
        val (got, _) = BpeOps.trainMerges(docs, merges = 7, batch = b)
        assert(got.map(m => (m.left, m.right, m.pairCount)) == expected,
          s"seed $seed batch $b: got=$got expected=$expected")
        assert(got.map(_.rank) == (1 to got.size).toList)
      }
    }
  }

  test("batch-B trainMerges equals sequential on the classic tie corpus") {
    val words = Seq("low", "low", "lower", "lowest", "newest", "widest",
      "newest", "aaa", "aa")
    val docs = Seq(words.mkString(" ")).toDF("text")
    val expected = refBpe(words, 6)
    for (b <- Seq(2, 3, 6)) {
      val (got, _) = BpeOps.trainMerges(docs, merges = 6, batch = b)
      assert(got.map(m => (m.left, m.right, m.pairCount)) == expected,
        s"batch $b diverged")
    }
  }

  test("batching reduces driver rounds without changing the rules") {
    // disjoint two-letter words with >2x frequency separation — the
    // batchable shape (Zipf-like separated top of the pair distribution);
    // a chained word like "abcdef" would conflict at rank 2 and correctly
    // degrade to sequential
    val words = Seq.fill(64)("ab") ++ Seq.fill(28)("cd") ++
      Seq.fill(12)("ef") ++ Seq.fill(5)("gh") ++ Seq.fill(2)("ij")
    val docs = words.grouped(8).map(_.mkString(" ")).toSeq.toDF("text")
    val (seq1, _, rounds1) = BpeOps.trainMergesDetailed(docs, merges = 5)
    val (seqB, _, roundsB) = BpeOps.trainMergesDetailed(docs, merges = 5,
      batch = 8)
    assert(rounds1 == 5)
    assert(roundsB == 1,
      s"batch=8 took $roundsB rounds, expected 1")
    assert(seqB.map(m => (m.rank, m.left, m.right, m.pairCount)) ==
      seq1.map(m => (m.rank, m.left, m.right, m.pairCount)))
  }

  test("acceptBatch: prefix, disjointness, concat guard, strict 2x margin") {
    // disjoint top-3 with comfortable margins: all accepted
    val w1 = IndexedSeq(("a", "b", 100L), ("c", "d", 40L), ("e", "f", 15L),
      ("g", "h", 6L))
    assert(BpeOps.acceptBatch(w1, 3) == w1.take(3))
    // symbol conflict at rank 2 ("b" reused): acceptance stops at 1
    val w2 = IndexedSeq(("a", "b", 100L), ("b", "c", 40L), ("e", "f", 15L))
    assert(BpeOps.acceptBatch(w2, 3) == w2.take(1))
    // concat collision: "ab" (rank 1's fusion) appears as a symbol of
    // rank 2 — its count could grow mid-batch, so acceptance stops
    val w3 = IndexedSeq(("a", "b", 100L), ("ab", "c", 40L), ("e", "f", 15L))
    assert(BpeOps.acceptBatch(w3, 3) == w3.take(1))
    // margin violation: rank 2 (40) vs first excluded (30) is under the
    // 2x bound an emergent pair could reach, so rank 2 is trimmed
    val w4 = IndexedSeq(("a", "b", 100L), ("c", "d", 40L), ("e", "f", 30L))
    assert(BpeOps.acceptBatch(w4, 2) == w4.take(1))
    // equal-count run: everything after the argmax trims away
    val w5 = IndexedSeq(("a", "b", 10L), ("c", "d", 10L), ("e", "f", 10L))
    assert(BpeOps.acceptBatch(w5, 2) == w5.take(1))
    // the argmax is ALWAYS accepted, whatever the margins
    assert(BpeOps.acceptBatch(IndexedSeq(("a", "b", 1L), ("c", "d", 1L)), 1)
      == IndexedSeq(("a", "b", 1L)))
  }

  test("non-strict batching compresses rounds; exact on separated corpora") {
    // on a corpus whose top pairs are disjoint and separated, loose ==
    // strict == sequential (the skip rule never fires, margins don't
    // matter when nothing is excluded)
    val sep = (Seq.fill(64)("ab") ++ Seq.fill(28)("cd") ++ Seq.fill(12)("ef"))
      .grouped(8).map(_.mkString(" ")).toSeq.toDF("text")
    val (s1, _, _) = BpeOps.trainMergesDetailed(sep, 3)
    val (l1, _, r1) = BpeOps.trainMergesDetailed(sep, 3, batch = 8,
      strict = false)
    assert(r1 == 1)
    assert(l1.map(m => (m.left, m.right, m.pairCount)) ==
      s1.map(m => (m.left, m.right, m.pairCount)))
    // on a chained corpus (where strict degrades to ~1/round), loose still
    // compresses rounds and yields a usable merge list of the same size
    val chained = Seq.fill(30)("abcdefgh").grouped(6)
      .map(_.mkString(" ")).toSeq.toDF("text")
    val (ls, _, rs) = BpeOps.trainMergesDetailed(chained, 7, batch = 4,
      strict = false)
    assert(rs < 7, s"loose batching took $rs rounds for 7 rules")
    assert(ls.size == 7)
    assert(ls.map(_.rank) == (1 to 7).toList)
  }

  test("trainMerges stops early when every word is fully merged") {
    val docs = Seq("ab ab cd").toDF("text")
    // only 2 distinct pairs exist; asking for 10 merges returns 2
    val (merges, vocab) = BpeOps.trainMerges(docs, merges = 10)
    assert(merges.size == 2)
    val syms = vocab.select("syms").as[String].collect().toSet
    assert(syms == Set("ab", "cd"), s"unexpected final vocab: $syms")
  }
}
