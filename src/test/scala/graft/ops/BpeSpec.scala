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

  test("trainMerges stops early when every word is fully merged") {
    val docs = Seq("ab ab cd").toDF("text")
    // only 2 distinct pairs exist; asking for 10 merges returns 2
    val (merges, vocab) = BpeOps.trainMerges(docs, merges = 10)
    assert(merges.size == 2)
    val syms = vocab.select("syms").as[String].collect().toSet
    assert(syms == Set("ab", "cd"), s"unexpected final vocab: $syms")
  }
}
