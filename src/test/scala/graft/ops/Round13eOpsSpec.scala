package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-13 fifth wave: token-budget mixture (x108), split-leakage audit
  * (x109), winnowing fingerprints (x110), cluster histogram (x111), and
  * truncated-dimension recall (x112).
  */
class Round13eOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------- token-budget mixture

  test("tokenBudgetMixture: rates come from TOKEN sums, not doc counts") {
    // domain a: 2 docs × 100 tokens = 200; domain b: 10 docs × 4 = 40.
    // weights 0.5/0.5 → T = min(200/0.5, 40/0.5) = 80 → rate_a =
    // floor(10000·0.5·80/200) = 2000 bp, rate_b = floor(10000·0.5·80/40)
    // = 10000 bp — a doc-count mixture (2 vs 10 docs) would point the
    // rates the OTHER way.
    val docs = ((0L until 2L).map((_, "a", 100L)) ++
      (10L until 20L).map((_, "b", 4L))).toDF("doc_id", "dom", "n_tok")
    val kept = SampleOps.tokenBudgetMixture(docs, "doc_id", "dom", "n_tok",
        Seq("a" -> 0.5, "b" -> 0.5))
      .select("doc_id").as[Long].collect().toSet
    val hashes = docs
      .withColumn("h", TextOps.hash60(col("doc_id").cast("string")) % 10000)
      .select("doc_id", "dom", "h").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = hashes.collect {
      case (id, "a", h) if h < 2000L => id
      case (id, "b", h) if h < 10000L => id
    }.toSet
    assert(kept == expected)
    assert((10L until 20L).toSet.subsetOf(kept), "scarce-token domain b " +
      "must keep everything")
  }

  test("tokenBudgetMixture: unweighted domains drop; null tokens count 0") {
    val docs = Seq((1L, "a", Some(10L)), (2L, "a", None), (3L, "c", Some(5L)))
      .toDF("doc_id", "dom", "n_tok")
    val kept = SampleOps.tokenBudgetMixture(docs, "doc_id", "dom", "n_tok",
        Seq("a" -> 1.0))
      .select("doc_id").as[Long].collect().toSet
    // T = 10/1 → rate_a = 10000: both a-docs kept (null tokens don't
    // exclude a doc, they just add nothing to the budget); c drops
    assert(kept == Set(1L, 2L))
  }

  // ----------------------------------------------------- split leakage

  test("splitLeakage: direction matters — partner must be in TRAIN") {
    // 1(train) ≡ 2(eval): eval doc 2 leaks; train doc 1 does NOT (its
    // partner is eval). 5(train) ≡ 6(train): both leak intra-train.
    val txt = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, txt, "train"), (2L, txt, "eval"),
      (3L, "one two three four five six", "eval"),
      (4L, "seven eight nine ten eleven twelve", "train"),
      (5L, "aa bb cc dd ee ff", "train"), (6L, "aa bb cc dd ee ff", "train"))
      .toDF("doc_id", "text", "split")
    val out = DedupOps.splitLeakage(docs, "doc_id",
        TextOps.wordShingles(col("text"), 3), 0.5, "split", "train")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out("eval") == ((2L, 1L, 5000L)))
    assert(out("train") == ((4L, 2L, 5000L)))
  }

  // ----------------------------------------------- winnowing fingerprints

  test("winnowFingerprints: matches a direct Scala winnow of the same " +
      "gram hashes; guarantee + density hold") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "a b c d e f g h i j k l m n o p"),
      (3L, "same same same same same same same same"),
      (4L, "too short"))
      .toDF("doc_id", "text")
    val (k, w) = (3, 4)
    val out = TextOps.winnowFingerprints(docs, "doc_id", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // recompute the selection in plain Scala from the engine's own gram
    // hashes so the assertion can't drift from the hash convention
    val grams = docs.filter(size(split(col("text"), " ")) >= k)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), size(split(col("text"), " ")) - k),
          p => TextOps.hash60(concat_ws(" ",
            slice(split(col("text"), " "), p + 1, lit(k))))))
          .as(Seq("p", "h")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
    val expected = grams.flatMap { case (id, rows) =>
      val hs = rows.sortBy(_._2).map(r => (r._3, r._2.toLong))
      if (hs.length < w) Seq.empty
      else hs.indices.dropRight(w - 1).map { p =>
        val (h, q) = hs.slice(p, p + w).min
        (id, q, h)
      }.distinct
    }.toSet
    assert(out.toSet == expected)
    assert(!out.exists(_._1 == 4L), "sub-window doc must emit nothing")
    // guarantee: every w consecutive gram positions contain a selection
    out.groupBy(_._1).foreach { case (id, rows) =>
      val sel = rows.map(_._2).sorted
      val maxp = grams(id).map(_._2).max
      (0L to (maxp - (w - 1)).toLong).foreach { p =>
        assert(sel.exists(q => q >= p && q < p + w),
          s"doc $id window at $p has no fingerprint")
      }
    }
    // density: the all-equal-hash doc selects by position tie-break —
    // exactly one fingerprint per window start, all the same hash
    val d3 = out.filter(_._1 == 3L)
    assert(d3.map(_._3).distinct.length == 1)
  }

  // ------------------------------------------------- cluster histogram

  test("cluster histogram composition: triangle + pair → {3:1, 2:1}") {
    val t1 = "aa bb cc dd ee ff gg"
    val t2 = "one two three four five six seven"
    val docs = Seq((1L, t1), (2L, t1), (3L, t1), (4L, t2), (5L, t2),
      (6L, "lone wolf doc with its own words"))
      .toDF("doc_id", "text")
    val pairs = DedupOps.nearDupPairs(docs, "doc_id",
      TextOps.wordShingles(col("text"), 3), 0.5)
    val hist = DedupOps.connectedComponents(pairs)
      .groupBy(col("comp")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist == Map(3L -> 1L, 2L -> 1L))
  }

  // ------------------------------------------------ winnow overlap pairs

  test("winnowOverlapPairs: shared-run docs pair; disjoint docs don't; " +
      "minShared filters single collisions") {
    // docs 1 and 2 share an 8-token run (≥ w+k-1 = 6 → guaranteed ≥1
    // shared fingerprint; the long run yields several)
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"$run tail one two"),
      (2L, s"prefix words here $run"),
      (3L, "totally different content with no overlap at all ok"))
      .toDF("doc_id", "text")
    val pairs = DedupOps.winnowOverlapPairs(docs, "doc_id", k = 3, w = 4,
        minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 >= 2L)
    // agreement with the definition: shared = |winnow(1) ∩ winnow(2)| on
    // distinct fingerprints
    val fps = TextOps.winnowFingerprints(docs, "doc_id", 3, 4)
      .select("doc_id", "fp").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val s1 = fps.filter(_._1 == 1L).map(_._2).toSet
    val s2 = fps.filter(_._1 == 2L).map(_._2).toSet
    assert(pairs.head._3 == (s1 & s2).size.toLong)
  }

  // ------------------------------------------------------ snapshot diff

  test("snapshotDiff: all four statuses, keyed full-outer semantics") {
    val old = Seq((1L, "same"), (2L, "will change"), (3L, "will vanish"))
      .toDF("id", "content")
    val nw = Seq((1L, "same"), (2L, "changed!"), (4L, "brand new"))
      .toDF("id", "content")
    val out = StatOps.snapshotDiff(old, nw, "id", "content")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  // ---------------------------------------------------------- mix drift

  test("mixDrift: zero rows for one-sided sources; bp shares and delta") {
    val old = (Seq.fill(6)("a") ++ Seq.fill(4)("b")).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "src")
    val nw = (Seq.fill(3)("a") ++ Seq.fill(4)("b") ++ Seq.fill(3)("c"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "src")
    val out = StatOps.mixDrift(old, nw, "src")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out("a") == ((6L, 3L, 6000L, 3000L, -3000L)))
    assert(out("b") == ((4L, 4L, 4000L, 4000L, 0L)))
    assert(out("c") == ((0L, 3L, 0L, 3000L, 3000L)))
  }

  // ------------------------------------------------- blocklist decision

  test("blocklistHits: whole-word contiguous phrases only — no substring " +
      "or gap matches; distinct-hit counts; every doc gets a row") {
    val docs = Seq(
      (1L, "this class is fine"),           // "ass" must NOT match "class"
      (2L, "bad phrase here and bad word"),  // 2 distinct hits
      (3L, "bad other phrase"),              // gap: "bad phrase" absent
      (4L, "clean text entirely"),
      (5L, "bad phrase bad phrase"))         // repeated → still 1 distinct
      .toDF("doc_id", "text")
    val out = TextOps.blocklistHits(docs, "doc_id",
        Seq("ass", "bad phrase", "bad word"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(out == Map(
      1L -> ((0L, true)), 2L -> ((2L, false)), 3L -> ((0L, true)),
      4L -> ((0L, true)), 5L -> ((1L, false))))
  }

  // ------------------------------------------------ percentile selection

  test("percentileSelect: per-group ceil cut, id tie-break, both " +
      "directions") {
    // group a: 5 rows scores 50,40,30,20,10 → keep 30% = ceil(1.5)=2
    // group b: 2 rows equal scores → keep 30% = ceil(0.6)=1, lowest id
    val df = Seq(
      (1L, "a", 50L), (2L, "a", 40L), (3L, "a", 30L), (4L, "a", 20L),
      (5L, "a", 10L), (6L, "b", 7L), (7L, "b", 7L))
      .toDF("id", "g", "score")
    val top = SampleOps.percentileSelect(df, "id", "g", "score", 3000L)
      .select("id").as[Long].collect().toSet
    assert(top == Set(1L, 2L, 6L))
    val bottom = SampleOps.percentileSelect(df, "id", "g", "score", 3000L,
        descending = false)
      .select("id").as[Long].collect().toSet
    assert(bottom == Set(5L, 4L, 6L))
    assert(SampleOps.percentileSelect(df, "id", "g", "score", 0L).count() == 0L)
    assert(SampleOps.percentileSelect(df, "id", "g", "score", 10000L)
      .count() == 7L)
  }

  // ------------------------------------------------- degenerate inputs

  test("degenerate inputs: empty/singleton corpora and bad parameters " +
      "fail loudly or return empty, never wrong") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val one = Seq((1L, "just one tiny doc here")).toDF("doc_id", "text")
    // winnow: empty → empty; singleton shorter than w grams → empty
    assert(TextOps.winnowFingerprints(empty, "doc_id").count() == 0L)
    assert(DedupOps.winnowOverlapPairs(one, "doc_id").count() == 0L)
    // blocklist: empty corpus → empty table; empty phrase list → loud
    assert(TextOps.blocklistHits(empty, "doc_id", Seq("x")).count() == 0L)
    intercept[IllegalArgumentException] {
      TextOps.blocklistHits(one, "doc_id", Seq.empty)
    }
    // splitLeakage: no near-dups → zero leaks, every split still reported
    val sl = DedupOps.splitLeakage(
        Seq((1L, "a b c d", "train"), (2L, "e f g h", "eval"))
          .toDF("doc_id", "text", "split"),
        "doc_id", TextOps.wordShingles(col("text"), 3), 0.5, "split", "train")
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(sl == Map("train" -> ((0L, 0L)), "eval" -> ((0L, 0L))))
    // snapshotDiff against an empty refresh: everything 'removed'
    val sd = StatOps.snapshotDiff(one, empty.withColumnRenamed("text", "text"),
        "doc_id", "text")
      .collect().map(_.getString(1))
    assert(sd.toSeq == Seq("removed"))
    // mixDrift with an empty new snapshot: zero counts, share 0 on a
    // zero total (0/0 double → floor(NaN) is null-safe? no — declared:
    // an EMPTY snapshot has no shares; rows still enumerate)
    val md = StatOps.mixDrift(
        Seq((1L, "a")).toDF("id", "src"), empty.toDF("id", "src"), "src")
      .collect()
    assert(md.length == 1 && md.head.getLong(1) == 1L && md.head.getLong(2) == 0L)
    // percentileSelect / replayLayout / tokenBudgetMixture parameter rails
    intercept[IllegalArgumentException] {
      SampleOps.percentileSelect(one.withColumn("s", lit(1L)), "doc_id",
        "text", "s", 10001L)
    }
    intercept[IllegalArgumentException] {
      SampleOps.replayLayout(one.withColumn("epoch", lit(0L)), "doc_id",
        "epoch", 0)
    }
    intercept[IllegalArgumentException] {
      SampleOps.tokenBudgetMixture(one.withColumn("n", lit(1L)), "doc_id",
        "text", "n", Seq("a" -> 0.5, "a" -> 0.5))
    }
    // centroidDrift on empty inputs → empty output
    val ev = Seq.empty[(Int, Seq[Float])].toDF("label", "vec")
    assert(VectorOps.centroidDrift(ev, ev, "vec", "label").count() == 0L)
  }

  // --------------------------------------------- one-permutation minhash

  test("minhashBandsOph: identical shingle sets → identical signatures " +
      "(all 4 bands collide); near-dups collide on ≥1 band; disjoint " +
      "docs don't; empty buckets densify (no null slots)") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base), (2L, base),                      // exact dup
      (3L, base + " lambda"),                      // near-dup (J ≈ 0.8)
      (4L, "totally different words in this one here now"))
      .toDF("doc_id", "text")
    val cand = DedupOps.minhashLshCandidatesOph(docs, "doc_id",
        TextOps.wordShingles(col("text"), 3))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cand((1L, 2L)) == 4L, "exact dup must collide on every band")
    assert(cand.contains((1L, 3L)) && cand.contains((2L, 3L)))
    assert(!cand.keySet.exists { case (i, j) => i == 4L || j == 4L })
    // densification: 8 shingles into 16 buckets leaves empties — every
    // band signature must still carry 4 non-null slots
    val sigs = DedupOps.minhashBandsOph(docs, "doc_id",
        TextOps.wordShingles(col("text"), 3))
      .select("sig").as[String].collect()
    assert(sigs.nonEmpty && sigs.forall(s => s.split("\\|").length == 4))
  }

  test("nearDupPairs(oph = true): every emitted pair is exact-verified " +
      "≥ threshold — the contract survives the signature swap") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq((1L, base), (2L, base), (3L, base + " lambda"),
      (4L, "totally different words in this one here now"))
      .toDF("doc_id", "text")
    def pairs(useOph: Boolean) = DedupOps.nearDupPairs(docs, "doc_id",
        TextOps.wordShingles(col("text"), 3), 0.5, oph = useOph)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val (classic, viaOph) = (pairs(false), pairs(true))
    // on this fixture both signature schemes surface the same true pairs,
    // and the verified jaccard values are identical (verification is
    // signature-independent)
    assert(viaOph == classic)
    assert(viaOph.values.forall(_ >= 5000L))
  }

  test("OPH vs classic banding on the driver fixture: verified pair sets " +
      "overlap ≥ 90% in both directions") {
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    def verified(useOph: Boolean) = DedupOps.nearDupPairs(d, "doc_id",
        TextOps.wordShingles(col("text"), 3), 0.5, oph = useOph)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (classic, oph) = (verified(false), verified(true))
    assert(classic.nonEmpty)
    val both = (classic & oph).size.toDouble
    assert(both / classic.size >= 0.9,
      s"OPH missed too many classic pairs: ${both.toInt}/${classic.size}")
    assert(both / oph.size >= 0.9,
      s"classic missed too many OPH pairs: ${both.toInt}/${oph.size}")
  }

  // ------------------------------------------------------- token entropy

  test("tokenEntropy: single-token docs score exactly 0; uniform beats " +
      "skewed; hand-computed micro-nats match") {
    val docs = Seq(
      (1L, "a a a a"),               // H = 0
      (2L, "a b c d"),               // uniform: H = ln(4)
      (3L, "a a a b"))               // skewed: H < ln(4)
      .toDF("doc_id", "text")
    val out = TextOps.tokenEntropy(docs, "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out(1L) == ((4L, 0L)))
    // per-term quantized: 4 × floor(1·ln(4)/4·1e6) = 4 × 346573
    assert(out(2L) == ((4L, 4L * math.floor(math.log(4.0) / 4.0 * 1e6).toLong)))
    val h3 = math.floor(3.0 * math.log(4.0 / 3.0) / 4.0 * 1e6).toLong +
      math.floor(1.0 * math.log(4.0) / 4.0 * 1e6).toLong
    assert(out(3L) == ((4L, h3)))
    assert(out(3L)._2 < out(2L)._2)
  }

  // ------------------------------------------------------ centroid drift

  test("centroidDrift: identical snapshots → cos_bp 10000; opposite " +
      "centroids → -10000; one-sided groups emit no row") {
    val a = Seq((0, Seq(1.0f, 0.0f)), (0, Seq(1.0f, 0.2f)),
      (1, Seq(0.0f, 1.0f)), (2, Seq(0.5f, 0.5f)))
      .toDF("label", "vec")
    val same = VectorOps.centroidDrift(a, a, "vec", "label")
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(same == Map(0 -> 10000L, 1 -> 10000L, 2 -> 10000L))
    val flipped = Seq((0, Seq(-1.0f, 0.0f)), (0, Seq(-1.0f, -0.2f)),
      (3, Seq(1.0f, 1.0f)))
      .toDF("label", "vec")
    val out = VectorOps.centroidDrift(a, flipped, "vec", "label")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // only label 0 exists on both sides; sums are exactly representable
    // so the cosine is exactly -1
    assert(out.keySet == Set(0))
    assert(out(0) == ((2L, 2L, -10000L)))
  }

  // ---------------------------------------------- truncated-dim recall

  test("truncated recall: full-width truncation is the identity — " +
      "recall_bp 10000 everywhere; 16-dim recall is sane") {
    val dir = graft.SparkSpec.testDataDir
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val exact = VectorOps.bruteForceTopK(e.filter(col("vec_id") < 5), e,
      "vec_id", "embedding", 5)
    val same = VectorOps.annRecall(
      VectorOps.bruteForceTopK(
        e.withColumn("embedding", slice(col("embedding"), 1, 64))
          .filter(col("vec_id") < 5),
        e.withColumn("embedding", slice(col("embedding"), 1, 64)),
        "vec_id", "embedding", 5),
      exact, "qid", "nid")
    assert(same.select("recall_bp").as[Long].collect().forall(_ == 10000L))
    val tr = e.withColumn("embedding", slice(col("embedding"), 1, 16))
    val r16 = VectorOps.annRecall(
      VectorOps.bruteForceTopK(tr.filter(col("vec_id") < 5), tr,
        "vec_id", "embedding", 5),
      exact, "qid", "nid")
      .collect()
    assert(r16.length == 5)
    r16.foreach { r =>
      val (nEx, bp) = (r.getLong(1), r.getLong(3))
      assert(nEx == 5L && bp >= 0L && bp <= 10000L)
    }
  }
}
