package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-13 second wave: DSIR selection (x86), IVF-PQ (x87), the Gopher
  * decision table (x88), and concat-and-chunk sequence packing (x89).
  */
class Round13bOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- DSIR

  test("DSIR: target == raw makes every bucket weight and doc score zero") {
    val docs = Seq((1L, "aa bb cc"), (2L, "dd ee"), (3L, "aa"))
      .toDF("doc_id", "text")
    val wt = DsirOps.importanceWeightTable(docs, docs)
    assert(wt.filter(col("w_scaled") =!= 0L).count() == 0L)
    val scores = DsirOps.importanceWeights(docs, wt)
    assert(scores.count() == 3L)
    assert(scores.filter(col("logw_sum") =!= 0L).count() == 0L)
  }

  test("DSIR: n_feats counts unigram + bigram occurrences") {
    val docs = Seq((1L, "a b c"), (2L, "x")).toDF("doc_id", "text")
    val wt = DsirOps.importanceWeightTable(docs, docs)
    val n = DsirOps.importanceWeights(docs, wt)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_feats")).toMap
    assert(n(1L) == 5L) // 3 unigrams + 2 bigrams
    assert(n(2L) == 1L) // 1 unigram, no bigram
  }

  test("DSIR: selection ranks target-like docs above target-unlike docs") {
    // raw has two dialects; target speaks only dialect A.
    val raw = Seq(
      (1L, "aa ab aa ab aa"), (2L, "zz zy zz zy zz"),
      (3L, "aa ab zz zy aa"), (4L, "zz zy zz aa zz"))
      .toDF("doc_id", "text")
    val target = Seq((10L, "aa ab aa ab"), (11L, "aa aa ab"))
      .toDF("doc_id", "text")
    val picked = DsirOps.selectTopN(raw, target, 2)
      .collect().map(_.getLong(0)).toSeq
    assert(picked == Seq(1L, 3L)) // pure-A first, mixed second
  }

  // -------------------------------------------------------------- IVF-PQ

  test("pqSeedCodebooks slices the ksub lowest-id vectors per subspace") {
    val vecs = Seq(
      (1L, Array(1f, 2f, 3f, 4f)), (2L, Array(5f, 6f, 7f, 8f)),
      (3L, Array(9f, 9f, 9f, 9f))).toDF("vec_id", "embedding")
    val cb = VectorOps.pqSeedCodebooks(vecs, "vec_id", "embedding",
      m = 2, ksub = 2)
    assert(cb.length == 2 && cb(0).length == 2 && cb(0)(0).length == 2)
    assert(cb(0)(0).toSeq == Seq(1f, 2f) && cb(1)(0).toSeq == Seq(3f, 4f))
    assert(cb(0)(1).toSeq == Seq(5f, 6f) && cb(1)(1).toSeq == Seq(7f, 8f))
  }

  test("IVF-PQ with a lossless codebook equals brute force") {
    // Every corpus vector IS a codeword (ksub = n), so PQ encodes each
    // vector to itself, reconstruction is exact, and with nProbe covering
    // all cells the PQ top-k must equal the exact top-k bit-for-bit.
    // Integer-valued components keep every double sum exact regardless of
    // fold association (subspace-wise vs full-vector).
    val vecs = Seq(
      (1L, Array(1f, 0f, 2f, 1f)), (2L, Array(0f, 3f, 1f, 2f)),
      (3L, Array(2f, 1f, 0f, 4f)), (4L, Array(1f, 1f, 1f, 1f)),
      (5L, Array(3f, 0f, 0f, 1f)), (6L, Array(0f, 2f, 2f, 0f)))
      .toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") <= 2L)
    val cb = VectorOps.pqSeedCodebooks(vecs, "vec_id", "embedding",
      m = 2, ksub = 6)
    val pq = VectorOps.ivfTopKPq(queries, vecs, "vec_id", "embedding", 3,
      cb, numCentroids = 2, nProbe = 2).orderBy("qid", "rk").collect()
    val exact = VectorOps.bruteForceTopK(queries, vecs, "vec_id",
      "embedding", 3).orderBy("qid", "rk").collect()
    assert(pq.map(_.toSeq).toSeq == exact.map(_.toSeq).toSeq)
  }

  test("IVF-PQ with a lossy codebook still emits k ranked rows per query") {
    val vecs = (1L to 20L).map(i =>
      (i, Array.tabulate(4)(d => ((i * 7 + d * 3) % 5 + 1).toFloat)))
      .toDF("vec_id", "embedding")
    val cb = VectorOps.pqSeedCodebooks(vecs, "vec_id", "embedding",
      m = 2, ksub = 4)
    val out = VectorOps.ivfTopKPq(vecs.filter(col("vec_id") <= 3L), vecs,
      "vec_id", "embedding", 5, cb, numCentroids = 4, nProbe = 4)
    val perQ = out.groupBy("qid").agg(count(lit(1)).as("n"),
      max(col("rk")).as("maxrk")).collect()
    assert(perQ.length == 3)
    perQ.foreach { r =>
      assert(r.getAs[Long]("n") == 5L && r.getAs[Long]("maxrk") == 5L)
    }
  }

  test("pqTrainedCodebooks refines per-subspace and scores deterministically") {
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 40).map { i =>
      val c = i % 2
      (i.toLong, Array.tabulate(4)(d =>
        (if (d % 2 == c) 1.0f else 0.0f) + rnd.nextFloat() * 0.1f).toSeq)
    }.toDF("vec_id", "embedding")
    val cb1 = VectorOps.pqTrainedCodebooks(vecs, "vec_id", "embedding",
      m = 2, ksub = 4, iters = 2)
    val cb2 = VectorOps.pqTrainedCodebooks(vecs, "vec_id", "embedding",
      m = 2, ksub = 4, iters = 2)
    assert(cb1.length == 2 && cb1(0).length == 4 && cb1(0)(0).length == 2)
    // exact-arithmetic trainer → identical floats across runs
    cb1.zip(cb2).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
    }
    val out = VectorOps.ivfTopKPq(vecs.filter(col("vec_id") < 3L), vecs,
      "vec_id", "embedding", 3, cb1, numCentroids = 2, nProbe = 2)
    assert(out.groupBy("qid").count().collect().forall(_.getLong(1) == 3L))
  }

  // ----------------------------------------------------------------- BM25

  test("bm25TopK ranks the exact copy first and rare-term matches above " +
      "common-term matches") {
    val corpus = Seq(
      (1L, "quantum flux capacitor design notes"),
      (2L, "quantum flux capacitor design notes"), // exact copy of query 1
      (3L, "capacitor design of the common kind"),
      (4L, "the the the the the common words only"),
      (5L, "flux measurements in the field"))
      .toDF("doc_id", "text")
    val out = TextOps.bm25TopK(corpus.filter(col("doc_id") === 1L), corpus, 3)
      .orderBy("rk").collect()
    assert(out.head.getAs[Long]("did") == 2L) // the copy wins
    assert(!out.map(_.getAs[Long]("did")).contains(1L)) // no self-match
    // doc 3 (two matched terms incl. rarer "capacitor") above doc 4
    val ranks = out.map(r => r.getAs[Long]("did") -> r.getAs[Long]("rk")).toMap
    assert(ranks.contains(3L))
    assert(!ranks.contains(4L) || ranks(3L) < ranks(4L))
  }

  test("bm25TopK n_terms counts distinct matched query terms") {
    val corpus = Seq(
      (1L, "aa bb aa bb"), (2L, "aa bb cc"), (3L, "cc dd"))
      .toDF("doc_id", "text")
    val out = TextOps.bm25TopK(corpus.filter(col("doc_id") === 1L), corpus, 5)
      .collect().map(r => r.getAs[Long]("did") -> r.getAs[Long]("n_terms")).toMap
    assert(out(2L) == 2L) // aa, bb matched once each despite tf=2 in query
    assert(!out.contains(3L)) // no shared term, no row
  }

  test("trained PQ codebooks recall at least as much as seed codebooks " +
      "on clustered data") {
    // 3 separated clusters in 8 dims: k-means-refined codewords land on
    // cluster means, seed codewords are the first ksub raw vectors —
    // reconstruction error (and so ADC ranking noise) strictly shrinks.
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 90).map { i =>
      val c = i % 3
      (i.toLong, Array.tabulate(8)(d =>
        (if (d % 3 == c) 1.0f else 0.1f) + rnd.nextFloat() * 0.15f).toSeq)
    }.toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") < 6L)
    val truth = VectorOps.bruteForceTopK(q, vecs, "vec_id", "embedding", 5)
    def meanRecall(cb: Array[Array[Array[Float]]]): Double = {
      val approx = VectorOps.ivfTopKPq(q, vecs, "vec_id", "embedding", 5,
        cb, numCentroids = 3, nProbe = 3)
      val r = VectorOps.annRecall(approx, truth, "qid", "nid")
        .agg(sum(col("n_hit")), sum(col("n_exact"))).collect().head
      r.getLong(0).toDouble / r.getLong(1)
    }
    val seed = meanRecall(VectorOps.pqSeedCodebooks(
      vecs, "vec_id", "embedding", m = 2, ksub = 4))
    val trained = meanRecall(VectorOps.pqTrainedCodebooks(
      vecs, "vec_id", "embedding", m = 2, ksub = 4, iters = 3))
    assert(trained >= seed,
      s"trained codebooks recalled $trained < seed $seed")
  }

  // ------------------------------------------------------- Gopher filter

  test("gopherFilter: a clean doc passes every rule") {
    val text = ((1 to 58).map(i => f"word$i%02d") ++ Seq("the", "of"))
      .mkString(" ")
    val out = TextOps.gopherFilter(Seq((1L, text)).toDF("doc_id", "text"))
      .collect().head
    assert(out.getAs[Long]("n_words") == 60L)
    assert(out.getAs[Boolean]("keep_n_words"))
    assert(out.getAs[Boolean]("keep_word_len"))
    assert(out.getAs[Boolean]("keep_dup"))
    assert(out.getAs[Boolean]("keep_alpha"))
    assert(out.getAs[Boolean]("keep_sym"))
    assert(out.getAs[Boolean]("keep_stop"))
    assert(out.getAs[Boolean]("keep"))
  }

  test("gopherFilter: each rule fails on its own pathology") {
    val base = ((1 to 58).map(i => f"word$i%02d") ++ Seq("the", "of"))
    val docs = Seq(
      (1L, "too short the of"),                          // n_words
      (2L, (Seq.fill(60)("x") ++ Seq("the", "of")).mkString(" ")), // word len < 3
      (3L, (Seq.fill(55)("the") ++ base.take(5)).mkString(" ")),   // dup words
      (4L, ((1 to 58).map(_.toString) ++ Seq("the", "of")).mkString(" ")), // alpha
      (5L, (base.take(50) ++ Seq.fill(10)("##")).mkString(" ")),   // symbols
      (6L, (1 to 60).map(i => f"word$i%02d").mkString(" ")))       // stopwords
      .toDF("doc_id", "text")
    val out = TextOps.gopherFilter(docs).orderBy("doc_id").collect()
    assert(!out(0).getAs[Boolean]("keep_n_words"))
    assert(!out(1).getAs[Boolean]("keep_word_len"))
    assert(!out(2).getAs[Boolean]("keep_dup"))
    assert(!out(3).getAs[Boolean]("keep_alpha"))
    assert(!out(4).getAs[Boolean]("keep_sym"))
    assert(!out(5).getAs[Boolean]("keep_stop"))
    out.foreach(r => assert(!r.getAs[Boolean]("keep")))
  }

  // ----------------------------------------------------- sequence packing

  test("packSequences cuts the token stream into exact fixed-length spans") {
    val docs = Seq((1L, 5L), (2L, 3L), (3L, 4L)).toDF("doc_id", "n")
    val out = SampleOps.packSequences(docs, "doc_id", "n", seqLen = 4)
      .select("seq_id", "doc_id", "seq_off", "doc_off", "n_toks")
      .orderBy("seq_id", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(out == Seq(
      (0L, 1L, 0L, 0L, 4L), // doc 1 tokens 0..3 fill sequence 0
      (1L, 1L, 0L, 4L, 1L), // doc 1 token 4 opens sequence 1
      (1L, 2L, 1L, 0L, 3L), // doc 2 tokens fill the rest of sequence 1
      (2L, 3L, 0L, 0L, 4L)))
  }

  test("packSequences conserves tokens and fills all but the last sequence") {
    val docs = (1L to 40L).map(i => (i, (i % 7) + 1)).toDF("doc_id", "n")
    val total = docs.agg(sum(col("n"))).collect().head.getLong(0)
    val out = SampleOps.packSequences(docs, "doc_id", "n", seqLen = 16)
    assert(out.agg(sum(col("n_toks"))).collect().head.getLong(0) == total)
    val perSeq = out.groupBy("seq_id").agg(sum(col("n_toks")).as("t"))
      .orderBy("seq_id").collect()
    perSeq.init.foreach(r => assert(r.getAs[Long]("t") == 16L))
    assert(perSeq.last.getAs[Long]("t") <= 16L)
    // per-doc conservation too: a doc's spans reassemble the doc
    val perDoc = out.groupBy("doc_id").agg(sum(col("n_toks")).as("t"))
      .join(docs, Seq("doc_id"))
      .filter(col("t") =!= col("n"))
    assert(perDoc.count() == 0L)
  }

  test("packSequences: zero-token docs contribute no span") {
    val docs = Seq((1L, 0L), (2L, 4L), (3L, 0L)).toDF("doc_id", "n")
    val out = SampleOps.packSequences(docs, "doc_id", "n", seqLen = 4)
    assert(out.select("doc_id").distinct().collect().map(_.getLong(0)).toSeq
      == Seq(2L))
  }

  test("packSequences is append-stable: higher ids never move old spans") {
    val base = (1L to 20L).map(i => (i, (i % 5) + 1)).toDF("doc_id", "n")
    val grown = ((1L to 20L) ++ (21L to 30L)).map(i => (i, (i % 5) + 1))
      .toDF("doc_id", "n")
    val a = SampleOps.packSequences(base, "doc_id", "n", seqLen = 8)
      .select("seq_id", "doc_id", "seq_off", "doc_off", "n_toks")
      .orderBy("seq_id", "doc_id").collect()
    val b = SampleOps.packSequences(grown, "doc_id", "n", seqLen = 8)
      .filter(col("doc_id") <= 20L)
      .select("seq_id", "doc_id", "seq_off", "doc_off", "n_toks")
      .orderBy("seq_id", "doc_id").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("packShards is unchanged by the tokenStarts refactor") {
    val docs = Seq((1L, 5L), (2L, 3L), (3L, 4L)).toDF("doc_id", "n")
    val shards = SampleOps.packShards(docs, "doc_id", "n", budget = 4L)
      .orderBy("doc_id").collect().map(_.getAs[Long]("shard")).toSeq
    assert(shards == Seq(0L, 1L, 2L)) // starts 0, 5, 8 ÷ 4
  }

  // -------------------------------------------------------- normalization

  test("normalizeText canonicalizes case/whitespace/punct noise that " +
      "defeats raw exact dedup") {
    val docs = Seq(
      (1L, "Hello  World"), (2L, "hello world"), (3L, " hello\tworld "),
      (4L, "hello, world!"), (5L, "different text"))
      .toDF("doc_id", "text")
    val norm = docs.select(
      TextOps.normalizeText(col("text")).as("n1"),
      TextOps.normalizeText(col("text"), stripPunct = true).as("n2"))
      .collect()
    assert(norm.map(_.getString(0)).take(3).distinct.length == 1)
    // the comma survives plain normalization, dies with stripPunct
    assert(norm.map(_.getString(0)).distinct.length == 3)
    assert(norm.map(_.getString(1)).distinct.length == 2)
    val kept = DedupOps.exact(
      docs.withColumn("text", TextOps.normalizeText(col("text"), stripPunct = true)),
      "doc_id", "text")
    assert(kept.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 5L))
  }

  // --------------------------------------------------------- dataset card

  test("sourceReport aggregates counts, dup rate, and modal language") {
    val good = ((1 to 58).map(i => f"word$i%02d") ++ Seq("the", "of"))
      .mkString(" ")
    val docs = Seq(
      (1L, "srcA", "en", good),
      (2L, "srcA", "en", good),            // exact dup of doc 1
      (3L, "srcA", "fr", "petit texte"),   // fails Gopher (too short)
      (4L, "srcB", "de", "kurz"))
      .toDF("doc_id", "source", "lang", "text")
    val out = StatOps.sourceReport(docs).orderBy("source").collect()
    val a = out(0)
    assert(a.getAs[String]("source") == "srcA")
    assert(a.getAs[Long]("n_docs") == 3L)
    assert(a.getAs[Long]("n_distinct_texts") == 2L)
    assert(a.getAs[Long]("dup_text_bp") == 3333L) // 1 of 3 duplicated
    assert(a.getAs[Long]("keep_bp") == 6666L)     // 2 of 3 pass Gopher
    assert(a.getAs[String]("top_lang") == "en")
    assert(a.getAs[Long]("top_lang_bp") == 6666L)
    val b = out(1)
    assert(b.getAs[Long]("n_docs") == 1L && b.getAs[String]("top_lang") == "de")
  }

  test("sourceReport breaks language-mode ties on the smaller lang") {
    val docs = Seq(
      (1L, "s", "en", "x"), (2L, "s", "de", "y"))
      .toDF("doc_id", "source", "lang", "text")
    val out = StatOps.sourceReport(docs).collect().head
    assert(out.getAs[String]("top_lang") == "de")
  }

  // ---------------------------------------------------- manifest composite

  test("training-manifest stages compose: quality gate, canonical dedup, " +
      "rebalance, packing conserve what they should") {
    val good = (0 until 30)
      .map(i => "word" + ('a' + i / 10).toChar + ('a' + i % 10).toChar)
      .mkString(" ")
    val docs = Seq(
      (1L, "srcA", good),
      (2L, "srcA", good.replace(" ", "  ") + ","), // canonical dup of doc 1
      (3L, "srcA", good + " extraone"),
      (4L, "srcB", good + " extratwo"),
      (5L, "srcB", "123 456 789"))      // fails the alpha quality gate
      .toDF("doc_id", "source", "text")
    val quality = TextOps.qualityScore(docs)
      .filter(col("n_words") >= 20 && col("alpha_ratio_bp") >= 7000)
      .select("doc_id", "source", "text")
    assert(quality.count() == 4L) // doc 5 gone
    val canon = quality.withColumn("__ct",
      TextOps.normalizeText(col("text"), stripPunct = true))
    val kept = DedupOps.exact(
      canon.select(col("doc_id"), col("__ct")), "doc_id", "__ct")
    val surv = canon.join(kept, Seq("doc_id"), "left_semi")
    assert(surv.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 3L, 4L)) // doc 2 collapsed into doc 1
    val bal = SampleOps.temperatureSample(surv, "doc_id", "source")
    val toks = bal.select(col("doc_id"),
      size(split(col("text"), " "))
        .cast(org.apache.spark.sql.types.LongType).as("n"))
    val total = toks.agg(sum(col("n"))).collect().head.getLong(0)
    val manifest = SampleOps.packSequences(toks, "doc_id", "n", seqLen = 16)
    assert(manifest.agg(sum(col("n_toks"))).collect().head.getLong(0) == total)
  }

  // --------------------------------------------------- degenerate inputs

  test("DSIR: empty target still yields finite weights for every doc") {
    val raw = Seq((1L, "aa bb"), (2L, "cc")).toDF("doc_id", "text")
    val target = raw.filter(col("doc_id") < 0L)
    val out = DsirOps.selectTopN(raw, target, 10)
    // smoothing keeps ln arguments positive with zero target mass; the
    // cut larger than the corpus returns everything
    assert(out.count() == 2L)
    assert(out.filter(col("logw_sum").isNull).count() == 0L)
  }

  test("bm25TopK: queries sharing no term with the corpus emit no rows") {
    val corpus = Seq((1L, "aa bb"), (2L, "cc dd")).toDF("doc_id", "text")
    val q = Seq((9L, "zz yy")).toDF("doc_id", "text")
    assert(TextOps.bm25TopK(q, corpus, 5).count() == 0L)
  }

  test("gopherFilter survives empty text without dividing by zero") {
    val out = TextOps.gopherFilter(Seq((1L, "")).toDF("doc_id", "text"))
      .collect().head
    assert(out.getAs[Long]("n_words") == 1L) // split("") = [""]
    assert(!out.getAs[Boolean]("keep"))      // fails the word-count rule
  }

  test("packSequences seqLen=1 emits one span per token") {
    val docs = Seq((1L, 3L), (2L, 2L)).toDF("doc_id", "n")
    val out = SampleOps.packSequences(docs, "doc_id", "n", seqLen = 1)
    assert(out.count() == 5L)
    assert(out.filter(col("n_toks") =!= 1L).count() == 0L)
  }

  test("ivfTopKPq rejects ragged codebooks; pqSeedCodebooks rejects " +
      "indivisible dims and empty corpora loudly") {
    val vecs = Seq((1L, Array(1f, 2f, 3f, 4f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      VectorOps.pqSeedCodebooks(vecs, "vec_id", "embedding", m = 3, ksub = 1)
    }
    intercept[IllegalArgumentException] {
      VectorOps.pqSeedCodebooks(vecs.filter(col("vec_id") < 0L),
        "vec_id", "embedding", m = 2, ksub = 1)
    }
    val ragged = Array(
      Array(Array(1f, 2f), Array(3f, 4f)),
      Array(Array(5f, 6f)))
    intercept[IllegalArgumentException] {
      VectorOps.ivfTopKPq(vecs, vecs, "vec_id", "embedding", 1, ragged)
    }
  }
}
