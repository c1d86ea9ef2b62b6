package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Model-artifact persist/reload: for every artifact class the contract is
  * load-then-score ≡ train-then-score BIT-FOR-BIT (the x73 row-identity
  * pattern) — the persisted model must be the model, not an approximation
  * of it.
  */
class ModelIOSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-modelio-$tag").resolve("artifact").toString

  // deterministic toy embedding corpus: 3 separated clusters in 8 dims
  private lazy val vecs = {
    val rnd = new scala.util.Random(5)
    (0 until 60).map { i =>
      val c = i % 3
      val v = Array.tabulate(8)(d =>
        (if (d % 3 == c) 1.0f else 0.0f) + rnd.nextFloat() * 0.1f)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("codebook round-trips bit-for-bit and probes identically") {
    val trained = VectorOps.kmeansCentroidsExact(vecs, "vec_id", "embedding",
      k = 4, iters = 2)
    val path = tmp("codebook")
    ModelIO.saveCodebook(spark, path, trained.toSeq)
    val loaded = ModelIO.loadCodebook(spark, path)
    assert(loaded.length == trained.length)
    trained.zip(loaded).foreach { case (a, b) =>
      assert(a.sameElements(b), "centroid floats drifted through parquet")
    }
    val q = vecs.filter(col("vec_id") < 5)
    val fresh = VectorOps.ivfTopKWithCentroids(q, vecs, "vec_id", "embedding",
      3, trained.toSeq, nProbe = 2).orderBy("qid", "nid").collect()
    val replay = VectorOps.ivfTopKWithCentroids(q, vecs, "vec_id", "embedding",
      3, loaded.toSeq, nProbe = 2).orderBy("qid", "nid").collect()
    assert(fresh.sameElements(replay))
  }

  test("sqScale round-trips exactly (quantized scoring unchanged)") {
    val scale = VectorOps.sqScale(vecs, "embedding")
    val path = tmp("qscale")
    ModelIO.saveSqScale(spark, path, scale)
    val loaded = ModelIO.loadSqScale(spark, path)
    assert(java.lang.Double.doubleToRawLongBits(loaded) ==
      java.lang.Double.doubleToRawLongBits(scale))
  }

  test("BPE merge list round-trips and tokenizes identically") {
    val docs = Seq("low lower lowest", "newest widest low", "low low")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (merges, _) = BpeOps.trainMerges(docs, merges = 5)
    val path = tmp("bpe")
    ModelIO.saveBpeMerges(spark, path, merges)
    val loaded = ModelIO.loadBpeMerges(spark, path)
    assert(loaded == merges)
    val fresh = BpeOps.tokenize(docs, "doc_id", merges)
      .orderBy("doc_id").collect()
    val replay = BpeOps.tokenize(docs, "doc_id", loaded)
      .orderBy("doc_id").collect()
    assert(fresh.sameElements(replay))
  }

  test("loadBpeMerges rejects a rank hole loudly") {
    val path = tmp("bpe-hole")
    ModelIO.saveBpeMerges(spark, path, Seq(
      BpeOps.Merge(1, "a", "b", 9L), BpeOps.Merge(3, "c", "d", 5L)))
    val e = intercept[IllegalArgumentException] {
      ModelIO.loadBpeMerges(spark, path)
    }
    assert(e.getMessage.contains("not contiguous"))
  }

  test("Bloom sketch round-trips and probes identically") {
    val ref = (0 until 200).map(i => s"h$i").toDF("__h")
    val probeDocs = (150 until 260).map(i => (i.toLong, s"h$i"))
      .toDF("doc_id", "__h")
    val sketch = StatOps.bloomSketch(ref, "__h", mBits = 1024, kHashes = 3)
    val path = tmp("bloom")
    ModelIO.saveBloomSketch(sketch, path)
    val loaded = ModelIO.loadBloomSketch(spark, path)
    val fresh = StatOps.bloomProbe(probeDocs, "doc_id", "__h", sketch,
      1024, 3).orderBy("doc_id").collect()
    val replay = StatOps.bloomProbe(probeDocs, "doc_id", "__h", loaded,
      1024, 3).orderBy("doc_id").collect()
    assert(fresh.sameElements(replay))
    // the reloaded sketch still carries its parameters: a mismatched
    // probe fails loudly, not silently wrong
    val err = intercept[Exception] {
      StatOps.bloomProbe(probeDocs, "doc_id", "__h", loaded, 2048, 3)
        .collect()
    }
    assert(err.getMessage.contains("bloomProbe"))
  }

  test("classifier vocab round-trips: load-then-score == train-then-score") {
    val docs = (0 until 40).map { i =>
      val filler = Seq.fill(6)(s"tok${i % 7}").mkString(" ")
      (i.toLong,
        if (i % 2 == 0) s"the a of and in good prose here $filler"
        else s"zz qq $filler")
    }.toDF("doc_id", "text")
    val vocab = TextOps.qualityClassifierTrain(docs)
    val path = tmp("vocab")
    ModelIO.saveClassifierVocab(vocab, path)
    val loaded = ModelIO.loadClassifierVocab(spark, path)
    val combined = TextOps.qualityClassifierScore(docs, "doc_id")
      .orderBy("doc_id").collect()
    val replay = TextOps.qualityClassifierScoreWith(docs, "doc_id", loaded)
      .orderBy("doc_id").collect()
    assert(combined.sameElements(replay))
  }

  test("BM25 postings round-trip: load-then-score == build-then-score") {
    val corpus = (0 until 30).map { i =>
      (i.toLong, s"term${i % 5} term${i % 3} common word doc$i filler text")
    }.toDF("doc_id", "text")
    val queries = corpus.filter($"doc_id" < 3)
    val direct = TextOps.bm25TopK(queries, corpus, k = 4)
      .orderBy("qid", "rk").collect()
    val path = tmp("bm25")
    ModelIO.saveBm25Postings(TextOps.bm25Postings(corpus), path)
    val replay = TextOps.bm25TopKWith(queries,
        ModelIO.loadBm25Postings(spark, path), k = 4)
      .orderBy("qid", "rk").collect()
    assert(direct.sameElements(replay))
    // the postings really are the complete index: an empty-text doc still
    // counts toward N (split("") yields one empty token)
    val withEmpty = corpus.unionByName(Seq((99L, "")).toDF("doc_id", "text"))
    val n = TextOps.bm25Postings(withEmpty)
      .agg(countDistinct($"did")).as[Long].head()
    assert(n == 31L)
  }

  test("loads reject a wrong-artifact path loudly") {
    val path = tmp("wrong")
    Seq((1L, "x")).toDF("a", "b").write.parquet(path)
    val e = intercept[IllegalArgumentException] {
      ModelIO.loadCodebook(spark, path)
    }
    assert(e.getMessage.contains("not the expected artifact"))
  }

  test("DSIR weight table round-trips: load-then-score == train-then-score") {
    val raw = (0 until 30).map { i =>
      (i.toLong, if (i % 3 == 0) "aa ab aa ab" else "zz zy zz zy")
    }.toDF("doc_id", "text")
    val target = raw.filter(col("doc_id") % 3 === 0)
    val wt = DsirOps.importanceWeightTable(raw, target)
    val path = tmp("dsir")
    ModelIO.saveDsirWeights(wt, path)
    val loaded = ModelIO.loadDsirWeights(spark, path)
    val fresh = DsirOps.importanceWeights(raw, wt)
      .orderBy("doc_id").collect()
    val replay = DsirOps.importanceWeights(raw, loaded)
      .orderBy("doc_id").collect()
    assert(fresh.sameElements(replay))
  }

  test("DSIR scoring under a persisted table: unseen-bucket docs score " +
      "via the Laplace floor, a modulus mismatch fails loudly") {
    val raw = (0 until 30).map { i =>
      (i.toLong, if (i % 3 == 0) "aa ab aa ab" else "zz zy zz zy")
    }.toDF("doc_id", "text")
    val target = raw.filter(col("doc_id") % 3 === 0)
    val wt = DsirOps.importanceWeightTable(raw, target)
    // a NEW corpus whose features were never seen at build time: every
    // doc must still get a row (left join + derivable fallback weight),
    // not silently vanish from the selection
    val novel = Seq((100L, "qq qr qs qt totally new tokens everywhere"))
      .toDF("doc_id", "text")
    val scored = DsirOps.importanceWeights(novel, wt).collect()
    assert(scored.length == 1)
    assert(scored.head.getLong(1) > 0)   // n_feats counts every feature
    // the unseen-bucket weight is the neutral Laplace floor: per
    // feature it must sit ABOVE a raw-only (target-disfavored) doc's
    // weights — the mark of a finite fallback, not a silent drop or -inf
    val rawOnly = DsirOps.importanceWeights(
      Seq((101L, "zz zy zz zy")).toDF("doc_id", "text"), wt).collect()
    def perFeat(r: org.apache.spark.sql.Row) =
      r.getLong(2).toDouble / r.getLong(1).toDouble
    assert(perFeat(scored.head) > perFeat(rawOnly.head))
    // probing with a different modulus than the build must raise, not
    // look up wrong buckets: nb rides in the table
    val e = intercept[Exception] {
      DsirOps.importanceWeights(raw, wt, numBuckets = 2048).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(10).map(t => String.valueOf(t.getMessage))
    assert(msgs.exists(_.contains("numBuckets")), e.toString)
  }

  test("TRAINED PQ codebooks round-trip and probe identically (the x126 " +
      "serving artifact)") {
    val cb = VectorOps.pqTrainedCodebooks(vecs, "vec_id", "embedding",
      m = 2, ksub = 4, iters = 2)
    val path = tmp("pqt")
    ModelIO.savePqCodebooks(spark, path, cb)
    val loaded = ModelIO.loadPqCodebooks(spark, path)
    cb.zip(loaded).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
    }
    val q = vecs.filter(col("vec_id") < 5)
    val fresh = VectorOps.ivfTopKPq(q, vecs, "vec_id", "embedding", 3,
      cb, numCentroids = 3, nProbe = 2).orderBy("qid", "nid").collect()
    val replay = VectorOps.ivfTopKPq(q, vecs, "vec_id", "embedding", 3,
      loaded, numCentroids = 3, nProbe = 2).orderBy("qid", "nid").collect()
    assert(fresh.nonEmpty && fresh.sameElements(replay))
  }

  test("PQ codebooks round-trip bit-for-bit and probe identically") {
    val cb = VectorOps.pqSeedCodebooks(vecs, "vec_id", "embedding",
      m = 2, ksub = 8)
    val path = tmp("pq")
    ModelIO.savePqCodebooks(spark, path, cb)
    val loaded = ModelIO.loadPqCodebooks(spark, path)
    assert(loaded.length == cb.length)
    cb.zip(loaded).foreach { case (a, b) =>
      assert(a.length == b.length)
      a.zip(b).foreach { case (x, y) =>
        assert(x.sameElements(y), "codeword floats drifted through parquet")
      }
    }
    val q = vecs.filter(col("vec_id") < 5)
    val fresh = VectorOps.ivfTopKPq(q, vecs, "vec_id", "embedding", 3,
      cb, numCentroids = 3, nProbe = 2).orderBy("qid", "nid").collect()
    val replay = VectorOps.ivfTopKPq(q, vecs, "vec_id", "embedding", 3,
      loaded, numCentroids = 3, nProbe = 2).orderBy("qid", "nid").collect()
    assert(fresh.sameElements(replay))
  }

  test("winnow fingerprint index round-trips: load-then-pair == " +
      "build-then-pair") {
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, t1), (2L, t1 + " extra tail words here"),
      (3L, "one two three four five six seven eight nine ten"),
      (4L, "totally different words in this document entirely now yes"))
      .toDF("doc_id", "text")
    val fps = TextOps.winnowFingerprints(docs, "doc_id", k = 3, w = 4)
    val path = tmp("winnow")
    ModelIO.saveWinnowIndex(fps, "doc_id", path)
    val loaded = ModelIO.loadWinnowIndex(spark, path)
    // the artifact IS the selection: same (doc, pos, fp) rows bit-for-bit
    val savedRows = fps.select(col("doc_id").as("did"), col("pos"), col("fp"))
      .orderBy("did", "pos", "fp").collect()
    assert(savedRows.sameElements(loaded.orderBy("did", "pos", "fp").collect()))
    // load-then-pair ≡ build-then-pair (the from-docs form delegates to
    // the from-index form, so this also pins the delegation refactor)
    val direct = DedupOps.winnowOverlapPairs(docs, "doc_id", k = 3, w = 4)
      .orderBy("i", "j").collect()
    val replay = DedupOps.winnowOverlapPairsFromIndex(loaded, "did")
      .orderBy("i", "j").collect()
    assert(direct.nonEmpty, "fixture must produce at least one overlap pair")
    assert(direct.sameElements(replay))
  }

  test("token NB model round-trips: load-then-score == train-then-score") {
    val train = Seq(
      (1L, "good good fine", true), (2L, "good stuff", true),
      (3L, "bad bad stuff", false), (4L, "bad junk", false))
      .toDF("doc_id", "text", "pos")
    val test = Seq((10L, "good bad unseen"), (11L, "stuff fine"))
      .toDF("doc_id", "text")
    val model = ClassifyOps.trainTokenNb(train, "pos")
    val path = tmp("nb")
    ModelIO.saveNbModel(model, path)
    val loaded = ModelIO.loadNbModel(spark, path)
    val direct = ClassifyOps.scoreTokenNb(test, model)
      .orderBy("doc_id").collect()
    val replay = ClassifyOps.scoreTokenNb(test, loaded)
      .orderBy("doc_id").collect()
    assert(direct.sameElements(replay))
    // integer scores: persisted weights ARE the weights
    val w0 = model.weights.select("token", "w").as[(String, Long)]
      .collect().toMap
    val w1 = loaded.weights.select("token", "w").as[(String, Long)]
      .collect().toMap
    assert(w0 == w1)
  }
}
