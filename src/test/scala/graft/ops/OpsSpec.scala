package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Unit specs for the training-data-pipeline operators (dedup, similarity,
  * text analysis) on tiny in-memory tables with hand-checkable answers.
  */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "completely different content with unique words here"),
    (3L, "the quick brown fox jumps over the lazy dog")  // exact dup of 0
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id per content hash") {
    val kept = DedupOps.exact(docs, "doc_id", "text")
      .as[Long].collect().sorted.toSeq
    assert(kept == Seq(0L, 1L, 2L))
  }

  test("ngram jaccard finds near and exact dup pairs, skips unrelated") {
    val pairs = DedupOps.ngramJaccardPairs(docs, "doc_id",
        TextOps.wordShingles(col("text"), 3), 0.5)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L))) // exact dup → jaccard 1.0
    assert(pairs.contains((0L, 1L)) && pairs.contains((1L, 3L))) // near-dup
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("minhash LSH candidates cover the true near-dup pairs") {
    val cands = DedupOps.minhashLshCandidates(docs, "doc_id",
        TextOps.wordShingles(col("text"), 3))
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(cands.contains((0L, 3L)) && cands.contains((0L, 1L)))
    assert(!cands.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("simhash: identical docs collide, near-dups are close, rest far") {
    val codes = DedupOps.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(codes(0L) == codes(3L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(codes(0L), codes(1L)) < ham(codes(0L), codes(2L)))
  }

  test("cosine is exact on hand-checkable vectors") {
    val df = Seq((Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
      (Array(1f, 2f, 2f), Array(1f, 2f, 2f)),
      (Array(3f, 4f, 0f), Array(4f, 3f, 0f)))
      .toDF("a", "b")
      .select(VectorOps.cosine(col("a"), col("b")).as("c"))
    val got = df.as[Double].collect().toSeq
    assert(got(0) == 0.0)
    assert(math.abs(got(1) - 1.0) < 1e-15)
    assert(math.abs(got(2) - 24.0 / 25.0) < 1e-15)
  }

  test("brute-force top-k ranks by cosine with id tiebreak") {
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(1f, 0.1f)),
      (2L, Array(0f, 1f)), (3L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val top = VectorOps.bruteForceTopK(
        vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding", 2)
      .select("nid", "rk").as[(Long, Long)].collect().toSeq
    assert(top == Seq((3L, 1L), (1L, 2L))) // exact match first, then closest
  }

  test("LSH top-k is a subset of brute-force with matching ranks per bucket") {
    val vecs = (0L until 40L).map { i =>
      i -> Array.tabulate(8)(d => math.sin(i * 7.0 + d).toFloat)
    }.toDF("vec_id", "embedding")
    val lsh = VectorOps.lshTopK(vecs.filter($"vec_id" < 3), vecs, "vec_id",
        "embedding", 3, dim = 8, numPlanes = 4)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val brute = VectorOps.bruteForceTopK(vecs.filter($"vec_id" < 3), vecs,
        "vec_id", "embedding", 39)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(lsh.nonEmpty && lsh.subsetOf(brute))
  }

  test("IVF top-k: rank-1 probe finds same-cell neighbors, subset of brute") {
    val vecs = (0L until 40L).map { i =>
      i -> Array.tabulate(8)(d => math.sin(i * 7.0 + d).toFloat)
    }.toDF("vec_id", "embedding")
    val ivf = VectorOps.ivfTopK(vecs.filter($"vec_id" < 3), vecs, "vec_id",
        "embedding", 3, numCentroids = 4, nProbe = 2)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val brute = VectorOps.bruteForceTopK(vecs.filter($"vec_id" < 3), vecs,
        "vec_id", "embedding", 39)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(ivf.nonEmpty && ivf.subsetOf(brute))
    // a query always probes its own cell, so its exact-duplicate region
    // (here: itself excluded, but its nearest same-cell vec) is reachable.
    assert(ivf.map(_._1) == Set(0L, 1L, 2L))
  }

  test("resampleFill densifies buckets and forward-fills gaps per key") {
    // key a: events in buckets 0 and 3 (gap at 1, 2); key b: single bucket
    val ev = Seq(
      ("a", 100L, 1.0), ("a", 500L, 2.0),     // bucket 0 (interval 1000µs)
      ("a", 3100L, 9.0),                      // bucket 3
      ("b", 7500L, 4.0))                      // bucket 7
      .toDF("k", "us", "value")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("value"))
    val got = TimeOps.resampleFill(ev, "k", "ts", "value", 1000L)
      .orderBy("k", "b")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      ("a", 0L, 2.0),   // max of bucket 0
      ("a", 1L, 2.0),   // gap: carried forward
      ("a", 2L, 2.0),
      ("a", 3L, 9.0),
      ("b", 7L, 4.0)))
  }

  test("repetitionScore: duplicate word and bigram fractions in bp") {
    val docs = Seq(
      (1L, "a b a b a"),     // 5 words, 2 uniq → dup 3/5; 4 bigrams, 2 uniq
      (2L, "all words fresh here"),
      (3L, "solo")).toDF("doc_id", "text")
    val r = TextOps.repetitionScore(docs).orderBy("doc_id")
      .select("n_words", "dup_word_bp", "dup_bigram_bp")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r(0) == ((5L, 6000L, 5000L)))
    assert(r(1) == ((4L, 0L, 0L)))
    assert(r(2) == ((1L, 0L, 0L)))
  }

  test("redactPii scrubs emails, IPs, phones in order and counts matches") {
    val docs = Seq(
      (1L, "reach bob.smith+x@corp.example.org or 192.168.0.12 or +44 20-7946-0958 ok"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val r = TextOps.redactPii(docs).orderBy("doc_id")
      .select("red", "n_email", "n_ip", "n_phone")
      .collect()
    assert(r(0).getString(0) == "reach <EMAIL> or <IP> or <PHONE> ok")
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3)) == ((1L, 1L, 1L)))
    assert(r(1).getString(0) == "no pii here at all")
    assert((r(1).getLong(1), r(1).getLong(2), r(1).getLong(3)) == ((0L, 0L, 0L)))
  }

  test("kmeansCentroids converges to the blob means of separated clusters") {
    // three tight blobs around distinct corners of a 4-cube
    val centers = Seq(
      Array(0f, 0f, 0f, 0f), Array(10f, 10f, 0f, 0f), Array(0f, 0f, 10f, 10f))
    val pts = (0L until 30L).map { i =>
      val c = centers((i % 3).toInt)
      (i, c.zipWithIndex.map { case (v, d) =>
        v + 0.1f * (((i * 7 + d) % 5).toInt - 2) })
    }.toDF("vec_id", "embedding")
    val trained = VectorOps.kmeansCentroids(pts, "vec_id", "embedding", 3, 4)
    // every blob mean is ~a trained centroid (seeds are 3 pts of blob 0/1/2)
    centers.foreach { c =>
      val best = trained.map(t =>
        t.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum).min
      assert(best < 1.0, s"no centroid near ${c.mkString(",")}")
    }
  }

  test("kmeans-trained IVF finds the brute-force nearest neighbour") {
    // 3 well-separated blobs; train centroids, then IVF against them
    val pts = (0L until 60L).map { i =>
      val blob = (i % 3).toInt
      i -> Array.tabulate(8) { d =>
        (if (d == blob * 2) 10f else 0f) + 0.1f * (((i * 13 + d) % 7).toInt - 3)
      }
    }.toDF("vec_id", "embedding")
    val trained = VectorOps.kmeansCentroids(pts, "vec_id", "embedding", 3, 5)
    val queries = pts.filter($"vec_id" < 6)
    val ivf = VectorOps.ivfTopKWithCentroids(queries, pts, "vec_id",
        "embedding", k = 1, centroids = trained.toSeq, nProbe = 1)
      .select("qid", "nid").as[(Long, Long)].collect().toMap
    val brute = VectorOps.bruteForceTopK(queries, pts, "vec_id", "embedding", 1)
      .select("qid", "nid").as[(Long, Long)].collect().toMap
    // with clean blobs and trained centroids, 1-probe IVF recalls the
    // exact top-1 for every query
    assert(ivf == brute, s"ivf $ivf vs brute $brute")
  }

  test("langId picks the right profile for natural-language snippets") {
    val snippets = Seq(
      (1L, "the king and the queen of the north are riding"),
      (2L, "la casa de la abuela que tiene la puerta grande"),
      (3L, "die kinder und der hund schwimmen in dem see")).toDF("doc_id", "text")
    val got = TextOps.langId(snippets).select("doc_id", "pred_lang")
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "en" && got(2L) == "es" && got(3L) == "de")
  }

  test("fingerprint: exact dups share fp, distinct content differs") {
    val fps = TextOps.fingerprint(docs).select("doc_id", "fp")
      .as[(Long, String)].collect().toMap
    assert(fps(0L) == fps(3L))
    assert(fps(0L) != fps(2L))
    assert(fps(0L).length == 4 * 32)
  }

  test("simhashPairs Manku combo blocking returns the identical pair set") {
    // 3 groups of 4 identical docs (ham 0 within a group) + near variants
    val corpus = (0L until 12L).map(i =>
      (i, s"the quick brown fox jumps over the lazy dog variant${i % 3}"))
      .toDF("doc_id", "text")
    val default = DedupOps.simhashPairs(corpus, "doc_id", "text", 3)
      .select("i", "j", "ham").as[(Long, Long, Long)].collect().toSet
    val combo = DedupOps.simhashPairs(corpus, "doc_id", "text", 3,
        blockingChunks = 7)
      .select("i", "j", "ham").as[(Long, Long, Long)].collect().toSet
    assert(combo == default, "combo blocking changed the exact result set")
    assert(default.nonEmpty, "corpus produced no near-dup pairs to compare")
  }

  test("maxBucket cap drops hot-shingle buckets, keeps under-cap pairs") {
    // 10 docs share two hot shingles ("hot one two", "one two three") →
    // buckets of 10; docs 100/101 are genuine near-dups via size-2 buckets.
    val hot = (0L until 10L).map(i => (i, s"hot one two three u$i v$i w$i"))
    val corpus = (hot ++ Seq(
      (100L, "alpha beta gamma delta epsilon"),
      (101L, "alpha beta gamma delta zeta"))).toDF("doc_id", "text")
    val sh = TextOps.wordShingles(col("text"), 3)
    val capped = DedupOps.ngramJaccardPairs(corpus, "doc_id", sh, 0.1,
        maxBucket = 5)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val uncapped = DedupOps.ngramJaccardPairs(corpus, "doc_id", sh, 0.1)
      .select("i", "j").as[(Long, Long)].collect().toSet
    // hot buckets carried every 0-9 pair; the under-cap pair is unchanged
    assert(capped == Set((100L, 101L)))
    assert(uncapped.contains((0L, 1L)) && uncapped.contains((100L, 101L)))
  }

  test("simhashPairs maxHamming >= 60 is the all-pairs degenerate contract") {
    val three = Seq((1L, "aa bb cc"), (2L, "totally other words"),
      (3L, "unrelated third document")).toDF("doc_id", "text")
    val pairs = DedupOps.simhashPairs(three, "doc_id", "text", 60)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // the all-pairs contract ignores maxBucket: a cap below the corpus size
    // must not silently return an empty result
    val capped = DedupOps.simhashPairs(three, "doc_id", "text", 60,
      maxBucket = 2)
    assert(capped.count() == 3)
  }

  test("semanticDedup and ivfTopK seed centroids for any id domain") {
    // ids start at 1000 — filter(id < numCentroids) would select nothing
    def axis(d: Int, scale: Float = 1f) =
      Array.tabulate(8)(i => if (i == d) scale else 0f)
    val vecs = ((0 until 8).map(d => (1000L + d, axis(d))) ++ Seq(
      (2000L, axis(0, 2f)))).toDF("vec_id", "embedding")
    val kept = VectorOps.semanticDedup(vecs, "vec_id", "embedding",
        numCentroids = 8, threshold = 0.9)
      .as[Long].collect().toSet
    assert(!kept.contains(2000L), "dedup silently skipped (empty centroids?)")
    assert(kept.contains(1000L))
  }

  test("connectedComponents collapses pair chains into min-id components") {
    // chain 1-2, 2-3 plus isolated pair 10-11: components {1,2,3} and {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("i", "j")
    val comps = DedupOps.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // long chain exercises multi-round propagation
    val chain = (1L until 8L).map(k => (k, k + 1)).toDF("i", "j")
    val c2 = DedupOps.connectedComponents(chain).as[(Long, Long)].collect()
    assert(c2.forall(_._2 == 1L) && c2.length == 8)
    assert(DedupOps.connectedComponents(
      Seq.empty[(Long, Long)].toDF("i", "j")).count() == 0)
    // unconverged at maxIter must fail loudly, not return partial labels
    val long = (1L until 12L).map(k => (k, k + 1)).toDF("i", "j")
    val err = intercept[IllegalStateException](
      DedupOps.connectedComponents(long, maxIter = 2))
    assert(err.getMessage.contains("did not converge"))
    // ... unless partial labels were explicitly requested
    assert(DedupOps.connectedComponents(long, maxIter = 2,
      requireConvergence = false).count() == 12)
  }

  test("hashSplit covers every row deterministically; topKPerKey bounds keys") {
    val rows = (0L until 200L).map(i => (i, s"k${i % 4}")).toDF("id", "key")
    val split = SampleOps.hashSplit(rows, "id",
      Seq(("train", 8000), ("val", 9000), ("test", 10000)))
    val byLabel = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(byLabel.values.sum == 200)
    assert(byLabel.keySet.subsetOf(Set("train", "val", "test")))
    assert(byLabel("train") > byLabel.getOrElse("test", 0L)) // ~80 vs ~10
    // deterministic: same assignment on re-run
    val again = SampleOps.hashSplit(rows, "id",
      Seq(("train", 8000), ("val", 9000), ("test", 10000)))
    assert(split.select("id", "split").except(again.select("id", "split")).count() == 0)
    val capped = SampleOps.topKPerKey(rows, "key", "id", 10)
    val perKey = capped.groupBy("key").count().as[(String, Long)].collect().toMap
    assert(perKey.values.forall(_ == 10))
    // sampling keeps roughly rate and is a subset of the input
    val s5 = SampleOps.hashSample(rows, "id", 5000)
    assert(s5.count() > 60 && s5.count() < 140)
  }

  test("semanticDedup drops the higher id of each within-cell near-dup") {
    // 8 seed centroids (ids 0-7) spread on distinct axes; ids 20,21 are
    // near-duplicates of centroid 0's direction; 30 is its own direction.
    def axis(d: Int, scale: Float = 1f) =
      Array.tabulate(8)(i => if (i == d) scale else 0f)
    val vecs = ((0 until 8).map(d => (d.toLong, axis(d))) ++ Seq(
      (20L, axis(0, 2f)), (21L, axis(0, 3f)),
      (30L, Array.tabulate(8)(i => if (i < 2) 1f else 0f)))).toDF("vec_id", "embedding")
    val kept = VectorOps.semanticDedup(vecs, "vec_id", "embedding",
        numCentroids = 8, threshold = 0.9)
      .as[Long].collect().toSet
    // 0, 20, 21 share cell 0 with cosine 1.0 → only 0 survives of the trio
    assert(!kept.contains(20L) && !kept.contains(21L))
    assert(kept.contains(0L) && kept.contains(30L))
    assert((1 until 8).forall(d => kept.contains(d.toLong)))
  }

  test("contaminationHits counts distinct shared shingles vs the benchmark") {
    val corpus = Seq(
      (10L, "alpha beta gamma delta"),         // shares 2 bench shingles
      (11L, "alpha beta gamma other words"),   // shares 1
      (12L, "nothing in common here at all")).toDF("doc_id", "text")
    val bench = Seq((0L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val sh = TextOps.wordShingles(col("text"), 3)
    val hits = DedupOps.contaminationHits(corpus, "doc_id", sh, bench, sh)
      .as[(Long, Long)].collect().toMap
    assert(hits == Map(10L -> 2L, 11L -> 1L)) // doc 12 absent (0 hits)
  }

  test("packShards equals the naive global running-sum assignment") {
    // ids with gaps across several buckets; budget 10 tokens
    val rows = Seq((0L, 4L), (1L, 4L), (7L, 5L), (12L, 3L), (25L, 9L),
      (31L, 2L), (40L, 8L)).toDF("id", "tok")
    val got = SampleOps.packShards(rows, "id", "tok", budget = 10L,
        bucketSize = 10L)
      .select("id", "shard").as[(Long, Long)].collect().toMap
    // naive: cumulative-before = 0,4,8,13,16,25,27 → /10 → 0,0,0,1,1,2,2
    assert(got == Map(0L -> 0L, 1L -> 0L, 7L -> 0L, 12L -> 1L, 25L -> 1L,
      31L -> 2L, 40L -> 2L))
  }

  test("packShards matches the naive assignment on randomized inputs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val ids = Seq.fill(80 + rnd.nextInt(60))(rnd.nextInt(5000).toLong)
        .distinct.sorted
      val rows = ids.map(id => (id, 1L + rnd.nextInt(20).toLong))
      val naive = {
        var cum = 0L
        rows.map { case (id, tok) => val s = cum / 25L; cum += tok; id -> s }
          .toMap
      }
      val got = SampleOps.packShards(rows.toDF("id", "tok"), "id", "tok",
          budget = 25L, bucketSize = 64L)
        .select("id", "shard").as[(Long, Long)].collect().toMap
      assert(got == naive, s"trial $trial diverged from naive")
    }
  }

  test("compressionRatio: repetitive text compresses far below noisy text") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam spam spam"),
      (2L, "qx7 zj2 wf9 bk4 vm1 hc8 ts5 rd3 ln6 gp0 yw2 eu9 oa4 ix1 df7")
    ).toDF("doc_id", "text")
    val r = TextOps.compressionRatio(docs).select("doc_id", "deflate_bp")
      .as[(Long, Long)].collect().toMap
    assert(r(1L) < r(2L), s"repetitive not more compressible: $r")
    assert(r.values.forall(v => v > 0 && v < 20000))
    // deterministic across evaluations
    val again = TextOps.compressionRatio(docs).select("doc_id", "deflate_bp")
      .as[(Long, Long)].collect().toMap
    assert(r == again)
  }

  test("chunkTokens slides fixed windows with overlap, truncating the tail") {
    val doc = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = TextOps.chunkTokens(doc, "doc_id", chunkSize = 4, overlap = 1)
      .select("chunk_idx", "chunk_text").as[(Long, String)].collect().toSeq
    // step 3: starts 0,3,6 → windows of 4 words; chunk 2 already reaches
    // the end, so NO pure-overlap trailing chunk ("w10" alone) is emitted
    assert(chunks == Seq(
      (0L, "w1 w2 w3 w4"), (1L, "w4 w5 w6 w7"), (2L, "w7 w8 w9 w10")))
  }

  test("chunkTokens fresh regions reassemble the original document") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 4) {
      val words = Seq.fill(1 + rnd.nextInt(60))("w" + rnd.nextInt(100))
      val chunkSize = 2 + rnd.nextInt(10)
      val overlap = rnd.nextInt(chunkSize - 1 max 1)
      val doc = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val chunks = TextOps.chunkTokens(doc, "doc_id", chunkSize, overlap)
        .orderBy("chunk_idx").select("chunk_idx", "chunk_text")
        .as[(Long, String)].collect().toSeq
      // dropping each non-first chunk's overlap prefix rebuilds the doc
      val reassembled = chunks.flatMap { case (k, text) =>
        val ws = text.split(" ").toSeq
        if (k == 0) ws else ws.drop(overlap)
      }
      assert(reassembled == words, s"trial $trial lost/duplicated words")
    }
  }

  test("vocabTopK ranks by count with token tiebreak") {
    val docs = Seq((1L, "a b b c c c z"), (2L, "a c")).toDF("doc_id", "text")
    val top = TextOps.vocabTopK(docs, 3).as[(String, Long)].collect().toSeq
    assert(top == Seq(("c", 4L), ("a", 2L), ("b", 2L)))
  }

  test("tokenCounts and qualityScore on a known sentence") {
    val one = Seq((0L, "the cat sat on a mat 42 times!")).toDF("doc_id", "text")
    val t = TextOps.tokenCounts(one).head()
    assert(t.getAs[Long]("ws_tokens") == 8)
    assert(t.getAs[Long]("alpha_tokens") == 7)   // 'the cat sat on a mat times'
    assert(t.getAs[Long]("bpe_tokens") == 9)     // + '42' + '!'
    val q = TextOps.qualityScore(one).head()
    assert(q.getAs[Long]("n_words") == 8)
    assert(q.getAs[Long]("stop_ratio_bp") == 2500) // 'the', 'a' of 8
  }
}
