package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Degenerate-input behavior: empty tables, empty strings, single rows —
  * the shapes a 100 TB pipeline inevitably hits in some partition.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private val one = Seq((1L, "solo")).toDF("doc_id", "text")

  test("dedup ops return empty (not error) on empty input") {
    assert(DedupOps.exact(empty, "doc_id", "text").count() == 0)
    assert(DedupOps.ngramJaccardPairs(empty, "doc_id",
      TextOps.wordShingles(col("text"), 3), 0.5).count() == 0)
    assert(DedupOps.minhashLshCandidates(empty, "doc_id",
      TextOps.wordShingles(col("text"), 3)).count() == 0)
    assert(DedupOps.simhashPairs(empty, "doc_id", "text", 3).count() == 0)
  }

  test("single doc yields no pairs, still fingerprints and scores") {
    assert(DedupOps.ngramJaccardPairs(one, "doc_id",
      TextOps.wordShingles(col("text"), 3), 0.5).count() == 0)
    assert(DedupOps.simhashPairs(one, "doc_id", "text", 60).count() == 0)
    // "solo" is 4 chars → zero 8-gram shingles → empty (non-null) fp
    assert(TextOps.fingerprint(one).select("fp").head().getString(0).isEmpty)
    val q = TextOps.qualityScore(one).head()
    assert(q.getAs[Long]("n_words") == 1)
  }

  test("round-12 ops return empty (not error) on empty input") {
    assert(DedupOps.removeSpans(empty, "doc_id", "text").count() == 0)
    assert(DedupOps.containmentPairs(empty, "doc_id",
      TextOps.wordShingles(col("text"), 3), 0.5).count() == 0)
    assert(DedupOps.seenBeforeNovelty(empty, "doc_id",
      TextOps.wordShingles(col("text"), 3)).count() == 0)
    val emptySrc = Seq.empty[(Long, String)].toDF("doc_id", "source")
    assert(DedupOps.minhashGroupSimilarity(
      Seq.empty[(Long, String, String)].toDF("doc_id", "source", "text"),
      "source", TextOps.wordShingles(col("text"), 3), 8).count() == 0)
    assert(SampleOps.mixtureSample(emptySrc, "doc_id", "source",
      Seq("a" -> 1.0)).count() == 0)
    val emptyEv = Seq.empty[(Long, java.sql.Timestamp, Long, Double)]
      .toDF("user_id", "ts", "event_id", "value")
    assert(TimeOps.ohlcResample(emptyEv, "user_id", "ts", "event_id",
      "value", 1000L).count() == 0)
    assert(TimeOps.rollingTimeWindow(emptyEv, "user_id", "ts", "event_id",
      "value", 1000L).count() == 0)
  }

  test("round-12 ops tolerate null text and null ts without fabricating") {
    val nulls = Seq((1L, "alpha beta gamma delta epsilon"),
      (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    // null-text doc contributes no shingles: absent from novelty, no
    // pairs, and removeSpans must not throw on it
    assert(DedupOps.seenBeforeNovelty(nulls, "doc_id",
      TextOps.wordShingles(col("text"), 3))
      .select("doc_id").as[Long].collect().toSet == Set(1L))
    assert(DedupOps.containmentPairs(nulls, "doc_id",
      TextOps.wordShingles(col("text"), 3), 0.5).count() == 0)
    assert(DedupOps.removeSpans(nulls, "doc_id", "text").count() == 2)
    // null-ts rows have no place on the grid: dropped, never a candle of
    // their own or a member of another's frame
    val ev = Seq((1L, Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:01")),
        1L, 5.0),
      (1L, None, 2L, 9.0))
      .toDF("user_id", "ts", "event_id", "value")
    val candles = TimeOps.ohlcResample(ev, "user_id", "ts", "event_id",
      "value", 60L * 1000000).collect()
    assert(candles.length == 1 && candles.head.getLong(6) == 1L)
    assert(TimeOps.rollingTimeWindow(ev, "user_id", "ts", "event_id",
      "value", 60L * 1000000).count() == 1)
  }

  test("shingles of short/empty strings are empty arrays, not errors") {
    val df = Seq("", "ab", "abcdefgh").toDF("s")
      .select(size(TextOps.charShingles(col("s"), 8)).as("n8"),
        size(TextOps.wordShingles(col("s"), 3)).as("w3"))
    assert(df.as[(Int, Int)].collect().toSeq ==
      Seq((0, 0), (0, 0), (1, 0)))
  }

  test("ANN with empty corpus/queries returns empty") {
    val vecs = Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(VectorOps.bruteForceTopK(noVecs, vecs, "vec_id", "embedding", 5).count() == 0)
    assert(VectorOps.bruteForceTopK(vecs, noVecs, "vec_id", "embedding", 5).count() == 0)
  }

  test("sampling/chunking/decontamination ops handle empty input") {
    assert(SampleOps.hashSample(empty, "doc_id", 5000).count() == 0)
    assert(SampleOps.packShards(
      empty.withColumnRenamed("text", "tok")
        .withColumn("tok", lit(1L)), "doc_id", "tok", 10L).count() == 0)
    assert(TextOps.chunkTokens(empty, "doc_id", 8, 2).count() == 0)
    val sh = TextOps.wordShingles(col("text"), 3)
    assert(DedupOps.contaminationHits(one, "doc_id", sh, empty, sh).count() == 0)
    assert(TextOps.vocabTopK(empty, 5).count() == 0)
  }

  test("round-8 ops handle empty and single-row input") {
    assert(TextOps.rareTokenRatio(empty, "doc_id", 2L).count() == 0)
    // one doc: every token has df=1 < 2 → all rare
    val r = TextOps.rareTokenRatio(one, "doc_id", 2L).head()
    assert(r.getAs[Long]("n_rare") == 1L && r.getAs[Long]("rare_bp") == 10000L)
    val dom = empty.withColumnRenamed("text", "source")
    assert(SampleOps.temperatureSample(dom, "doc_id", "source").count() == 0)
    // single domain: rate = sqrt(n/n) = 10000 bp → everything kept
    val oneDom = Seq((1L, "s"), (2L, "s"), (3L, "s")).toDF("doc_id", "source")
    assert(SampleOps.temperatureSample(oneDom, "doc_id", "source").count() == 3)
    assert(StatOps.lengthBuckets(
      empty.withColumn("n", lit(1L)), "text", "n").count() == 0)
    assert(DedupOps.incrementalDedup(empty, one, "doc_id", "text",
      TextOps.wordShingles(col("text"), 3), 0.5).count() == 0)
    // empty reference: every new doc survives
    assert(DedupOps.incrementalDedup(one, empty, "doc_id", "text",
      TextOps.wordShingles(col("text"), 3), 0.5).count() == 1)
  }

  test("chunkTokens emits one chunk for a short doc (never zero rows)") {
    val got = TextOps.chunkTokens(one, "doc_id", chunkSize = 8, overlap = 2)
      .select("chunk_idx", "chunk_text").head()
    assert(got.getLong(0) == 0L && got.getString(1) == "solo")
  }

  test("asOfJoin with empty right keeps all left rows with null payload") {
    val left = Seq((1L, "k", 10L)).toDF("id", "k", "t")
    val right = Seq.empty[(String, Long, Int)].toDF("k", "t", "p")
    val got = JoinOps.asOfJoinBackward(left, right, "k", "t", Seq("p"))
    assert(got.count() == 1 && got.head().isNullAt(got.head().fieldIndex("p")))
  }

  test("asOfJoin null-key/null-ts left rows bypass the window with a " +
      "null payload (r15: they no longer ride one hot null partition)") {
    val left = Seq((1L, Option("k"), Option(10L)),
      (2L, None: Option[String], Option(10L)),
      (3L, Option("k"), None: Option[Long]))
      .toDF("id", "k", "t")
    val right = Seq(("k", 5L, 42)).toDF("k", "t", "p")
    val got = JoinOps.asOfJoinBackward(left, right, "k", "t", Seq("p"))
      .orderBy("id").collect()
    assert(got.length == 3)
    assert(got(0).getAs[Int]("p") == 42)        // live row matches
    assert(got(1).isNullAt(got(1).fieldIndex("p")))  // null key
    assert(got(2).isNullAt(got(2).fieldIndex("p")))  // null ts
  }

  test("packing gates fail loudly on null ids and negative/null token " +
      "counts instead of corrupting offsets (r15)") {
    def msgs(e: Throwable) = Iterator.iterate(e)(_.getCause)
      .takeWhile(_ != null).take(10).map(t => String.valueOf(t.getMessage))
    val nullId = Seq((Option.empty[Long], 5L), (Option(1L), 5L))
      .toDF("doc_id", "n_toks_doc")
    val e1 = intercept[Exception] {
      SampleOps.packShards(nullId, "doc_id", "n_toks_doc", 100L).collect()
    }
    assert(msgs(e1).exists(_.contains("total id order")), e1.toString)
    val negTok = Seq((1L, -5L), (2L, 5L)).toDF("doc_id", "n_toks_doc")
    val e2 = intercept[Exception] {
      SampleOps.packSequences(negTok, "doc_id", "n_toks_doc", 128L).collect()
    }
    assert(msgs(e2).exists(_.contains("non-negative count")), e2.toString)
    // and the parameter gates: out-of-range bp rates / k are typos
    intercept[IllegalArgumentException] {
      SampleOps.hashSample(negTok, "doc_id", 20000)
    }
    intercept[IllegalArgumentException] {
      SampleOps.topKPerKey(negTok, "doc_id", "doc_id", 0)
    }
  }
}
