package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit specs for the round-9 trained-IVF path: the exact-arithmetic
  * k-means trainer (`kmeansCentroidsExact`) and its wiring into the x63
  * recall gate. Tiny fixtures; the oracle-gated x63 covers the sf-scale
  * cross-engine contract.
  */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  private def blobs(n: Int, seed: Int): Seq[(Long, Array[Float])] = {
    // three well-separated axis blobs in 8-dim: training has real structure
    // to find, so a trained codebook must beat the lowest-id seeds
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val center = Array.fill(8)(0f)
      center((i % 3) * 2) = 4f
      (i.toLong, center.map(c => c + rnd.nextFloat() * 0.4f - 0.2f))
    }
  }

  test("kmeansCentroidsExact is run-to-run bit-identical and 2^-20 quantized") {
    val pts = blobs(120, seed = 11).toDF("vec_id", "embedding")
    val a = VectorOps.kmeansCentroidsExact(pts, "vec_id", "embedding", 3, 2)
    val b = VectorOps.kmeansCentroidsExact(pts, "vec_id", "embedding", 3, 2)
    // exact integer-scaled sums make the update order-insensitive, so two
    // runs over different task schedules must agree BIT-FOR-BIT — the
    // property the DuckDB oracle's hash-compare rests on
    assert(a.length == 3 && a.length == b.length)
    a.zip(b).foreach { case (ca, cb) => assert(ca.sameElements(cb)) }
    // every updated component is floor(S/n)/2^20 — an exact multiple of
    // 2^-20 that round-trips double→float losslessly
    a.flatten.foreach { x =>
      val scaled = x.toDouble * (1L << 20)
      assert(scaled == math.floor(scaled), s"component $x not 2^-20 quantized")
    }
  }

  test("trained codebook separates blob cells where lowest-id seeds collide") {
    val pts = blobs(120, seed = 23).toDF("vec_id", "embedding")
    val trained = VectorOps.kmeansCentroidsExact(pts, "vec_id", "embedding", 3, 3)
    // each trained centroid should point at a distinct blob axis: argmax
    // component ∈ {0, 2, 4} and all three distinct
    val axes = trained.map(c => c.indices.maxBy(i => c(i))).toSet
    assert(axes == Set(0, 2, 4), s"trained centroids point at axes $axes")
    // and trained-IVF recall@5 at nProbe=1 must dominate the seed codebook
    // (seeds = 3 lowest ids, which all land in blob 0/1/2 pattern i%3 —
    // here ids 0,1,2 DO hit distinct blobs, so compare at equal probes
    // against a deliberately collapsed seed set: ids 0,3,6 are all blob 0)
    val qs = pts.filter(col("vec_id") < 9)
    val exact = VectorOps.bruteForceTopK(qs, pts, "vec_id", "embedding", 5)
      .localCheckpoint()
    def meanRecall(approx: org.apache.spark.sql.DataFrame): Double =
      VectorOps.annRecall(approx, exact, "qid", "nid")
        .agg(avg(col("recall_bp"))).head().getDouble(0)
    val collapsedSeeds = pts.filter(col("vec_id").isin(0L, 3L, 6L))
      .orderBy(col("vec_id")).collect()
      .map(_.getSeq[Float](1).toArray).toSeq
    val seedRecall = meanRecall(VectorOps.ivfTopKWithCentroids(
      qs, pts, "vec_id", "embedding", 5, collapsedSeeds, nProbe = 1))
    val trainedRecall = meanRecall(VectorOps.ivfTopKWithCentroids(
      qs, pts, "vec_id", "embedding", 5, trained.toSeq, nProbe = 1))
    assert(trainedRecall > seedRecall,
      s"trained recall_bp $trainedRecall must beat collapsed seeds $seedRecall")
    // with one centroid per blob and blobs separated, nProbe=1 is exact
    assert(trainedRecall == 10000.0, s"expected full recall, got $trainedRecall")
  }

  test("verifyJaccardPairs equals the exact kernel restricted to candidates") {
    // candidate-verify (the x64 scale path) must agree with the inverted-
    // index kernel on every pair it is ASKED about — same hash60
    // intersection counts, same bp arithmetic — including pairs whose
    // jaccard falls below threshold (absent from both) and candidate
    // pairs with zero shared shingles (absent, not an error)
    val docs = Seq(
      (0L, "a b c d e f g h"),
      (1L, "a b c d e f g x"),   // near-dup of 0
      (2L, "a b c d e f g h"),   // exact dup of 0
      (3L, "p q r s t u v w"),   // unrelated
      (4L, "p q r s t u z z")    // borderline vs 3
    ).toDF("doc_id", "text")
    val sh = TextOps.wordShingles(col("text"), 3)
    val exactPairs = DedupOps.ngramJaccardPairs(docs, "doc_id", sh, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // candidates: a superset with a zero-overlap pair (0,3) thrown in
    val cand = Seq((0L, 1L), (0L, 2L), (3L, 4L), (0L, 3L)).toDF("i", "j")
    val verified = DedupOps.verifyJaccardPairs(cand, docs, "doc_id", sh, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(verified == exactPairs.filter { case ((i, j), _) =>
      Set((0L, 1L), (0L, 2L), (3L, 4L), (0L, 3L))((i, j)) })
    assert(verified.contains((0L, 1L)) && verified.contains((0L, 2L)))
    assert(!verified.contains((0L, 3L)), "zero-overlap candidate must drop")
  }

  test("x64 curation-lsh matches x34 on the fixture and stays a kept-subset") {
    val dir = graft.SparkSpec.testDataDir
    val x34 = graft.sql.ExtensionQueries.queries("x34_corpus_curation")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val x64 = graft.sql.ExtensionQueries.queries("x64_corpus_curation_lsh")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(x64.nonEmpty)
    // LSH can only MISS true near-dup pairs, never invent them, so the
    // LSH-path result keeps a superset of x34's survivors. (Holds while
    // no shingle bucket exceeds maxBucket — true at fixture scale; past
    // the cap the exact kernel's lower-bound undercount can flip it.)
    assert(x34.subsetOf(x64),
      s"x64 dropped docs x34 kept: ${(x34 -- x64).take(5)}")
    // and on the fixture's planted dups (J ≥ 0.9, P(band hit) ≥ 98%) the
    // two paths agree exactly almost surely — flag a large divergence
    assert((x64 -- x34).size <= math.max(2, x34.size / 50),
      s"LSH path diverged by ${(x64 -- x34).size} docs")
  }

  test("empty cells keep their previous centroid instead of collapsing") {
    // two identical points → every vector assigns to centroid 0; centroid 1
    // gets no members and must carry its seed forward unchanged
    val pts = Seq((0L, Array(1f, 0f)), (1L, Array(1f, 0f)), (2L, Array(1f, 0.001f)))
      .toDF("vec_id", "embedding")
    val cent = VectorOps.kmeansCentroidsExact(pts, "vec_id", "embedding", 2, 2)
    assert(cent.length == 2)
    // cosine argmax with ties to the lowest cid sends ALL points to cell 0
    // (seeds 0 and 1 are identical) → cell 1 keeps the seed vector exactly
    assert(cent(1).sameElements(Array(1f, 0f)))
  }
}
