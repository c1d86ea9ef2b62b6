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
}
