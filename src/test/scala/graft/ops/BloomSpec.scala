package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bloom membership sketch: no false negatives, exact shard-merge
  * equivalence, loud parameter-mismatch failure.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val members = (1 to 200).map(i => s"member-$i")
  private val absents = (1 to 200).map(i => s"absent-$i")

  test("bloom probe has no false negatives") {
    val ref = members.toDF("v")
    val bloom = StatOps.bloomSketch(ref, "v", mBits = 1024, kHashes = 4)
    val probe = members.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val hits = StatOps.bloomProbe(probe, "id", "v", bloom,
      mBits = 1024, kHashes = 4)
    assert(hits.filter(col("bloom_hit") === 0).count() == 0,
      "a true member was reported definitely-absent")
  }

  test("definitely-absent answers are truthful; undersized bloom still sound") {
    // tiny m forces heavy saturation — false POSITIVES are expected and
    // fine; a 0 answer must still only ever appear for true non-members
    val ref = members.toDF("v")
    val bloom = StatOps.bloomSketch(ref, "v", mBits = 256, kHashes = 4)
    val probe = (members ++ absents).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val res = StatOps.bloomProbe(probe, "id", "v", bloom,
        mBits = 256, kHashes = 4)
      .join(probe, "id")
    val zeroIds = res.filter(col("bloom_hit") === 0)
      .select("v").as[String].collect().toSet
    assert(zeroIds.intersect(members.toSet).isEmpty)
  }

  test("merge of per-shard blooms equals the single-pass bloom bit-for-bit") {
    val (shardA, shardB) = members.splitAt(97)
    val merged = StatOps.mergeBloomSketches(
      StatOps.bloomSketch(shardA.toDF("v"), "v", 1024, 4)
        .unionByName(StatOps.bloomSketch(shardB.toDF("v"), "v", 1024, 4)))
    val single = StatOps.bloomSketch(members.toDF("v"), "v", 1024, 4)
    val diff = merged.select("widx", "bits", "m_bits", "k_hashes")
      .exceptAll(single.select("widx", "bits", "m_bits", "k_hashes"))
      .unionByName(single.select("widx", "bits", "m_bits", "k_hashes")
        .exceptAll(merged.select("widx", "bits", "m_bits", "k_hashes")))
    assert(diff.count() == 0, "merged bloom differs from single-pass bloom")
  }

  test("probing with mismatched parameters fails loudly") {
    val bloom = StatOps.bloomSketch(members.toDF("v"), "v", 1024, 4)
    val probe = Seq((1L, "member-1")).toDF("id", "v")
    val ex = intercept[Exception] {
      StatOps.bloomProbe(probe, "id", "v", bloom, mBits = 2048, kHashes = 4)
        .collect()
    }
    assert(ex.getMessage.contains("bloomProbe") ||
      Option(ex.getCause).exists(_.getMessage.contains("bloomProbe")),
      s"expected loud m/k mismatch, got: ${ex.getMessage}")
  }

  test("merging blooms of different parameters fails loudly") {
    val a = StatOps.bloomSketch(members.toDF("v"), "v", 1024, 4)
    val b = StatOps.bloomSketch(members.toDF("v"), "v", 1024, 5)
    val ex = intercept[Exception] {
      StatOps.mergeBloomSketches(a.unionByName(b)).collect()
    }
    assert(ex.getMessage.contains("mergeBloomSketches") ||
      Option(ex.getCause).exists(_.getMessage.contains("mergeBloomSketches")),
      s"expected loud mixed-parameter merge failure, got: ${ex.getMessage}")
  }
}
