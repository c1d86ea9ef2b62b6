package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit specs for the round-10 surface: the `nearDupPairs` default flip
  * (LSH-verify is the path a caller gets without asking; the exact
  * enumeration is an opt-in) and the `NearestCentroid` codegen'd cell
  * assignment that replaced the n×k crossJoin in SemDeDup. Tiny fixtures;
  * the oracle-gated x34/x64/x42/x65 cover the sf-scale cross-engine
  * contract.
  */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus: org.apache.spark.sql.DataFrame = {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    Seq(
      (0L, base),
      (1L, base + " today"),                         // near-dup of 0
      (2L, "completely different words in this one"),
      (3L, base.replace("quick", "slow")),           // near-dup of 0
      (4L, "another unrelated document about spark joins and shuffles"),
      (5L, base)                                     // exact dup of 0
    ).toDF("doc_id", "text")
  }

  test("nearDupPairs default (LSH-verify) and exact arm agree on planted near-dups") {
    val sh = TextOps.wordShingles(col("text"), 3)
    val exact = DedupOps.nearDupPairs(corpus, "doc_id", sh, 0.5, exact = true)
      .select("i", "j", "jaccard_bp").collect().toSet
    val lsh = DedupOps.nearDupPairs(corpus, "doc_id", sh, 0.5)
      .select("i", "j", "jaccard_bp").collect().toSet
    // at J well above the banding threshold the LSH path must find every
    // exact pair with the SAME verified jaccard; the fixture's pairs are
    // all J >= 0.85 where P(banding miss) ~ 0
    assert(exact.nonEmpty, "fixture must plant near-dup pairs")
    assert(lsh == exact,
      s"default path ${lsh.size} pairs, exact arm ${exact.size}: must agree")
  }

  test("nearDupPairs default never reports a pair below threshold (verify is exact)") {
    val sh = TextOps.wordShingles(col("text"), 3)
    val rows = DedupOps.nearDupPairs(corpus, "doc_id", sh, 0.5).collect()
    rows.foreach { r =>
      assert(r.getLong(2) >= 5000L,
        s"pair (${r.getLong(0)},${r.getLong(1)}) verified at ${r.getLong(2)}bp < threshold")
    }
  }

  test("NearestCentroid matches the broadcast-join argmax on every vector") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 200L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    // reference assignment: the crossJoin + row_number form the DuckDB
    // oracle mirrors (ties -> lowest cid)
    val cent = vecs.orderBy(col("vec_id")).limit(24)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      .withColumn("cn", VectorOps.norm(col("cv")))
      .filter(col("cn") > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))
    val joined = vecs
      .withColumn("nrm", VectorOps.norm(col("embedding")))
      .filter(col("nrm") > 0)
      .crossJoin(broadcast(cent))
      .withColumn("ccos",
        VectorOps.dot(col("embedding"), col("cv")) / (col("nrm") * col("cn")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("cid").as("cell"))
    // expression assignment over the same codebook
    val seeds = cent.orderBy("cid").collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    val assign = bridge.column(graft.functions.NearestCentroid(
      bridge.expression(col("embedding")),
      bridge.expression(VectorOps.norm(col("embedding"))),
      seeds.map(_._1), seeds.flatMap(_._2), seeds.map(_._3), 16))
    val expr = vecs.select(col("vec_id"), assign.as("cell"))
    val diff = expr.as("a").join(joined.as("b"), Seq("vec_id"))
      .filter(col("a.cell") =!= col("b.cell")).count()
    assert(diff == 0L, s"$diff vectors assigned to a different cell")
  }

  test("NearestCentroid fails loudly on a malformed codebook") {
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    val v = bridge.expression(col("embedding"))
    val n = bridge.expression(lit(1.0))
    intercept[IllegalArgumentException] { // unsorted cids break the tie rule
      graft.functions.NearestCentroid(v, n,
        Array(2L, 1L), Array.fill(4)(1f), Array(1.0, 1.0), 2)
    }
    intercept[IllegalArgumentException] { // zero-norm centroid
      graft.functions.NearestCentroid(v, n,
        Array(1L, 2L), Array.fill(4)(1f), Array(1.0, 0.0), 2)
    }
    intercept[IllegalArgumentException] { // flat length != k * dim
      graft.functions.NearestCentroid(v, n,
        Array(1L, 2L), Array.fill(3)(1f), Array(1.0, 1.0), 2)
    }
  }
}
