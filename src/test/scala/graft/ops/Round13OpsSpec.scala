package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-13 operators: the canonical keep/drop decision (x84). */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  test("canonicalKeep keeps the best-quality member per component") {
    // component {1,2,3} via chain 1~2, 2~3; quality: doc 2 highest.
    // doc 9 is a singleton.
    val docs = Seq(
      (1L, 10L), (2L, 30L), (3L, 20L), (9L, 5L)).toDF("doc_id", "qv")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("i", "j")
    val out = DedupOps.canonicalKeep(docs, "doc_id", col("qv"), pairs)
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Long]("component"), r.getAs[Long]("canonical_id"),
        r.getAs[Long]("keep_flag")))).toMap
    assert(byId(1L) == ((1L, 2L, 0L)))
    assert(byId(2L) == ((1L, 2L, 1L))) // highest quality wins the cluster
    assert(byId(3L) == ((1L, 2L, 0L)))
    assert(byId(9L) == ((9L, 9L, 1L))) // singleton keeps itself
    assert(out.length == 4)
  }

  test("canonicalKeep breaks quality ties on the lower doc id") {
    val docs = Seq((5L, 7L), (6L, 7L)).toDF("doc_id", "qv")
    val pairs = Seq((5L, 6L)).toDF("i", "j")
    val out = DedupOps.canonicalKeep(docs, "doc_id", col("qv"), pairs)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("canonical_id")).toSeq == Seq(5L, 5L))
    assert(out.map(_.getAs[Long]("keep_flag")).toSeq == Seq(1L, 0L))
  }

  test("canonicalKeep with no pairs keeps every doc") {
    val docs = Seq((1L, 1L), (2L, 2L)).toDF("doc_id", "qv")
    val pairs = Seq.empty[(Long, Long)].toDF("i", "j")
    val out = DedupOps.canonicalKeep(docs, "doc_id", col("qv"), pairs)
    assert(out.filter(col("keep_flag") === 1L).count() == 2L)
  }
}
