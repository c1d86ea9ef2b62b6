package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit specs for the round-3 corpus operators: sessionization, stratified
  * sampling, term salience, and bigram collocations — tiny hand-checkable
  * inputs; the oracle-gated x48–x54 queries cover the sf-scale contract.
  */
class Round3OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("sessionize splits on gaps over the threshold, per key") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 10:10:00"), 101L), // 10 min — same session
      (1L, ts("2024-01-01 11:00:00"), 102L), // 50 min — new session
      (2L, ts("2024-01-01 10:00:00"), 103L)  // other key starts at 1
    ).toDF("user_id", "ts", "event_id")
    val got = TimeOps.sessionize(events, "user_id", "ts", "event_id",
        gapMicros = 1800L * 1000000L)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(got == Map(100L -> 1L, 101L -> 1L, 102L -> 2L, 103L -> 1L))
  }

  test("sessionize breaks ts ties by id deterministically") {
    val t0 = ts("2024-01-01 10:00:00")
    val events = Seq((1L, t0, 5L), (1L, t0, 4L)).toDF("user_id", "ts", "event_id")
    val got = TimeOps.sessionize(events, "user_id", "ts", "event_id", 1L)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    // same timestamp → zero gap → same session regardless of id order
    assert(got == Map(4L -> 1L, 5L -> 1L))
  }

  test("stratified sample applies per-stratum rates and the default") {
    val docs = (0L until 200L).map(i => (i, if (i % 2 == 0) "en" else "zh"))
      .toDF("doc_id", "lang")
    val all = SampleOps.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 10000), defaultBp = 0)
    val gotLangs = all.select("lang").distinct().as[String].collect().toSet
    assert(gotLangs == Set("en")) // en kept fully, zh (default 0) dropped
    // a kept row's fate is unchanged when OTHER strata change
    val base = SampleOps.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 4000), defaultBp = 0).select("doc_id").as[Long].collect().toSet
    val more = SampleOps.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 4000), defaultBp = 9000).select("doc_id").as[Long].collect().toSet
    assert(base.subsetOf(more))
    assert(more.diff(base).forall(_ % 2 == 1)) // additions are all zh rows
  }

  test("stratified sample rejects out-of-range rates") {
    val docs = Seq((1L, "en")).toDF("doc_id", "lang")
    intercept[IllegalArgumentException] {
      SampleOps.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 10001), 0)
    }
  }

  test("term salience ranks a doc's distinctive term above ubiquitous ones") {
    val docs = Seq(
      (0L, "shared shared zebra"),
      (1L, "shared common"),
      (2L, "shared common")
    ).toDF("doc_id", "text")
    val top1 = TextOps.termSalience(docs, "doc_id", 1)
      .select("doc_id", "term").as[(Long, String)].collect().toMap
    // "zebra" df=1 beats "shared" df=3 even at tf=2 for doc 0
    assert(top1(0L) == "zebra")
    assert(top1(1L) == "common" && top1(2L) == "common")
  }

  test("term salience score is exact integer arithmetic") {
    val docs = Seq((0L, "a a b"), (1L, "b")).toDF("doc_id", "text")
    val rows = TextOps.termSalience(docs, "doc_id", 2)
      .select("doc_id", "term", "salience_bp")
      .as[(Long, String, Long)].collect().toSet
    // N=2: a: tf=2 df=1 → 2*10000*2/1 = 40000; b(doc0): 1*10000*2/2 = 10000
    assert(rows.contains((0L, "a", 40000L)))
    assert(rows.contains((0L, "b", 10000L)))
    assert(rows.contains((1L, "b", 10000L)))
  }

  test("bigram PMI surfaces the collocation that always co-occurs") {
    // "hong kong" always together (PMI high); "the end" vs "the start"
    // split the "the" mass (lower PMI).
    val docs = (0L until 8L).map { i =>
      val tail = if (i % 2 == 0) "the end" else "the start"
      (i, s"hong kong $tail")
    }.toDF("doc_id", "text")
    val got = TextOps.bigramPmi(docs, "doc_id", k = 2, minDf = 2)
      .select("bigram", "pmi_bp").as[(String, Long)].collect()
    assert(got.head._1 == "hong kong")
    // df(hong kong)=8, df(hong)=8, df(kong)=8, N=8 → 8*10000*8/64 = 10000
    assert(got.head._2 == 10000L)
    // "kong the" (also in every doc) and "the end" (df_xy=4, df(the)=8,
    // df(end)=4 → 4*10000*8/32) tie at 10000; lexicographic tie-break
    // orders "hong kong" < "kong the" < "the end"
    assert(got(1)._1 == "kong the" && got(1)._2 == 10000L)
  }

  test("bigram PMI minDf suppresses one-off bigrams") {
    val docs = Seq((0L, "rare pair common word"), (1L, "common word"))
      .toDF("doc_id", "text")
    val got = TextOps.bigramPmi(docs, "doc_id", k = 10, minDf = 2)
      .select("bigram").as[String].collect().toSet
    assert(got == Set("common word"))
  }
}
