package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.steps.Steps

/** Structured Streaming capability specs: watermarked windows, streaming
  * dedup, keyed state, and the foreachBatch single-source pipeline path.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("tumbling window counts with watermark (streaming analog of Q14)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val agg = Streaming.tumblingCounts(
      input.toDF().toDF("ts", "event_type"), "ts", "10 minutes", "5 minutes",
      "event_type")
    val q = agg.writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((ts(1), "click"), (ts(2), "click"), (ts(11), "view"))
      q.processAllAvailable()
      // advance watermark past the first window to emit it
      input.addData((ts(30), "click"))
      q.processAllAvailable()
      val rows = spark.table("tumbling")
        .select("ws", "event_type", "cnt")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(rows.contains((ts(0), "click", 2L)))
      assert(rows.contains((ts(10), "view", 1L)))
    } finally q.stop()
  }

  test("streaming OHLC candle converges across micro-batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double, String)]
    val agg = Streaming.ohlcCandles(
      input.toDF().toDF("ts", "event_id", "value", "sym"),
      "ts", "event_id", "value", "10 minutes", "5 minutes", "sym")
    val q = agg.writeStream.format("memory").queryName("candles")
      .outputMode(OutputMode.Append).start()
    try {
      // the same 10-minute window arrives over TWO micro-batches — the
      // partial candles must merge to the batch answer (open = earliest
      // (ts, id), close = latest, high/low/count over the union)
      input.addData((ts(2), 1L, 5.0, "A"), (ts(4), 2L, 9.0, "A"))
      q.processAllAvailable()
      input.addData((ts(1), 3L, 3.0, "A"), (ts(6), 4L, 7.0, "A"))
      q.processAllAvailable()
      input.addData((ts(30), 9L, 1.0, "A")) // advance watermark, emit
      q.processAllAvailable()
      val rows = spark.table("candles")
        .select("ws", "sym", "open", "close", "high", "low", "n_events")
        .as[(Timestamp, String, Double, Double, Double, Double, Long)]
        .collect().toSet
      assert(rows.contains((ts(0), "A", 3.0, 7.0, 9.0, 3.0, 4L)))
    } finally q.stop()
  }

  test("session windows close after the gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val agg = Streaming.sessionCounts(
      input.toDF().toDF("ts", "user"), "ts", "5 minutes", "1 minute", "user")
    val q = agg.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((ts(1), "u1"), (ts(3), "u1"), (ts(20), "u1"))
      q.processAllAvailable()
      input.addData((ts(45), "u1")) // push watermark far ahead
      q.processAllAvailable()
      val rows = spark.table("sessions").select("ws", "cnt")
        .as[(Timestamp, Long)].collect().toSet
      assert(rows.contains((ts(1), 2L))) // one session for minutes 1-3
      assert(rows.contains((ts(20), 1L)))
    } finally q.stop()
  }

  test("streaming dedup drops repeat keys within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val dedup = Streaming.streamingDedup(
      input.toDF().toDF("ts", "event_id"), "ts", "10 minutes", "event_id")
    val q = dedup.writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((ts(1), 100L), (ts(2), 100L), (ts(3), 101L))
      q.processAllAvailable()
      input.addData((ts(4), 100L))
      q.processAllAvailable()
      val ids = spark.table("dedup").select("event_id").as[Long].collect().toSeq
      assert(ids.sorted == Seq(100L, 101L))
    } finally q.stop()
  }

  test("streaming frontier: canonical dedup within the watermark, " +
      "non-absolute refs dropped, crawled set anti-joined, domain out") {
    implicit val sqlCtx = spark.sqlContext
    val crawled = Seq("https://e.com/seen").toDF("canon_url")
    val input = MemoryStream[(Timestamp, String)]
    val frontier = Streaming.streamingFrontier(
      input.toDF().toDF("ts", "url"), "ts", "10 minutes", "url", crawled)
    val q = frontier.writeStream.format("memory").queryName("frontier")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (ts(1), "https://E.com/a?utm_source=x"), // canonical variant 1
        (ts(2), "https://e.com/a"),              // same canonical → one
        (ts(3), "relative/ref"),                 // non-absolute → dropped
        (ts(4), "https://e.com/seen?utm_medium=y")) // crawled → dropped
      q.processAllAvailable()
      val rows = spark.table("frontier")
        .select("canon_url", "reg_domain").as[(String, String)]
        .collect().toSeq
      assert(rows == Seq(("https://e.com/a", "e.com")))
    } finally q.stop()
  }

  test("stream-static dedup drops docs already in the reference corpus") {
    implicit val sqlCtx = spark.sqlContext
    val ref = Seq((1L, "known doc one"), (2L, "known doc two"))
      .toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val kept = Streaming.streamingDedupVsReference(
      input.toDF().toDF("doc_id", "text"), ref, "text")
    val q = kept.writeStream.format("memory").queryName("incdedup")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((10L, "known doc one"), (11L, "fresh doc"))
      q.processAllAvailable()
      input.addData((12L, "known doc two"), (13L, "another fresh"))
      q.processAllAvailable()
      val ids = spark.table("incdedup").select("doc_id").as[Long].collect().toSeq
      assert(ids.sorted == Seq(11L, 13L))
      // schema passes through untouched (no helper columns leak)
      assert(spark.table("incdedup").columns.toSeq == Seq("doc_id", "text"))
    } finally q.stop()
  }

  test("gopherFilter composes onto a stream (narrow quality filtering " +
      "at ingest)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val good = ((1 to 58).map(i => f"word$i%02d") ++ Seq("the", "of"))
      .mkString(" ")
    val flagged = graft.ops.TextOps.gopherFilter(
      input.toDF().toDF("doc_id", "text"))
      .select("doc_id", "keep")
    val q = flagged.writeStream.format("memory").queryName("gopherstream")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((1L, good), (2L, "too short"))
      q.processAllAvailable()
      val rows = spark.table("gopherstream")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(rows(1L) && !rows(2L))
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running per-key counts across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val counts = Streaming.runningCounts(input.toDS())
    val q = counts.writeStream.format("memory").queryName("running")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(("a", 10L), ("a", 20L), ("b", 5L))
      q.processAllAvailable()
      input.addData(("a", 30L))
      q.processAllAvailable()
      val last = spark.table("running")
        .groupBy("key").agg(max("count").as("count"))
        .as[(String, Long)].collect().toMap
      assert(last("a") == 3L && last("b") == 1L)
    } finally q.stop()
  }

  test("stream-stream join matches keys within the time window") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, String)]
    val buys = MemoryStream[(Timestamp, String)]
    val joined = Streaming.streamStreamJoin(
      buys.toDF().toDF("bts", "user"), clicks.toDF().toDF("cts", "user"),
      "user", "bts", "cts", lateness = "1 minute",
      window = java.time.Duration.ofMinutes(10))
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData((ts(1), "u1"), (ts(40), "u1"), (ts(2), "u2"))
      buys.addData((ts(5), "u1"))
      q.processAllAvailable()
      val rows = spark.table("ssjoin").select("bts", "cts")
        .as[(Timestamp, Timestamp)].collect().toSet
      assert(rows == Set((ts(5), ts(1)))) // ts(40) outside +-10min, u2 no buy
    } finally q.stop()
  }

  test("streaming near-dup candidates: cross-batch collisions fire the " +
      "moment the duplicate lands; disjoint and sub-k docs never pair; " +
      "batch OPH agrees") {
    implicit val sqlCtx = spark.sqlContext
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val input = MemoryStream[(Long, String)]
    val cands = Streaming.streamingNearDupCandidates(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = cands.writeStream.format("memory").queryName("nearcand")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((1L, base), (4L, "totally different words living in this one here"),
        (5L, "tiny"))
      q.processAllAvailable()
      assert(spark.table("nearcand").count() == 0, "nothing to collide yet")
      // the duplicate arrives TWO batches later — state remembers doc 1
      input.addData((9L, "unrelated filler content for the middle batch okay"))
      q.processAllAvailable()
      input.addData((2L, base))
      q.processAllAvailable()
      val pairs = spark.table("nearcand")
        .select("i", "j").distinct()
        .as[(Long, Long)].collect().toSet
      assert(pairs == Set((1L, 2L)))
      // all four bands collide for an exact dup — same contract as batch
      val bands = spark.table("nearcand").select("band")
        .as[Int].collect().toSet
      assert(bands == Set(0, 1, 2, 3))
      // and the batch OPH path proposes the same candidate on the SAME
      // corpus the stream saw — including the sub-k doc 5 and the filler
      // doc 9 (a reduced corpus would mask a batch-side regression in
      // empty-signature handling, the exact guard the engine documents)
      val batch = graft.ops.DedupOps.minhashLshCandidatesOph(
          Seq((1L, base), (2L, base),
            (4L, "totally different words living in this one here"),
            (5L, "tiny"),
            (9L, "unrelated filler content for the middle batch okay"))
            .toDF("doc_id", "text"),
          "doc_id", graft.ops.TextOps.wordShingles(col("text"), 3))
        .select("i", "j").as[(Long, Long)].collect().toSet
      assert(batch == pairs)
    } finally q.stop()
    // loud plan-time gates (r15 review): a non-long id must fail by name
    // (the batch requireLongId contract), and maxBucket = 0 must not
    // silently disable candidate detection
    val strIds = Seq(("doc-1", base)).toDF("doc_id", "text")
    val e1 = intercept[IllegalArgumentException] {
      Streaming.streamingNearDupCandidates(strIds, "doc_id", "text")
    }
    assert(e1.getMessage.contains("LongType"))
    val e2 = intercept[IllegalArgumentException] {
      Streaming.streamingNearDupCandidates(
        Seq((1L, base)).toDF("doc_id", "text"), "doc_id", "text",
        maxBucket = 0)
    }
    assert(e2.getMessage.contains("maxBucket"))
  }

  test("foreachBatch runs the batch step pipeline per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val input = MemoryStream[(Long, Array[Byte])]
    val sink = graft.sinks.ParquetSink(s"$dir/out")
    val q = Streaming.pipelineWriter(
        input.toDF().toDF("block_number", "payload"), "blocks",
        Seq(Steps.SetChainId(7L), Steps.HexEncode()), sink, s"$dir/ckpt")
      .start()
    try {
      input.addData((1L, Array[Byte](0x0a)))
      q.processAllAvailable()
      input.addData((2L, Array[Byte](0x0b)))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$dir/out/blocks")
      assert(out.count() == 2)
      assert(out.select("payload").as[String].collect().toSet == Set("0x0a", "0x0b"))
      assert(out.select("chain_id").as[Long].collect().toSet == Set(7L))
    } finally q.stop()
  }
}
