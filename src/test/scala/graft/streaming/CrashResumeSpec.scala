package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException

import graft.SparkSpec
import graft.api.Pipeline
import graft.sinks.{ParquetSink, Resume}
import graft.sources.ChainSource
import graft.steps.Steps

/** The reference's crash-resistance pattern proven END-TO-END on the
  * streaming path (cherry `examples/erc20_custom.py:41-50`: resume
  * `from_block` = `SELECT MAX(block_number)` of the sink):
  * chain micro-batch stream → step fold (decode + stamp + hex) →
  * ParquetSink with anchor-last ordering → crash MID-WRITE (after the
  * data table landed, during the anchor write) → restart from
  * `Resume.maxWatermark` with a fresh checkpoint.
  *
  * The contract this proves, table by table:
  *   - the ANCHOR table is exactly-once: a present anchor row proves the
  *     whole batch landed, so replaying from its watermark can neither
  *     skip nor duplicate anchor rows;
  *   - data tables are at-least-once: the crashed batch's data landed
  *     before the anchor, so the replay overlaps it — nothing is ever
  *     MISSING, and the overlap dedups exactly on the row key (the same
  *     property the reference gets from ClickHouse ReplacingMergeTree;
  *     parquet consumers dedup on the key).
  */
class CrashResumeSpec extends SparkSpec {

  private val sig = "Evt(uint256 v)"

  private def pipelineSteps(poisonAnchorFrom: Option[Long]): Seq[graft.api.Step] = {
    val base = Seq(
      // decode the synthetic 32-byte payload as one uint256 field; keep
      // the raw columns (hstack) so the data table carries the row key
      Steps.EvmDecodeEvents(sig, inputTable = "logs",
        outputTable = "transfers", hstack = true),
      Steps.SetChainId(1L),
      Steps.HexEncode(tables = Some(Seq("transfers"))))
    // injected crash: the ANCHOR table's write throws when it reaches the
    // poisoned range — AFTER the data table (non-anchor, written first by
    // AnchorLast) has already landed. This is the mid-write crash window.
    val poison = poisonAnchorFrom.map { from =>
      Steps.Fn((_, t) => t + ("logs" -> t("logs").filter(
        when(col("block_number") >= lit(from),
          raise_error(lit("injected crash"))).isNull)))
    }
    base ++ poison
  }

  private def startStream(fromBlock: Long, out: String, checkpoint: String,
                          poisonAnchorFrom: Option[Long]) =
    Streaming.pipelineWriter(
      spark.readStream.format(classOf[ChainSource].getName)
        .option("fromBlock", fromBlock.toString).option("toBlock", "400")
        .option("blocksPerBatch", "100").option("logsPerBlock", "3")
        .option("numPartitions", "2")
        .load(),
      tableName = "logs",
      steps = pipelineSteps(poisonAnchorFrom),
      sink = ParquetSink(out, anchorTable = Some("logs")),
      checkpointDir = checkpoint)
      .start()

  test("crash mid-write resumes from the anchor watermark: nothing missing, key-dedup exact") {
    val dir = Files.createTempDirectory("graft-crash-resume").toString
    val out = s"$dir/out"

    // ---- phase 1: crash while writing the anchor for batch [200,300) ----
    val q1 = startStream(0L, out, s"$dir/cp1", poisonAnchorFrom = Some(200L))
    val e = intercept[StreamingQueryException] { q1.processAllAvailable() }
    q1.stop()
    val causeChain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(10).map(t => String.valueOf(t.getMessage)).toSeq
    assert(causeChain.exists(_.contains("injected crash")),
      s"stream died for the wrong reason: $causeChain")

    // anchor-last held: the data table is one full batch AHEAD of the anchor
    assert(spark.read.parquet(s"$out/transfers").count() == 900) // blocks 0..299
    assert(spark.read.parquet(s"$out/logs").count() == 600)      // blocks 0..199
    val wm = Resume.maxWatermark(spark.read.parquet(s"$out/logs"), "block_number")
    assert(wm.contains(199L))

    // ---- phase 2: restart from the sink watermark, FRESH checkpoint ----
    // (the reference's resume is sink-driven, not checkpoint-driven: the
    // watermark comes from the warehouse, so a lost checkpoint is harmless)
    val q2 = startStream(wm.get + 1, out, s"$dir/cp2", poisonAnchorFrom = None)
    q2.processAllAvailable()
    q2.stop()

    // anchor table: exactly-once — 400 blocks × 3 logs, no dup, no gap
    val anchor = spark.read.parquet(s"$out/logs")
    assert(anchor.count() == 1200)
    assert(anchor.select("block_number", "log_index").distinct().count() == 1200)
    assert(anchor.agg(min("block_number"), max("block_number")).head() ==
      org.apache.spark.sql.Row(0L, 399L))

    // data table: at-least-once — the crashed batch [200,300) replayed, so
    // its 300 rows appear twice and NOTHING is missing
    val transfers = spark.read.parquet(s"$out/transfers")
    assert(transfers.count() == 1500)
    val dupKeys = transfers.groupBy("block_number", "log_index")
      .count().filter(col("count") =!= 1)
    assert(dupKeys.count() == 300)
    assert(dupKeys.agg(min("block_number"), max("block_number")).head() ==
      org.apache.spark.sql.Row(200L, 299L))

    // key-dedup (the consumer half of at-least-once) reproduces the batch
    // run of the SAME step fold bit-exactly, full row compare
    val batchTables = Pipeline.processSteps(spark,
      Map("logs" -> spark.read.format(classOf[ChainSource].getName)
        .option("fromBlock", "0").option("toBlock", "400")
        .option("logsPerBlock", "3").load()),
      pipelineSteps(None))
    val expected = batchTables("transfers")
    val deduped = transfers.dropDuplicates("block_number", "log_index")
    assert(deduped.count() == 1200)
    assert(expected.columns.sorted.sameElements(deduped.columns.sorted))
    val key = (df: DataFrame) =>
      df.select(df.columns.sorted.map(col): _*).collect().map(_.toSeq).toSet
    assert(key(deduped) == key(expected))
  }

  /** ONE choreography for the near-dup state-store crash contract, run
    * against both store providers (a second hand copy of the scenario
    * drifted within one round — reference comparison and fixture strings
    * diverged — so the provider is now a parameter):
    *
    *  1. reference: all three batches through an uninterrupted query;
    *  2. crash run: commit batch 1, STOP the query, then add batch 2 —
    *     added after the stop so it is DETERMINISTICALLY pending at the
    *     restart (adding it before the stop raced the continuous trigger,
    *     which could commit it and silently degrade the scenario to a
    *     clean shutdown);
    *  3. restart from the same checkpoint, land the duplicate, assert the
    *     pair set equals the reference band for band — the (1,2) pair can
    *     only fire if doc 1's bucket state crossed the restart.
    */
  private def nearDupCrashScenario(tag: String): Unit = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b1 = Seq((1L, base),
      (4L, "totally different words living inside this document here"))
    val b2 = Seq((9L, "unrelated filler content for the middle batch okay"))
    val b3 = Seq((2L, base)) // the duplicate — arrives after the crash

    def pairsOf(path: String): Set[(Long, Long, Int)] =
      spark.read.parquet(path).select("i", "j", "band")
        .as[(Long, Long, Int)].collect().toSet
    def start(input: MemoryStream[(Long, String)], dir: String) =
      Streaming.streamingNearDupCandidates(
          input.toDF().toDF("doc_id", "text"), "doc_id", "text")
        .writeStream.format("parquet").outputMode(OutputMode.Append)
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/cp").start()

    // ---- reference: the same batches through an uninterrupted query ----
    val refDir = Files.createTempDirectory(s"graft-neardup-ref-$tag").toString
    val ref = MemoryStream[(Long, String)]
    val qr = start(ref, refDir)
    try {
      ref.addData(b1); qr.processAllAvailable()
      ref.addData(b2); qr.processAllAvailable()
      ref.addData(b3); qr.processAllAvailable()
    } finally qr.stop()
    val expected = pairsOf(s"$refDir/out")
    assert(expected.map(p => (p._1, p._2)) == Set((1L, 2L)),
      "fixture must produce exactly the cross-crash pair")
    assert(expected.map(_._3) == Set(0, 1, 2, 3),
      "exact dup collides on all bands")

    // ---- crash run ----
    val dir = Files.createTempDirectory(s"graft-neardup-crash-$tag").toString
    val input = MemoryStream[(Long, String)]
    val q1 = start(input, dir)
    try {
      input.addData(b1)
      q1.processAllAvailable() // b1 committed: state remembers doc 1
    } finally q1.stop()
    input.addData(b2)          // added AFTER the stop: pending, must replay
    val q2 = start(input, dir) // SAME checkpoint: state-store recovery
    try {
      input.addData(b3)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(pairsOf(s"$dir/out") == expected)
  }

  test("streaming near-dup state survives a kill: restart from the " +
      "checkpoint reproduces the uninterrupted pair set") {
    nearDupCrashScenario("hdfs")
  }

  test("streaming curation capstone: gopher gate -> dedup-vs-reference -> " +
      "near-dup candidates + exact dedup -> pipelineWriter, killed and " +
      "restarted mid-stream, output == uninterrupted run") {
    // The streaming sibling of the x94 manifest pipeline, ONE flow from
    // the declared pieces: quality gate (gopherFilter, stateless narrow),
    // dedup against a static reference corpus (stream-static anti-join),
    // near-dup candidate pairs at ingest (flatMapGroupsWithState bucket
    // state), exact within-stream dedup (dropDuplicatesWithinWatermark
    // state), and the step-fold sink (pipelineWriter -> ParquetSink).
    // Both stateful stages must carry their state across a kill+restart:
    // the post-restart exact duplicate can only be dropped, and can only
    // pair, if batch-1 state survived the checkpoint round trip.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val textA = "the quick brown fox jumps over and beyond all lazy dogs " +
      "with great speed today"
    val textR = "the reference corpus already contains this exact document " +
      "and its words here"
    val textB = "and many other things happen to the world when streams " +
      "keep flowing onward"
    val b1 = Seq((1L, textA), (3L, textR), (4L, "bad bad bad bad bad"))
    val b2 = Seq((9L, textB))      // pending at the restart
    val b3 = Seq((12L, textA))     // the post-restart exact duplicate
    val reference = Seq((100L, textR)).toDF("ref_id", "text")

    def curatedStream(input: MemoryStream[(Long, String)]): DataFrame = {
      val docs = input.toDF().toDF("doc_id", "text")
        .withColumn("ts", to_timestamp(lit("2026-01-01 00:00:00")))
      val quality = graft.ops.TextOps
        .gopherFilter(docs, minWords = 10L)
        .filter(col("keep")).select("doc_id", "text", "ts")
      Streaming.streamingDedupVsReference(quality, reference, "text")
    }
    def startDocs(input: MemoryStream[(Long, String)], dir: String) =
      Streaming.pipelineWriter(
          Streaming.streamingDedup(
            curatedStream(input).withColumn("__ch", md5(col("text"))),
            "ts", "1 hour", "__ch").drop("__ch"),
          tableName = "docs",
          steps = Seq(Steps.SetChainId(1L)),
          sink = ParquetSink(s"$dir/warehouse"),
          checkpointDir = s"$dir/cp_docs")
        .start()
    def startPairs(input: MemoryStream[(Long, String)], dir: String) =
      Streaming.streamingNearDupCandidates(
          curatedStream(input), "doc_id", "text")
        .writeStream.format("parquet")
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
        .option("path", s"$dir/pairs")
        .option("checkpointLocation", s"$dir/cp_pairs").start()

    def docsOf(dir: String): Set[(Long, String, Long)] =
      spark.read.parquet(s"$dir/warehouse/docs")
        .select("doc_id", "text", "chain_id")
        .as[(Long, String, Long)].collect().toSet
    def pairsOf(dir: String): Set[(Long, Long, Int)] =
      spark.read.parquet(s"$dir/pairs").select("i", "j", "band")
        .as[(Long, Long, Int)].collect().toSet

    // ---- reference: all three batches, uninterrupted ----
    val refDir = Files.createTempDirectory("graft-capstone-ref").toString
    val refIn = MemoryStream[(Long, String)]
    val qd = startDocs(refIn, refDir)
    val qp = startPairs(refIn, refDir)
    try {
      Seq(b1, b2, b3).foreach { b =>
        refIn.addData(b); qd.processAllAvailable(); qp.processAllAvailable()
      }
    } finally { qd.stop(); qp.stop() }
    val expectDocs = docsOf(refDir)
    val expectPairs = pairsOf(refDir)
    // the fixture does what it claims: quality dropped 4, the reference
    // corpus dropped 3, exact dedup dropped 12, the dup still paired
    assert(expectDocs.map(_._1) == Set(1L, 9L), expectDocs)
    assert(expectDocs.forall(_._3 == 1L), "step fold did not run")
    assert(expectPairs.map(p => (p._1, p._2)) == Set((1L, 12L)), expectPairs)
    assert(expectPairs.map(_._3) == Set(0, 1, 2, 3))

    // ---- crash run: commit b1, kill BOTH queries, leave b2 pending,
    // restart from the same checkpoints, land the duplicate ----
    val dir = Files.createTempDirectory("graft-capstone-crash").toString
    val in = MemoryStream[(Long, String)]
    val qd1 = startDocs(in, dir)
    val qp1 = startPairs(in, dir)
    try {
      in.addData(b1); qd1.processAllAvailable(); qp1.processAllAvailable()
    } finally { qd1.stop(); qp1.stop() }
    in.addData(b2) // after the stop: deterministically pending
    val qd2 = startDocs(in, dir)
    val qp2 = startPairs(in, dir)
    try {
      in.addData(b3); qd2.processAllAvailable(); qp2.processAllAvailable()
    } finally { qd2.stop(); qp2.stop() }
    assert(docsOf(dir) == expectDocs)
    assert(pairsOf(dir) == expectPairs)
  }

  test("streaming near-dup state on the ROCKSDB store: same crash " +
      "contract on the provider a 100 TB ingest actually runs") {
    // The scale claim ("RocksDB-backed at scale") materialized: the
    // IDENTICAL scenario with the state store swapped to
    // RocksDBStateStoreProvider — bucket state must survive the restart
    // through RocksDB's checkpoint files, not the default in-memory
    // HDFS-backed map. Conf capture uses getAll MEMBERSHIP, not
    // getOption (getOption returns the built-in default for never-set
    // confs, which would pin the default explicitly on restore).
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev =
      if (spark.conf.getAll.contains(providerKey))
        Some(spark.conf.get(providerKey))
      else None
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try nearDupCrashScenario("rocks")
    finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
