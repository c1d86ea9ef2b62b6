package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.SparkSpec
import graft.functions.Hex
import graft.sources.WireProtocol.WireQuery

/** The wire CLIENT proven end-to-end against an in-process provider
  * fixture: pushed scan state travels as query JSON, pages come back as
  * Arrow IPC with `x-graft-next-block` pagination, and the reassembled
  * result is byte-identical to the file-backed source reading the same
  * parquet fixture directly.
  */
class WireChainSourceSpec extends SparkSpec {

  // same fixture layout as ParquetChainSourceSpec: 400 blocks × 3 logs
  // following the synthetic source's rules
  private lazy val parquetDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-wire").toString
    val rows = for (b <- 0L until 400L; i <- 0L until 3L) yield Row(
      b, i,
      ChainSource.addressPool((b % 5).toInt),
      ChainSource.topic0Pool(((b + i) % 3).toInt),
      { val a = new Array[Byte](32); a(31) = ((b * 7 + i) % 127).toByte; a },
      { val a = new Array[Byte](32); a(31) = ((b + i) % 100).toByte; a })
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 4), ChainSource.logsSchema)
      .repartitionByRange(4, col("block_number"))
      .sortWithinPartitions("block_number")
      .write.mode("overwrite").parquet(d + "/logs")
    d
  }

  // the provider fixture serves the SAME rows the parquet fixture holds,
  // page-bounded to 37 blocks so every slice must follow pagination
  private lazy val server: WireFixtureServer = {
    val rows = spark.read.parquet(s"$parquetDir/logs")
      .select(ChainSource.logsSchema.fieldNames.map(col): _*)
      .collect().map(_.toSeq.toArray).toIndexedSeq
    val s = new WireFixtureServer(ChainSource.logsSchema, rows,
      "block_number", pageBlocks = 37, height = 400)
    s.start()
    s
  }

  private def readWire(opts: (String, String)*): DataFrame = {
    val r = spark.read.format(classOf[WireChainSource].getName)
      .option("url", server.url).option("table", "logs")
    opts.foldLeft(r)((acc, kv) => acc.option(kv._1, kv._2)).load()
  }

  private def readFile(): DataFrame =
    spark.read.format(classOf[ParquetChainSource].getName)
      .option("path", s"$parquetDir/logs").option("table", "logs").load()

  private def scanOf(df: DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get

  private def keyed(df: DataFrame): Set[Seq[Any]] =
    df.select(col("block_number"), col("log_index"), hex(col("address")),
        hex(col("topic0")), hex(col("topic1")), hex(col("data")))
      .collect().map(_.toSeq).toSet

  private def drainReceived(): Seq[String] = {
    val out = Seq.newBuilder[String]
    var j = server.received.poll()
    while (j != null) { out += j; j = server.received.poll() }
    out.result()
  }

  test("paginated pages reassemble to exactly the file-backed source's rows") {
    drainReceived()
    val wire = readWire("fromBlock" -> "0", "toBlock" -> "400",
      "numPartitions" -> "3")
    assert(keyed(wire) == keyed(readFile()))
    // 400 blocks / 37-block pages ≥ 11 queries across 3 slices: the client
    // followed x-graft-next-block instead of assuming one page per slice
    val queries = drainReceived()
    assert(queries.size >= 11, s"only ${queries.size} wire queries — pagination not followed")
  }

  test("pushed range + request filters appear in the wire query JSON") {
    drainReceived()
    val t0 = ChainSource.topic0Pool(0)
    val df = readWire("toBlock" -> "400")
      .filter(col("block_number") >= 100 && col("topic0") === lit(t0))
    assert(df.count() == 300) // (b+i)%3==0 → 1 log/block for blocks 100..399
    // no Spark-side residual: the source consumed the whole predicate
    assert(df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }.isEmpty)
    assert(scanOf(df).scan.description().contains("topic0:1"))
    val qs = drainReceived().map(WireProtocol.parseQuery)
    assert(qs.nonEmpty)
    // every wire query carries the pushed range and the topic0 request
    assert(qs.forall(q => q.fromBlock >= 100 && q.toBlock <= 400))
    assert(qs.map(_.fromBlock).min == 100)
    assert(qs.forall(_.requests == Seq(ChainReq(Map("topic0" -> Set(t0.toSeq))))))
  }

  test("contradictory pushdown plans zero partitions and zero wire traffic") {
    drainReceived()
    // In ∩ EqualTo disjoint: a contradiction Catalyst does NOT fold itself
    // (plain a=X AND a=Y already becomes an empty LocalTableScan upstream),
    // so it must flow through ChainReq.and → requests == Seq.empty
    val df = readWire("toBlock" -> "400")
      .filter(col("topic0").isin(ChainSource.topic0Pool(0),
                ChainSource.topic0Pool(1)) &&
              col("topic0") === lit(ChainSource.topic0Pool(2)))
    assert(df.count() == 0)
    assert(scanOf(df).scan.description().contains("reqs=none"))
    assert(drainReceived().isEmpty,
      "a provably-empty scan must not query the provider")
  }

  test("empty request list round-trips as match-nothing on the wire") {
    val cols = Seq("block_number", "log_index", "topic0")
    val none = WireQuery("logs", 0, 400, Seq.empty, cols)
    // serialization preserves emptiness: [] ≠ [{}] (the ADVICE inversion)
    assert(none.toJson.contains("\"requests\":[]"))
    assert(WireProtocol.parseQuery(none.toJson) == none)
    val all = WireQuery("logs", 0, 400, Seq(ChainReq(Map.empty)), cols)
    assert(all.toJson.contains("\"requests\":[{}]"))
    assert(WireProtocol.parseQuery(all.toJson) == all)
    // and the server honors both: [] selects nothing, [{}] selects the page
    val allocator = new org.apache.arrow.memory.RootAllocator()
    try {
      val schema = StructType(cols.map(ChainSource.logsSchema(_)))
      val pNone = WireHttp.query(server.url, none.toJson)
      assert(WireProtocol.decodePage(schema, pNone.body, allocator).isEmpty)
      val pAll = WireHttp.query(server.url, all.toJson)
      // first page: 37 blocks × 3 logs
      assert(WireProtocol.decodePage(schema, pAll.body, allocator).size == 111)
      assert(pAll.nextBlock == 37 && pAll.height == 400)
    } finally allocator.close()
    drainReceived()
  }

  test("column pruning reaches the wire field_selection") {
    drainReceived()
    val df = readWire("toBlock" -> "400").select("block_number")
    assert(df.schema.fieldNames.toSeq == Seq("block_number"))
    assert(df.distinct().count() == 400)
    val qs = drainReceived().map(WireProtocol.parseQuery)
    assert(qs.nonEmpty && qs.forall(_.cols == Seq("block_number")))
  }

  test("absent toBlock defaults to the provider's archive height") {
    val df = readWire()
    assert(df.count() == 1200)
    assert(scanOf(df).scan.description().contains("head"))
  }

  test("filter.<col> option channel reaches the wire requests") {
    drainReceived()
    val addr2 = ChainSource.addressPool(2)
    val df = readWire("toBlock" -> "400", "filter.address" -> Hex.encode(addr2))
    // b%5==2 → 80 blocks × 3 logs
    assert(df.count() == 240)
    val qs = drainReceived().map(WireProtocol.parseQuery)
    assert(qs.forall(_.requests == Seq(ChainReq(Map("address" -> Set(addr2.toSeq))))))
  }

  test("transient provider failures are retried; query errors fail fast") {
    drainReceived()
    // two 503s, then healthy: the scan must succeed without Spark-level
    // task retries (local mode has maxFailures=1 — one uncaught IOException
    // would fail the job)
    server.failNext.set(2)
    val df = readWire("fromBlock" -> "0", "toBlock" -> "40",
      "numPartitions" -> "1", "retryBackoffMs" -> "1")
    assert(df.count() == 120)
    assert(server.failNext.get() <= 0)
    // a malformed query (unknown field_selection column) is a 400-class
    // error: surfaces immediately, never retried
    drainReceived()
    val bad = WireProtocol.WireQuery("logs", 0, 10,
      Seq(ChainReq(Map.empty)), Seq("no_such_column"))
    intercept[WireHttp.WireClientException] {
      WireHttp.retry(3, 1)(WireHttp.query(server.url, bad.toJson))
    }
    assert(drainReceived().size == 1, "4xx must not be retried")
  }

  test("ProviderSource drives the pipeline loop through the wire client") {
    drainReceived()
    val dir = java.nio.file.Files.createTempDirectory("graft-wire-pipe").toString
    val t0 = ChainSource.topic0Pool(0)
    graft.api.Pipeline.run(spark, graft.api.Pipeline(
      source = graft.api.ProviderSource(server.url, "logs", 0L, 400L,
        step = 200L, filters = Map("topic0" -> Seq(Hex.encode(t0)))),
      steps = Seq(graft.steps.Steps.SetChainId(7L)),
      sink = graft.sinks.ParquetSink(dir)))
    val out = spark.read.parquet(s"$dir/logs")
    assert(out.count() == 400) // (b+i)%3==0 → 1 matching log per block
    assert(out.select("chain_id").distinct().head().getLong(0) == 7L)
    assert(out.agg(min("block_number"), max("block_number")).head() ==
      Row(0L, 399L))
    // the request filter travelled the wire in BOTH slice batches
    val qs = drainReceived().map(WireProtocol.parseQuery)
    assert(qs.forall(_.requests == Seq(ChainReq(Map("topic0" -> Set(t0.toSeq))))))
    assert(qs.map(_.fromBlock).min == 0 && qs.map(_.toBlock).max == 400)
  }

  test("micro-batch stream paces on x-graft-height") {
    server.height = 200 // provider has only archived half the range
    val q = spark.readStream.format(classOf[WireChainSource].getName)
      .option("url", server.url).option("table", "logs")
      .option("fromBlock", "0").option("toBlock", "400")
      .option("blocksPerBatch", "100").option("numPartitions", "2")
      .load()
      .writeStream.format("memory").queryName("wire_stream")
      .start()
    try {
      q.processAllAvailable()
      // paced at the head: only blocks < height admitted
      assert(spark.table("wire_stream").count() == 600)
      server.height = 400 // the archive catches up; the stream follows
      q.processAllAvailable()
      assert(spark.table("wire_stream").count() == 1200)
      assert(q.recentProgress.count(_.numInputRows > 0) >= 4)
    } finally q.stop()
    drainReceived()
  }
}
