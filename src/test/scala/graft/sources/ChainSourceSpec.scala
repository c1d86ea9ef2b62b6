package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Keccak

/** DSv2 chain-provider spec: verifies the pushdown actually REACHES the
  * source (scan description + partition pruning), not just that results
  * are correct.
  */
class ChainSourceSpec extends SparkSpec {

  private def read(opts: (String, String)*): DataFrame = {
    val r = spark.read.format(classOf[ChainSource].getName)
    opts.foldLeft(r)((acc, kv) => acc.option(kv._1, kv._2)).load()
  }

  private def scanOf(df: DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get

  test("serves the full block range across partitions") {
    val df = read("fromBlock" -> "0", "toBlock" -> "100", "logsPerBlock" -> "2",
      "numPartitions" -> "4")
    assert(df.count() == 200)
    assert(df.select(min("block_number"), max("block_number")).head() ==
      org.apache.spark.sql.Row(0L, 99L))
  }

  test("block-range filters are consumed by the source (partition pruning)") {
    val df = read("fromBlock" -> "0", "toBlock" -> "1000", "logsPerBlock" -> "1",
        "numPartitions" -> "10")
      .filter(col("block_number") >= 400 && col("block_number") < 500)
    assert(df.count() == 100)
    val scan = scanOf(df)
    assert(scan.scan.description().contains("[400,500)"),
      s"range not pushed: ${scan.scan.description()}")
    // 100-block slice over 10 partitions of the narrowed range
    assert(scan.inputRDD.getNumPartitions == 10)
  }

  test("topic0 equality is evaluated server-side") {
    val t0 = ChainSource.topic0Pool(0)
    val df = read("fromBlock" -> "0", "toBlock" -> "300", "logsPerBlock" -> "3")
      .filter(col("topic0") === lit(t0))
    // (block + logIdx) % 3 == 0 → exactly one log per block
    assert(df.count() == 300)
    assert(scanOf(df).scan.description().contains("topic0:1"))
  }

  test("topic0 IN-list pushdown generates only matching rows at the source") {
    val df = read("fromBlock" -> "0", "toBlock" -> "300", "logsPerBlock" -> "3")
      .filter(col("topic0").isin(ChainSource.topic0Pool(0),
        ChainSource.topic0Pool(2)))
    // per block: logIdx with (block+logIdx)%3 ∈ {0,2} → exactly 2 of 3 logs
    assert(df.count() == 600)
    // the IN set reached the source (description) AND was consumed there:
    // no Spark-side Filter remains in the physical plan
    assert(scanOf(df).scan.description().contains("topic0:2"),
      scanOf(df).scan.description())
    val filters = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }
    assert(filters.isEmpty, s"residual filter left: $filters")
    // and the source really generated only matching rows: total partition
    // row count == result count (nothing was filtered after the scan)
    assert(scanOf(df).inputRDD.mapPartitions(
      it => Iterator(it.size)).collect().sum == 600)
  }

  test("OR-of-requests pushdown (cherry's repeated LogRequest semantics)") {
    val t1 = ChainSource.topic0Pool(1)
    val addr2 = ChainSource.addressPool(2)
    val df = read("fromBlock" -> "0", "toBlock" -> "300", "logsPerBlock" -> "3")
      .filter(col("topic0") === lit(t1) || col("address") === lit(addr2))
    // request A: (block+idx)%3==1 → 1 log/block = 300 rows
    // request B: block%5==2 → 60 blocks × 3 logs = 180 rows
    // overlap: block%5==2 AND (block+idx)%3==1 → 60 rows
    assert(df.count() == 300 + 180 - 60)
    val desc = scanOf(df).scan.description()
    assert(desc.contains("topic0:1") && desc.contains("address:1"), desc)
    assert(df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }.isEmpty, "OR tree was not fully consumed by the source")
  }

  test("SVM instructions table: program_id + discriminator pushdown, e2e decode") {
    import graft.steps.Steps
    val pid = ChainSource.programIdPool(0)
    val disc = ChainSource.discriminatorPool(0)
    val df = read("table" -> "instructions", "fromBlock" -> "0",
        "toBlock" -> "30", "logsPerBlock" -> "2")
      .filter(col("program_id") === lit(pid) && col("discriminator") === lit(disc))
    // disc 0 → idx==0; pid 0 → (block+0)%3==0 → blocks 0,3,…,27 = 10 rows
    assert(df.count() == 10)
    val desc = scanOf(df).scan.description()
    assert(desc.contains("program_id:1") && desc.contains("discriminator:1"), desc)
    // e2e: Anchor-shaped payload decodes via the Borsh step (jup_swap.py:115-151)
    val discHex = disc.map("%02x".format(_)).mkString
    val decoded = Steps.SvmDecodeInstructions(discHex, "amount:u64",
        inputTable = "instructions", hstack = true)(
        spark, Map("instructions" -> df))("decoded_instructions")
    val amounts = decoded.select(col("amount").cast("long"), col("block_slot"))
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(amounts(3L) == 300L && amounts(27L) == 2700L)
  }

  test("column pruning reaches row generation") {
    val df = read("fromBlock" -> "0", "toBlock" -> "10").select("block_number")
    val desc = scanOf(df).scan.description()
    assert(desc.contains("cols=block_number"), s"not pruned: $desc")
  }

  test("deterministic topic0 pool matches keccak of the event signatures") {
    assert(ChainSource.topic0Pool(1).sameElements(Keccak.topic0("Event1()")))
  }

  test("option-declared request filters reach the source in every micro-batch") {
    // Spark's V2 filter pushdown is batch-only, so streaming requests are
    // declared as reader options (cherry's provider-query style): the
    // source must then generate ONLY matching rows in each batch.
    val t0Hex = ChainSource.topic0Pool(0).map("%02x".format(_)).mkString
    val q = spark.readStream.format(classOf[ChainSource].getName)
      .option("fromBlock", "0").option("toBlock", "60")
      .option("blocksPerBatch", "20").option("logsPerBlock", "3")
      .option("filter.topic0", t0Hex)
      .load()
      .writeStream.format("memory").queryName("chain_pushdown_stream")
      .start()
    try {
      q.processAllAvailable()
      // (block+idx)%3==0 → exactly 1 of 3 logs per block, across 3 batches
      assert(spark.table("chain_pushdown_stream").count() == 60)
      // server-side: each batch's INPUT row count equals its output count
      val inputRows = q.recentProgress.map(_.numInputRows).sum
      assert(inputRows == 60, s"source emitted $inputRows rows, not 60")
    } finally q.stop()
  }

  test("option-declared filters compose with batch pushdown (AND semantics)") {
    val t0Hex = ChainSource.topic0Pool(0).map("%02x".format(_)).mkString
    val addr2 = ChainSource.addressPool(2)
    val df = read("fromBlock" -> "0", "toBlock" -> "300", "logsPerBlock" -> "3",
        "filter.topic0" -> t0Hex)
      .filter(col("address") === lit(addr2))
    // topic0 pool 0 (1/block) AND block%5==2 (60 blocks) → 60 rows
    assert(df.count() == 60)
    val desc = scanOf(df).scan.description()
    assert(desc.contains("topic0:1") && desc.contains("address:1"), desc)
  }

  test("micro-batch stream pages the chain in blocksPerBatch-paced batches") {
    val q = spark.readStream.format(classOf[ChainSource].getName)
      .option("fromBlock", "0").option("toBlock", "50")
      .option("blocksPerBatch", "20").option("logsPerBlock", "2")
      .option("numPartitions", "2")
      .load()
      .writeStream.format("memory").queryName("chain_stream")
      .start()
    try {
      q.processAllAvailable()
      // 50 blocks × 2 logs, admitted 20 blocks per trigger → ≥3 batches
      assert(spark.table("chain_stream").count() == 100)
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
        q.recentProgress.map(_.numInputRows).mkString(","))
    } finally q.stop()
  }
}
