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
    assert(scanOf(df).scan.description().contains("topic0=true"))
  }

  test("column pruning reaches row generation") {
    val df = read("fromBlock" -> "0", "toBlock" -> "10").select("block_number")
    val desc = scanOf(df).scan.description()
    assert(desc.contains("cols=block_number"), s"not pruned: $desc")
  }

  test("deterministic topic0 pool matches keccak of the event signatures") {
    assert(ChainSource.topic0Pool(1).sameElements(Keccak.topic0("Event1()")))
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
