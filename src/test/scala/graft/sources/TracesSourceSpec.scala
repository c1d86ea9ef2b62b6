package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** EVM call-traces table across all providers. The reference declares the
  * `traces` table name (`config.py:125`) without dispatching it; here it is
  * a first-class chain table: synthetic generation, file-backed scan, and
  * the HTTP wire client all serve it with to-address/sighash pushdown.
  */
class TracesSourceSpec extends SparkSpec {

  // materialize the SYNTHETIC generation rules to parquet so the
  // file-backed and wire providers serve identical rows
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-traces").toString
    spark.read.format(classOf[ChainSource].getName)
      .option("table", "traces").option("fromBlock", "0")
      .option("toBlock", "150").option("logsPerBlock", "2").load()
      .repartitionByRange(4, col("block_number"))
      .sortWithinPartitions("block_number", "trace_index")
      .write.mode("overwrite").parquet(d + "/traces")
    d
  }

  private lazy val server: WireFixtureServer = {
    val rows = spark.read.parquet(s"$dir/traces")
      .select(ChainSource.tracesSchema.fieldNames.map(col): _*)
      .collect().map(_.toSeq.toArray).toIndexedSeq
    val s = new WireFixtureServer(ChainSource.tracesSchema, rows,
      "block_number", pageBlocks = 41, height = 150)
    s.start()
    s
  }

  private def plain: DataFrame = spark.read.parquet(s"$dir/traces")
  private def synthetic: DataFrame =
    spark.read.format(classOf[ChainSource].getName)
      .option("table", "traces").option("fromBlock", "0")
      .option("toBlock", "150").option("logsPerBlock", "2").load()
  private def file: DataFrame =
    spark.read.format(classOf[ParquetChainSource].getName)
      .option("path", s"$dir/traces").option("table", "traces").load()
  private def wire: DataFrame =
    spark.read.format(classOf[WireChainSource].getName)
      .option("url", server.url).option("table", "traces")
      .option("toBlock", "150").load()

  private def keyed(df: DataFrame): Set[Seq[Any]] =
    df.select(col("block_number"), col("trace_index"), hex(col("from_address")),
        hex(col("to_address")), hex(col("sighash")), hex(col("input")))
      .collect().map(_.toSeq).toSet

  private val s0 = ChainSource.sighashPool(0)
  private val s2 = ChainSource.sighashPool(2)
  private val a1 = ChainSource.addressPool(1)
  private val a3 = ChainSource.addressPool(3)

  private val cases: Seq[(String, Column)] = Seq(
    "plain range"     -> (col("block_number") >= 40 && col("block_number") < 110),
    "sighash equality" -> (col("sighash") === lit(s0)),
    "to_address IN"   -> col("to_address").isin(a1, a3),
    "range AND or-tree" -> (col("block_number") >= 30 &&
      (col("sighash") === lit(s2) || col("to_address") === lit(a1))))

  for ((name, pred) <- cases)
    test(s"traces providers agree with plain Spark under: $name") {
      val want = keyed(plain.filter(pred))
      assert(want.nonEmpty, "case must select rows")
      assert(keyed(synthetic.filter(pred)) == want, "synthetic diverged")
      assert(keyed(file.filter(pred)) == want, "file-backed diverged")
      assert(keyed(wire.filter(pred)) == want, "wire diverged")
    }

  test("traces sighash/to_address predicates push to the scan, no residual") {
    val df = synthetic.filter(col("sighash") === lit(s0) &&
      col("to_address") === lit(a1))
    assert(df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }.isEmpty, "predicate must be consumed by the source")
    val scan = df.queryExecution.executedPlan
      .collectFirst { case b: BatchScanExec => b }.get
    assert(scan.scan.description().contains("sighash:1"))
    assert(scan.scan.description().contains("to_address:1"))
    // input column decodes as selector ++ ABI word: selector prefix matches
    val rows = df.select(hex(col("sighash")).as("s"), hex(col("input")).as("i"))
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getString(1).startsWith(r.getString(0))))
  }
}
