package graft

import java.math.BigInteger
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.api.{ParquetSource, Pipeline}
import graft.functions.{GraftFunctions => F, Keccak}
import graft.sinks.{ParquetSink, Resume}
import graft.steps.Steps

/** End-to-end ERC20 transfer-indexing pipeline, mirroring the reference's
  * flagship example (cherry `examples/erc20_custom.py`): filter logs by
  * topic0 → decode Transfer events → stamp chain id → hex-encode → sink
  * with anchor-last blocks → resume from the sink watermark.
  */
class EvmPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val transferSig =
    "Transfer(address indexed from, address indexed to, uint256 amount)"
  private val topic0 = Keccak.topic0(transferSig)

  private def addr(fill: Byte): Array[Byte] = Array.fill[Byte](20)(fill)
  private def topicOf(a: Array[Byte]): Array[Byte] = new Array[Byte](12) ++ a
  private def amountWord(v: BigInteger): Array[Byte] = {
    val out = new Array[Byte](32)
    val raw = v.toByteArray.dropWhile(_ == 0)
    System.arraycopy(raw, 0, out, 32 - raw.length, raw.length)
    out
  }

  test("erc20 pipeline: filter by topic0, decode, stamp, sink, resume") {
    val dir = Files.createTempDirectory("graft-evm").toString

    // synthetic chain slice: blocks + logs (one non-Transfer log to filter out)
    val blocks = Seq((100L, "0xb100"), (101L, "0xb101")).toDF("block_number", "hash")
    val logs = Seq(
      (100L, 0L, topic0, topicOf(addr(0x11)), topicOf(addr(0x22)),
        amountWord(BigInteger.valueOf(5000))),
      (101L, 0L, topic0, topicOf(addr(0x22)), topicOf(addr(0x33)),
        amountWord(new BigInteger("10").pow(18))),
      (101L, 1L, Array.fill[Byte](32)(0x7f), topicOf(addr(0x44)), null,
        amountWord(BigInteger.ONE)) // foreign event — must be filtered
    ).toDF("block_number", "log_index", "topic0", "topic1", "topic2", "data")
    blocks.write.mode("overwrite").parquet(s"$dir/in/blocks.parquet")
    logs.write.mode("overwrite").parquet(s"$dir/in/logs.parquet")

    val pipeline = Pipeline(
      source = ParquetSource(s"$dir/in", Seq("blocks", "logs")),
      steps = Seq(
        // provider-side topic0 predicate (cherry LogRequest, S4)
        Steps.Fn((_, t) => t + ("logs" ->
          t("logs").filter(F.hex_lower(col("topic0"), prefixed = false) ===
            topic0.map("%02x".format(_)).mkString))),
        Steps.EvmDecodeEvents(transferSig, inputTable = "logs",
          outputTable = "transfers", hstack = true),
        Steps.Fn((_, t) => t + ("transfers" -> t("transfers")
          .withColumn("amount_dec", F.u256_to_decimal(col("amount")))
          .select("block_number", "log_index", "from", "to", "amount_dec"))),
        Steps.SetChainId(1L),
        Steps.HexEncode(tables = Some(Seq("transfers")))),
      sink = ParquetSink(s"$dir/out", anchorTable = Some("blocks")))
    Pipeline.run(spark, pipeline)

    val transfers = spark.read.parquet(s"$dir/out/transfers")
      .orderBy("block_number", "log_index")
    assert(transfers.count() == 2) // foreign event filtered out
    val rows = transfers.select("from", "to", "amount_dec", "chain_id")
      .collect()
    assert(rows(0).getString(0) == "0x" + "11" * 20)
    assert(rows(0).getString(1) == "0x" + "22" * 20)
    assert(rows(0).getDecimal(2).longValueExact() == 5000L)
    assert(rows(0).getLong(3) == 1L)
    assert(rows(1).getDecimal(2).toBigInteger == new BigInteger("10").pow(18))

    // resume pattern: anchor table written last carries the watermark
    assert(Resume.maxWatermark(
      spark.read.parquet(s"$dir/out/blocks"), "block_number").contains(101L))
  }

  test("svm pipeline: program_id+discriminator pushdown, Borsh decode, base58, sink") {
    // the jup_swap.py shape end-to-end: DSv2 instructions source with
    // server-side program/discriminator filtering → Borsh-decode the
    // Anchor payload → base58-encode the program id → sink
    import graft.sources.ChainSource
    val dir = Files.createTempDirectory("graft-svm").toString
    val pid = ChainSource.programIdPool(0)
    val disc = ChainSource.discriminatorPool(0)
    val discHex = disc.map("%02x".format(_)).mkString

    val src = new graft.api.Source {
      def batches(s: org.apache.spark.sql.SparkSession) = Iterator.single(Map(
        "instructions" -> s.read.format(classOf[ChainSource].getName)
          .option("table", "instructions")
          .option("fromBlock", "0").option("toBlock", "30")
          .option("logsPerBlock", "2")
          .option("filter.program_id", pid.map("%02x".format(_)).mkString)
          .option("filter.discriminator", discHex)
          .load()))
    }
    val pipeline = Pipeline(
      source = src,
      steps = Seq(
        Steps.SvmDecodeInstructions(discHex, "amount:u64",
          inputTable = "instructions", outputTable = "swaps", hstack = true),
        Steps.Fn((_, t) => t + ("swaps" -> t("swaps")
          .select("block_slot", "instruction_index", "program_id", "amount"))),
        Steps.Base58Encode(tables = Some(Seq("swaps"))),
        Steps.SetChainId(101L)),
      sink = ParquetSink(s"$dir/out"))
    Pipeline.run(spark, pipeline)

    val swaps = spark.read.parquet(s"$dir/out/swaps").orderBy("block_slot")
    // disc 0 → idx 0; pid 0 → block%3==0 → blocks 0,3,…,27
    assert(swaps.count() == 10)
    val r = swaps.filter($"block_slot" === 27L).head()
    assert(r.getDecimal(r.fieldIndex("amount")).longValueExact() == 2700L)
    // base58 of the 32-byte program id (leading zeros → leading '1's)
    val b58 = r.getString(r.fieldIndex("program_id"))
    assert(b58.startsWith("1") && b58.nonEmpty)
    assert(r.getLong(r.fieldIndex("chain_id")) == 101L)
  }
}
