package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.functions.Keccak

/** DataSource V2 "chain provider": the Spark-native analog of the
  * reference's remote provider query DSL (cherry SURVEY §2.1 S1–S9 —
  * HyperSync/SQD serve filtered, projected log batches server-side). A real
  * connector would speak the provider's wire protocol; this one serves a
  * deterministic synthetic chain so the PUSHDOWN PLUMBING — the part that
  * matters at 100 TB — is real and testable:
  *
  *   - `SupportsPushDownFilters`: block-range predicates and `topic0 =`
  *     equality are consumed by the source (≙ `LogRequest.topic0`,
  *     `Query.from_block/to_block`) and never re-evaluated by Spark;
  *   - `SupportsPushDownRequiredColumns`: column pruning reaches row
  *     generation (≙ the field-selection structs, S6);
  *   - block-range slicing into `numPartitions` InputPartitions (≙ the
  *     provider's paged streaming, S1) — each partition generates only its
  *     slice, so scan parallelism matches the cluster, not the data size.
  *
  * Usage:
  *   spark.read.format("graft.sources.ChainSource")
  *     .option("fromBlock", 0).option("toBlock", 10000)
  *     .option("logsPerBlock", 3).option("numPartitions", 8).load()
  */
class ChainSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graftchain"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChainSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new ChainTable(properties.asScala.toMap)
}

object ChainSource {
  val schema: StructType = StructType(Seq(
    StructField("block_number", LongType, nullable = false),
    StructField("log_index", LongType, nullable = false),
    StructField("topic0", BinaryType, nullable = false),
    StructField("topic1", BinaryType, nullable = false),
    StructField("data", BinaryType, nullable = false)))

  /** Three deterministic synthetic event types. */
  val topic0Pool: IndexedSeq[Array[Byte]] =
    (0 until 3).map(i => Keccak.topic0(s"Event$i()"))

  private[sources] def logRow(block: Long, logIdx: Long,
                              cols: Array[String]): InternalRow = {
    val t0 = topic0Pool(((block + logIdx) % 3).toInt)
    val values = cols.map {
      case "block_number" => block
      case "log_index"    => logIdx
      case "topic0"       => t0
      case "topic1"       =>
        val a = new Array[Byte](32); a(31) = ((block * 7 + logIdx) % 127).toByte; a
      case "data"         =>
        val d = new Array[Byte](32); d(31) = ((block + logIdx) % 100).toByte; d
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    new GenericInternalRow(values.asInstanceOf[Array[Any]])
  }
}

private class ChainTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = "graft_chain"
  override def schema(): StructType = ChainSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ChainScanBuilder(props ++ options.asScala)
}

private class ChainScanBuilder(props: Map[String, String]) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var fromBlock = props.getOrElse("fromBlock", "0").toLong
  private var toBlock = props.getOrElse("toBlock", "1000").toLong // exclusive
  private val logsPerBlock = props.getOrElse("logsPerBlock", "3").toInt
  private val numPartitions = props.getOrElse("numPartitions", "4").toInt
  private var topic0Filter: Option[Seq[Byte]] = None
  private var pushed: Array[Filter] = Array.empty
  private var requiredCols: Array[String] = ChainSource.schema.fieldNames

  /** Consume block-range and topic0 predicates (≙ provider query DSL);
    * everything else stays with Spark as a residual.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThanOrEqual("block_number", v: Long) => fromBlock = math.max(fromBlock, v); true
      case GreaterThan("block_number", v: Long)        => fromBlock = math.max(fromBlock, v + 1); true
      case LessThan("block_number", v: Long)           => toBlock = math.min(toBlock, v); true
      case LessThanOrEqual("block_number", v: Long)    => toBlock = math.min(toBlock, v + 1); true
      case EqualTo("topic0", v: Array[Byte])           => topic0Filter = Some(v.toSeq); true
      case _                                           => false
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    requiredCols = requiredSchema.fieldNames

  override def build(): Scan = new Scan with Batch {
    private val blocksPerBatch = props.getOrElse("blocksPerBatch", "100").toLong

    private def slice(lo0: Long, hi: Long): Array[InputPartition] = {
      val span = math.max(hi - lo0, 0L)
      val step = math.max(1L, (span + numPartitions - 1) / numPartitions)
      (lo0 until hi by step).map { lo =>
        ChainPartition(lo, math.min(lo + step, hi), logsPerBlock,
          topic0Filter, requiredCols): InputPartition
      }.toArray
    }
    private val readerFactory: PartitionReaderFactory =
      (partition: InputPartition) =>
        new ChainReader(partition.asInstanceOf[ChainPartition])

    override def readSchema(): StructType =
      StructType(requiredCols.map(c => ChainSource.schema(c)))
    override def toBatch: Batch = this
    override def description(): String =
      s"graft_chain [$fromBlock,$toBlock) topic0=${topic0Filter.isDefined} cols=${requiredCols.mkString(",")}"

    override def planInputPartitions(): Array[InputPartition] =
      slice(fromBlock, toBlock)
    override def createReaderFactory(): PartitionReaderFactory = readerFactory

    /** Streaming analog of the reference's paced pull loop (cherry
      * `pipeline.py:110-113`): offsets are block numbers; each trigger
      * admits at most `blocksPerBatch` blocks, and the stream goes idle at
      * the (bounded, synthetic) chain head — a live connector would keep
      * advancing `latestOffset` as blocks arrive. Pushdown state (range,
      * topic0, pruned columns) carries into every micro-batch's partitions.
      */
    override def toMicroBatchStream(checkpointLocation: String)
        : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
      new org.apache.spark.sql.connector.read.streaming.MicroBatchStream
          with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
        import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}
        override def initialOffset(): Offset = ChainOffset(fromBlock)
        // admission-controlled pacing: each trigger admits blocksPerBatch
        override def latestOffset(start: Offset, limit: ReadLimit): Offset =
          ChainOffset(math.min(toBlock,
            start.asInstanceOf[ChainOffset].block + blocksPerBatch))
        override def latestOffset(): Offset =
          throw new UnsupportedOperationException(
            "paced source: use latestOffset(start, limit)")
        override def reportLatestOffset(): Offset = ChainOffset(toBlock)
        override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
        override def deserializeOffset(json: String): Offset =
          ChainOffset(json.toLong)
        override def planInputPartitions(start: Offset, end: Offset)
            : Array[InputPartition] =
          slice(start.asInstanceOf[ChainOffset].block,
            end.asInstanceOf[ChainOffset].block)
        override def createReaderFactory(): PartitionReaderFactory = readerFactory
        override def commit(end: Offset): Unit = ()
        override def stop(): Unit = ()
      }
  }
}

/** Block-number stream offset (JSON = the number). */
private[sources] case class ChainOffset(block: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = block.toString
}

private case class ChainPartition(fromBlock: Long, toBlock: Long,
                                  logsPerBlock: Int, topic0: Option[Seq[Byte]],
                                  cols: Array[String]) extends InputPartition

private class ChainReader(p: ChainPartition) extends PartitionReader[InternalRow] {
  private var block = p.fromBlock
  private var logIdx = -1L
  private var row: InternalRow = _

  override def next(): Boolean = {
    while (block < p.toBlock) {
      logIdx += 1
      if (logIdx >= p.logsPerBlock) { logIdx = 0; block += 1 }
      if (block < p.toBlock) {
        // server-side topic0 predicate: skip non-matching logs at the source
        val matches = p.topic0 match {
          case Some(t) =>
            ChainSource.topic0Pool(((block + logIdx) % 3).toInt).toSeq == t
          case None => true
        }
        if (matches) {
          row = ChainSource.logRow(block, logIdx, p.cols)
          return true
        }
      }
    }
    false
  }
  override def get(): InternalRow = row
  override def close(): Unit = ()
}
