package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.channels.Channels

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.arrow.memory.BufferAllocator
import org.apache.arrow.vector.{BigIntVector, VarBinaryVector, VectorSchemaRoot}
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{BinaryType, LongType, StructType}

/** Wire protocol for the remote chain-provider plane: the Spark-native
  * analog of the reference's provider HTTP APIs (cherry delegates ingestion
  * to provider clients configured by `ProviderConfig(kind, url)` +
  * `ingest.Query` — `examples/erc20_custom.py:93-107`; HyperSync-style
  * providers serve filtered/projected batches as Arrow over HTTP, SQD-style
  * portals serve JSON lines). This module defines a provider-agnostic
  * protocol with the same moving parts:
  *
  *   - a QUERY document (JSON) carrying block range, OR'd request list
  *     (≙ repeated `LogRequest`/`InstructionRequest`), and field selection;
  *   - a PAGE response: Arrow IPC stream body + `x-graft-next-block`
  *     header (≙ the provider's pagination cursor — clients re-query from
  *     `next_block` until they reach their target), plus
  *     `x-graft-height` (≙ the provider's archive-height endpoint) so a
  *     streaming client can pace itself against the chain head.
  *
  * Everything here is pure (de)serialization shared by the client
  * (`WireChainSource`) and the test fixture server; neither end touches
  * Spark execution classes beyond `InternalRow` construction.
  */
object WireProtocol {
  private val mapper = new ObjectMapper()

  // canonical codec (graft.functions.Hex): strict — odd-length or non-hex
  // byte strings fail the query instead of silently matching wrong events
  def hex(b: Seq[Byte]): String = graft.functions.Hex.encode(b)
  def unhex(s: String): Seq[Byte] = graft.functions.Hex.decode(s).toSeq

  /** One provider query page request. `toBlock` is exclusive, matching the
    * reference's `to_block` convention on EVM queries.
    *
    * Request-list semantics (must mirror the engine's pushdown convention,
    * `ChainScanBuilder.pushFilters`): an EMPTY `requests` list means
    * match-NOTHING (AND'd constraints contradicted — the scan is provably
    * empty), while a single unconstrained request `Seq(ChainReq(Map.empty))`
    * is the explicit match-ALL. The JSON carries the distinction verbatim:
    * `"requests":[]` vs `"requests":[{}]`.
    */
  case class WireQuery(table: String, fromBlock: Long, toBlock: Long,
                       requests: Seq[ChainReq], cols: Seq[String]) {
    def toJson: String = {
      val root = mapper.createObjectNode()
      root.put("table", table)
      root.put("from_block", fromBlock)
      root.put("to_block", toBlock)
      val reqs = root.putArray("requests")
      requests.foreach { r =>
        val o = reqs.addObject()
        r.cs.toSeq.sortBy(_._1).foreach { case (col, values) =>
          val arr = o.putArray(col)
          // sorted for deterministic golden-test bytes
          values.toSeq.map(hex).sorted.foreach(arr.add)
        }
      }
      val fields = root.putArray("field_selection")
      cols.foreach(fields.add)
      mapper.writeValueAsString(root)
    }
  }

  def parseQuery(json: String): WireQuery = {
    val root: JsonNode = mapper.readTree(json)
    val reqs = root.get("requests").elements().asScala.map { o =>
      ChainReq(o.asInstanceOf[ObjectNode].properties().asScala.map { e =>
        e.getKey -> e.getValue.elements().asScala.map(v => unhex(v.asText())).toSet
      }.toMap)
    }.toSeq
    WireQuery(
      table = root.get("table").asText(),
      fromBlock = root.get("from_block").asLong(),
      toBlock = root.get("to_block").asLong(),
      // empty stays empty: [] is match-nothing, [{}] is the explicit
      // match-all — inventing a match-all here would flip a provably-empty
      // scan into a full-range scan after one wire round-trip
      requests = reqs,
      cols = root.get("field_selection").elements().asScala.map(_.asText()).toSeq)
  }

  /** Spark read schema → Arrow schema. The chain tables are LONG + BINARY
    * only (block numbers/indices + hashes/payloads), so the mapping is
    * total for this plane and fails loudly for anything else.
    */
  def arrowSchema(schema: StructType): ArrowSchema = {
    val fields = schema.fields.map { f =>
      val t = f.dataType match {
        case LongType   => new ArrowType.Int(64, true)
        case BinaryType => ArrowType.Binary.INSTANCE
        case other => throw new IllegalArgumentException(
          s"wire protocol does not carry ${other.simpleString} (column ${f.name})")
      }
      new Field(f.name, FieldType.nullable(t), java.util.Collections.emptyList())
    }
    new ArrowSchema(java.util.Arrays.asList(fields: _*))
  }

  /** Encode rows (positionally matching `schema`) as one Arrow IPC stream.
    * Values are `Long` / `Array[Byte]` per the schema. Used by the fixture
    * server; a real provider produces the same bytes from its store.
    */
  def encodePage(schema: StructType, rows: Seq[Array[Any]],
                 allocator: BufferAllocator, batchRows: Int = 4096): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val root = VectorSchemaRoot.create(arrowSchema(schema), allocator)
    try {
      val writer = new ArrowStreamWriter(root, null, Channels.newChannel(out))
      writer.start()
      rows.grouped(math.max(batchRows, 1)).foreach { chunk =>
        root.allocateNew()
        chunk.zipWithIndex.foreach { case (row, i) =>
          schema.fields.zipWithIndex.foreach { case (f, c) =>
            // null-symmetric with decodePage: the schema declares every
            // field nullable, so the encoder must carry nulls, not coerce
            // them (null Long ≠ 0L) or NPE on them (null bytes)
            (f.dataType, root.getVector(c)) match {
              case (LongType, v: BigIntVector) => row(c) match {
                case null    => v.setNull(i)
                case x: Long => v.setSafe(i, x)
                case other   => throw new IllegalStateException(
                  s"expected Long for ${f.name}, got ${other.getClass}")
              }
              case (BinaryType, v: VarBinaryVector) => row(c) match {
                case null           => v.setNull(i)
                case b: Array[Byte] => v.setSafe(i, b)
                case other          => throw new IllegalStateException(
                  s"expected Array[Byte] for ${f.name}, got ${other.getClass}")
              }
              case (t, v) => throw new IllegalStateException(s"$t vs ${v.getClass}")
            }
          }
        }
        root.setRowCount(chunk.size)
        writer.writeBatch()
      }
      writer.end()
    } finally root.close()
    out.toByteArray
  }

  /** Lazily-decoded Arrow IPC page: rows are yielded per Arrow RECORD
    * BATCH as the stream is read, so peak decoded-row memory is one batch
    * (the encoder's `batchRows`), never the whole page — a provider
    * serving 64 MB pages would otherwise double peak memory per task
    * (body bytes + all decoded rows). Columns are matched by NAME — the
    * server may order `field_selection` differently.
    *
    * The Arrow reader self-closes when the stream is exhausted; `close()`
    * is idempotent and MUST be called if the iterator is abandoned early
    * (task abort, LIMIT) or its buffers leak into the allocator.
    */
  final class PageRowIterator private[sources] (
      schema: StructType, body: Array[Byte], allocator: BufferAllocator)
      extends Iterator[InternalRow] with AutoCloseable {
    private val reader =
      new ArrowStreamReader(new ByteArrayInputStream(body), allocator)
    private val (root, vectors) = try {
      val r = reader.getVectorSchemaRoot // reads the stream-header schema
      (r, schema.fields.map { f =>
        val v = r.getVector(f.name)
        if (v == null) throw new IllegalArgumentException(
          s"page missing requested column ${f.name}; server sent " +
            r.getSchema.getFields.asScala.map(_.getName).mkString(","))
        v
      })
    } catch { case e: Throwable => reader.close(); throw e }
    private var batch: Array[InternalRow] = Array.empty
    private var i = 0
    private var closed = false

    override def hasNext: Boolean = {
      while (i >= batch.length && !closed) {
        val loaded =
          try reader.loadNextBatch()
          catch { case e: Throwable => close(); throw e }
        if (loaded) { batch = decodeBatch(); i = 0 } else close()
      }
      i < batch.length
    }
    override def next(): InternalRow = {
      if (!hasNext) throw new NoSuchElementException("page exhausted")
      val r = batch(i); i += 1; r
    }
    override def close(): Unit = if (!closed) { closed = true; reader.close() }

    // per-COLUMN readers, resolved once at construction: the runtime type
    // dispatch must not run rows×columns times per batch in the scan's
    // innermost loop (4096 rows × 8 cols = 32k pattern matches per batch)
    private val readers: Array[Int => Any] = try vectors.map {
      case v: BigIntVector    => (r: Int) => if (v.isNull(r)) null else v.get(r)
      case v: VarBinaryVector => (r: Int) => if (v.isNull(r)) null else v.get(r)
      case v => throw new IllegalStateException(s"unexpected vector ${v.getClass}")
    }: Array[Int => Any]
    catch { case e: Throwable => reader.close(); throw e }

    // copy out one loaded batch (VarBinaryVector.get already copies bytes;
    // the vectors' memory is overwritten by the next loadNextBatch)
    private def decodeBatch(): Array[InternalRow] = {
      val n = root.getRowCount
      val out = new Array[InternalRow](n)
      var r = 0
      while (r < n) {
        val values = new Array[Any](readers.length)
        var c = 0
        while (c < readers.length) {
          values(c) = readers(c)(r)
          c += 1
        }
        out(r) = new GenericInternalRow(values)
        r += 1
      }
      out
    }
  }

  /** Batch-lazy page decode — see [[PageRowIterator]]. */
  def decodePageIterator(schema: StructType, body: Array[Byte],
                         allocator: BufferAllocator): PageRowIterator =
    new PageRowIterator(schema, body, allocator)

  /** Eager page decode: drains [[decodePageIterator]]. Test/fixture
    * convenience; the scan path iterates batch-by-batch instead.
    */
  def decodePage(schema: StructType, body: Array[Byte],
                 allocator: BufferAllocator): Seq[InternalRow] = {
    val it = decodePageIterator(schema, body, allocator)
    try it.toVector finally it.close()
  }
}
