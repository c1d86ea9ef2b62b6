package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{ConcurrentLinkedQueue, Executors}

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.arrow.memory.RootAllocator
import org.apache.spark.sql.types.StructType

/** In-process provider fixture: the SERVER half of [[WireProtocol]],
  * standing in for a HyperSync/SQD-style endpoint in tests. Holds a
  * full-schema row set (typically collected from the same parquet fixture
  * [[ParquetChainSource]] reads), answers `POST /` wire queries with
  * Arrow IPC pages bounded to `pageBlocks` blocks (so clients MUST follow
  * `x-graft-next-block` pagination), and `GET /height` with the archive
  * height. Records every received query JSON for pushdown assertions.
  */
class WireFixtureServer(schema: StructType, rows: IndexedSeq[Array[Any]],
                        blockCol: String, pageBlocks: Long,
                        @volatile var height: Long) {
  require(pageBlocks >= 1, "pageBlocks must be >= 1")

  /** Every query JSON body received, in arrival order. */
  val received = new ConcurrentLinkedQueue[String]()

  /** Fault injection: the next N query requests answer 503 (transient). */
  val failNext = new java.util.concurrent.atomic.AtomicInteger(0)

  private val blockIdx = schema.fieldIndex(blockCol)
  private val allocator = new RootAllocator()
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.setExecutor(Executors.newFixedThreadPool(4))

  server.createContext("/height", (ex: HttpExchange) => {
    val body = height.toString.getBytes(UTF_8)
    ex.sendResponseHeaders(200, body.length)
    ex.getResponseBody.write(body)
    ex.close()
  })

  server.createContext("/", (ex: HttpExchange) => {
    try {
      val json = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      received.add(json)
      if (failNext.get() > 0 && failNext.getAndDecrement() > 0) {
        val msg = "injected transient failure".getBytes(UTF_8)
        ex.sendResponseHeaders(503, msg.length)
        ex.getResponseBody.write(msg)
      } else {
        // parse/validation failures of the query document are the CLIENT's
        // fault → 400 (non-retryable per the client's 4xx/5xx split);
        // anything the server trips over after a valid parse is a SERVER
        // bug → 500 (outer catch), never disguised as a query error.
        val parsed = try {
          val q = WireProtocol.parseQuery(json)
          // explicit VALIDATION (still the client's fault → 400): unknown
          // projection or filter columns, inverted block range
          val known = schema.fieldNames.toSet
          val badCols = (q.cols ++ q.requests.flatMap(_.cs.keys))
            .filterNot(known)
          if (badCols.nonEmpty) Left(s"unknown column(s): ${badCols.mkString(",")}")
          else if (q.toBlock < q.fromBlock) Left("toBlock < fromBlock")
          else Right(q)
        } catch { case e: Exception => Left(String.valueOf(e.getMessage)) }
        parsed match {
          case Left(errMsg) =>
            val msg = errMsg.getBytes(UTF_8)
            ex.sendResponseHeaders(400, msg.length)
            ex.getResponseBody.write(msg)
          case Right(q) =>
            // the SERVER bounds page size: the pagination contract the
            // client must follow via x-graft-next-block
            val pageEnd = math.min(q.toBlock, q.fromBlock + pageBlocks)
            val colIdx = q.cols.map(schema.fieldIndex).toArray
            val matched = rows.filter { r =>
              val b = r(blockIdx).asInstanceOf[Long]
              b >= q.fromBlock && b < pageEnd &&
                // [] = match-nothing, [{}] = match-all (WireProtocol contract)
                q.requests.exists(_.matches(c =>
                  r(schema.fieldIndex(c)).asInstanceOf[Array[Byte]].toSeq))
            }.map(r => colIdx.map(r(_)))
            val projSchema = StructType(q.cols.map(schema(_)))
            val body = WireProtocol.encodePage(projSchema, matched, allocator)
            ex.getResponseHeaders.set("x-graft-next-block", pageEnd.toString)
            ex.getResponseHeaders.set("x-graft-height", height.toString)
            ex.getResponseHeaders.set("Content-Type", "application/vnd.apache.arrow.stream")
            ex.sendResponseHeaders(200, body.length)
            ex.getResponseBody.write(body)
        }
      }
    } catch {
      case e: Exception =>
        // unexpected server-side failure (e.g. a null in a filterable
        // column NPEing the match lambda) → 500, which the client treats
        // as retryable — NOT 400, which would misreport it as a malformed
        // query and abort the scan.
        val msg = String.valueOf(e.getMessage).getBytes(UTF_8)
        ex.sendResponseHeaders(500, msg.length)
        ex.getResponseBody.write(msg)
    } finally ex.close()
  })

  def start(): Unit = server.start()
  def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"
  def stop(): Unit = {
    server.stop(0)
    server.getExecutor.asInstanceOf[java.util.concurrent.ExecutorService].shutdown()
    allocator.close()
  }
}
