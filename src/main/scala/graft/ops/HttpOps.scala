package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** HTTP/1.1 response-envelope splitting: the stage between WARC record
  * payloads and raw HTML in a REAL crawl — a Common Crawl `response`
  * record's payload is an HTTP message (status line, headers, blank
  * line, body), not bare HTML, so extraction must strip the envelope
  * and route on status code / Content-Type before [[HtmlOps]] ever
  * sees the body ([[graft.functions.GunzipToString]] is the sibling
  * byte-tier entry for the `.warc.gz` member framing).
  *
  * No reference analog (engine capability — the reference at
  * /root/reference starts at decoded rows).
  *
  * Same tier and guarantees as [[WarcOps]]: pure codegen'd column
  * expressions (regexp_extract over the head region — zero UDFs, no
  * shuffle), case-insensitive header names, absent header → NULL.
  * Fidelity bounds (documented, deliberate): the envelope is split at
  * the FIRST `\r\n\r\n` (multi-line folded headers — deprecated by
  * RFC 7230 — are not unfolded); lengths are character counts (the
  * WarcOps string-tier bound). `Transfer-Encoding: chunked` bodies ARE
  * de-chunked (r16, [[graft.functions.DechunkBody]] — live fetches
  * deliver chunked framing even though Common Crawl stores payloads
  * de-chunked); a chunked body with malformed framing surfaces as a
  * NULL body row.
  */
object HttpOps {

  /** The header block: everything before the first blank line
    * (status line included). Empty when the message has no blank
    * line.
    */
  def headRegion(msg: Column): Column =
    regexp_extract(msg, "(?s)^(.*?)\r\n\r\n", 1)

  /** The body: everything after the first blank line ('' when the
    * message has no blank line — a header-only or malformed message).
    */
  def body(msg: Column): Column =
    regexp_extract(msg, "(?s)^.*?\r\n\r\n(.*)$", 1)

  /** The 3-digit status code of the status line, NULL when the
    * message does not start with an HTTP/x.y status line.
    */
  def statusCode(msg: Column): Column =
    nullif(regexp_extract(msg, "^HTTP/[0-9.]+ ([0-9]{3})", 1), lit(""))
      .cast(IntegerType)

  /** One named header from the head region (case-insensitive per RFC
    * 9110 §5.1; value runs to end of line, trimmed by the `\s*`).
    * Absent → NULL.
    */
  def header(msg: Column, name: String): Column =
    nullif(regexp_extract(headRegion(msg),
      "(?im)^" + name + ":\\s*([^\r\n]*)", 1), lit(""))

  /** The media type of the Content-Type header (before any `;`
    * parameter), lowercased and trimmed — the routing key (text/html
    * vs everything else). NULL when the header is absent.
    */
  def contentType(msg: Column): Column =
    nullif(lower(trim(regexp_extract(header(msg, "Content-Type"),
      "^([^;]*)", 1))), lit(""))

  /** The `charset=` parameter of Content-Type (lowercased, optional
    * quotes tolerated), NULL when absent — the decode hint a
    * byte-tier ingest keys transcoding on.
    */
  def charset(msg: Column): Column =
    nullif(lower(regexp_extract(header(msg, "Content-Type"),
      "(?i)charset=\"?([A-Za-z0-9._-]+)", 1)), lit(""))

  /** The final transfer coding of the Transfer-Encoding header
    * (lowercased, last `,`-separated token per RFC 9112 §6.1 — chunked
    * MUST be final when present), NULL when absent.
    */
  def transferEncoding(msg: Column): Column =
    nullif(lower(trim(regexp_extract(header(msg, "Transfer-Encoding"),
      "([^,]*)$", 1))), lit(""))

  /** De-chunk `bodyCol` when the transfer coding says chunked, pass it
    * through otherwise ([[graft.functions.DechunkBody]]; malformed
    * chunked framing → NULL body).
    */
  def dechunkIfChunked(bodyCol: Column, te: Column): Column =
    when(te === "chunked",
      org.apache.spark.sql.graftbridge.Bridge.column(
        graft.functions.DechunkBody(
          org.apache.spark.sql.graftbridge.Bridge.expression(bodyCol))))
      .otherwise(bodyCol)

  /** Decode a body carried in the LATIN1-VIEW convention to real text.
    *
    * The byte-faithful ingest trick (x147): decode raw fetch/record
    * bytes as ISO-8859-1 FIRST — a 1:1 byte↔char map, so every
    * delimiter split, Content-Length slice, and header regex in
    * [[WarcOps]]/[[HttpOps]] operates on exact BYTE offsets while
    * staying in string expressions — then, once the envelope is off,
    * re-encode the body's chars back to its original bytes and decode
    * with the charset the Content-Type header declared:
    *
    *  - `iso-8859-1`/`latin1`/`us-ascii`/`ascii`/ABSENT → the view IS
    *    the text (identity — latin1 chars are their own codepoints);
    *  - `utf-8` → `decode(encode(view, ISO-8859-1), UTF-8)` — the
    *    original bytes reinterpreted (malformed sequences become
    *    U+FFFD, Spark's lenient decode — a broken page yields
    *    replacement chars, not a dead stage);
    *  - anything else (shift_jis, windows-1252, …) → NULL: an honest
    *    routing miss to audit, never silent mojibake. (Spark's codegen
    *    `decode` ships the ISO/UTF families only; exotic charsets are
    *    the documented boundary of the built-in tier.)
    */
  def decodeBody(body: Column, charsetCol: Column): Column = {
    val cs = lower(coalesce(charsetCol, lit("iso-8859-1")))
    when(cs.isin("iso-8859-1", "latin1", "us-ascii", "ascii"), body)
      .when(cs.isin("utf-8", "utf8"),
        decode(encode(body, "ISO-8859-1"), "UTF-8"))
      .otherwise(lit(null).cast("string"))
  }

  /** Split a frame's `msgCol` HTTP response messages into the columns
    * downstream extraction routes on: `status_code`, `content_type`,
    * `charset`, `location` (redirect target), `transfer_encoding`, and
    * `body` (de-chunked when the transfer coding is chunked). One
    * narrow projection — composes with [[WarcOps.responses]] payloads.
    */
  def parseResponses(df: DataFrame, msgCol: String): DataFrame =
    df.withColumn("status_code", statusCode(col(msgCol)))
      .withColumn("content_type", contentType(col(msgCol)))
      .withColumn("charset", charset(col(msgCol)))
      .withColumn("location", header(col(msgCol), "Location"))
      .withColumn("transfer_encoding", transferEncoding(col(msgCol)))
      .withColumn("body",
        dechunkIfChunked(body(col(msgCol)), col("transfer_encoding")))
}
