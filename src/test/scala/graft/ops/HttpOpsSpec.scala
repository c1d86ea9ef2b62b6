package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** HTTP envelope split (HttpOps) and the gzip member tier
  * (GzipBytes/GunzipToString via WarcOps): the byte/HTTP-faithful
  * entry of the first mile — round trips, multi-member `.warc.gz`
  * framing, malformed-input NULLs, and the envelope goldens.
  */
class HttpOpsSpec extends SparkSpec {
  import spark.implicits._

  private val msg200 =
    "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
      "Server: g\r\n\r\n<html>hi</html>"

  private def one(msg: String) =
    HttpOps.parseResponses(Seq(msg).toDF("msg"), "msg").head()

  test("envelope split: status, media type, charset, body") {
    val r = one(msg200)
    assert(r.getAs[Int]("status_code") == 200)
    assert(r.getAs[String]("content_type") == "text/html")
    assert(r.getAs[String]("charset") == "utf-8")
    assert(r.getAs[String]("body") == "<html>hi</html>")
    assert(r.getAs[String]("location") == null)
  }

  test("header names are case-insensitive; quoted charset is unquoted " +
      "and lowercased") {
    val r = one("HTTP/1.1 200 OK\r\n" +
      "content-type: application/json; charset=\"UTF-8\"\r\n\r\n{}")
    assert(r.getAs[String]("content_type") == "application/json")
    assert(r.getAs[String]("charset") == "utf-8")
  }

  test("redirect Location surfaces; header-like lines in the BODY do not") {
    val r = one("HTTP/1.1 301 Moved Permanently\r\n" +
      "Location: https://e.com/new\r\n\r\n" +
      "Location: https://evil.example/в-body\r\nContent-Type: fake\r\n")
    assert(r.getAs[Int]("status_code") == 301)
    assert(r.getAs[String]("location") == "https://e.com/new")
    // Content-Type appears only in the body → header is absent → NULL
    assert(r.getAs[String]("content_type") == null)
  }

  test("malformed messages degrade to NULLs/empty, never errors") {
    val r = one("not an http message at all")
    assert(r.getAs[Integer]("status_code") == null)
    assert(r.getAs[String]("content_type") == null)
    // no blank line → no body region
    assert(r.getAs[String]("body") == "")
  }

  // --- gzip member tier ----------------------------------------------------

  private def gunzip(df: org.apache.spark.sql.DataFrame) =
    df.select(WarcOps.gunzipText(col("gz")).as("t"))
      .as[Option[String]].collect().toSeq

  test("gzip → gunzip round-trips latin1-view strings exactly, " +
      "including CRLFs and non-ASCII byte views") {
    // unicode text enters the view world as its UTF-8 bytes viewed as
    // latin1 chars (the Latin1View convention) — the round trip must
    // return the identical view, not a UTF-8 reinterpretation
    val view = new String("curly ’ and — dash €".getBytes("UTF-8"),
      "ISO-8859-1")
    val texts = Seq("plain", "a\r\n\r\nb", view, "café prêt", "")
    val got = texts.toDF("s")
      .select(WarcOps.gunzipText(WarcOps.gzipMember(col("s"))).as("t"))
      .as[String].collect().toSeq
    assert(got == texts)
  }

  test("gzip of a non-view string (chars above 0xFF) is NULL, not a " +
      "silent '?' substitution") {
    val got = Seq("curly ’ quote").toDF("s")
      .select(WarcOps.gzipMember(col("s")).as("g"))
      .collect().map(r => Option(r.get(0))).toSeq
    assert(got == Seq(None))
  }

  test("gunzip output past the decompressed-size cap is NULL (the " +
      "ADVICE r16 allocation guard), not an OOM") {
    // 300 MiB of zeros compresses to ~300 KB; decompression must refuse
    val raw = new Array[Byte](8192)
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    val reps = (graft.functions.GunzipToString.MaxDecompressedBytes.toLong
      + (8 << 20)) / raw.length
    (0L until reps).foreach(_ => gz.write(raw))
    gz.close()
    assert(graft.functions.GunzipToString.compute(bos.toByteArray) == null)
  }

  test("concatenated members decompress as one stream (.warc.gz framing)") {
    val got = Seq(("r1\r\n\r\n", "r2\r\n\r\n"))
      .toDF("a", "b")
      .select(concat(WarcOps.gzipMember(col("a")),
        WarcOps.gzipMember(col("b"))).as("gz"))
    assert(gunzip(got) == Seq(Some("r1\r\n\r\nr2\r\n\r\n")))
  }

  test("malformed gzip decodes to NULL (filterable, not fatal)") {
    val got = Seq(Array[Byte](1, 2, 3), Array.emptyByteArray)
      .toDF("gz")
    assert(gunzip(got) == Seq(None, None))
  }

  test("a .warc.gz file (per-record members) parses back to its records") {
    // two records, each its own gzip member — the seekable framing
    val rec1 = "WARC/1.0\r\nWARC-Type: warcinfo\r\n" +
      "WARC-Date: 2020-01-01T00:00:00Z\r\nContent-Length: 4\r\n\r\ninfo\r\n\r\n"
    val rec2 = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://e.com/1\r\n" +
      "WARC-Date: 2020-01-02T00:00:00Z\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n"
    val files = Seq((0L, rec1, rec2)).toDF("file_id", "a", "b")
      .select(col("file_id"), WarcOps.gunzipText(
        concat(WarcOps.gzipMember(col("a")),
          WarcOps.gzipMember(col("b")))).as("content"))
    val recs = WarcOps.parseRecords(files, "file_id", "content")
      .orderBy("rec_no")
      .select("warc_type", "payload", "length_ok")
      .as[(String, String, Boolean)].collect().toSeq
    assert(recs == Seq(("warcinfo", "info", true), ("response", "hello", true)))
  }

  private def dechunk(s: String): Option[String] = {
    val v = graft.functions.DechunkBody.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    Option(v).map(_.toString)
  }

  test("dechunk: sizes of either hex case, extensions and trailers " +
      "dropped, data reassembled in order") {
    assert(dechunk("5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n")
      == Some("hello world"))
    assert(dechunk("B;ext=1\r\nhello world\r\n0\r\nX-Trailer: t\r\n\r\n")
      == Some("hello world"))
    assert(dechunk("a\r\n0123456789\r\n0\r\n\r\n") == Some("0123456789"))
    assert(dechunk("0\r\n\r\n") == Some(""))
  }

  test("dechunk: chunk sizes count VIEW chars (original bytes) — a " +
      "boundary inside a multi-byte sequence reassembles the exact view") {
    // '€' is 3 UTF-8 bytes = 3 latin1-view chars; split the view across
    // two chunks whose declared sizes are the BYTE counts
    val view = new String("€".getBytes("UTF-8"), "ISO-8859-1")
    assert(view.length == 3)
    val stream = "2\r\n" + view.take(2) + "\r\n1\r\n" + view.drop(2) +
      "\r\n0\r\n\r\n"
    val v = graft.functions.DechunkBody.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(stream))
    // the reassembled view decodes back to the original text
    assert(v.toString == view)
    assert(new String(v.toString.map(_.toByte).toArray, "UTF-8") == "€")
  }

  test("dechunk: malformed framing decodes to NULL, never throws") {
    assert(dechunk("zz\r\nhi\r\n0\r\n\r\n").isEmpty)   // non-hex size
    assert(dechunk("5\r\nhel").isEmpty)                // truncated chunk
    assert(dechunk("5\r\nhelloXX0\r\n\r\n").isEmpty)   // missing CRLF
    assert(dechunk("5\r\nhello\r\n").isEmpty)          // no terminal chunk
    assert(dechunk("FFFFFFFFF\r\nx\r\n0\r\n\r\n").isEmpty) // size overflow
    assert(dechunk("").isEmpty)
  }

  test("parseResponses routes on Transfer-Encoding: chunked bodies " +
      "de-chunk, identity bodies pass through") {
    val chunked = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "Transfer-Encoding: chunked\r\n\r\n" +
      "6\r\n<html>\r\n7\r\nchunked\r\n7\r\n</html>\r\n0\r\n\r\n"
    val r = one(chunked)
    assert(r.getAs[String]("transfer_encoding") == "chunked")
    assert(r.getAs[String]("body") == "<html>chunked</html>")
    // gzip, chunked: the FINAL coding decides (RFC 9112 §6.1)
    val r2 = one("HTTP/1.1 200 OK\r\n" +
      "Transfer-Encoding: gzip, chunked\r\n\r\n2\r\nok\r\n0\r\n\r\n")
    assert(r2.getAs[String]("transfer_encoding") == "chunked")
    assert(r2.getAs[String]("body") == "ok")
    val r3 = one(msg200)
    assert(r3.getAs[String]("transfer_encoding") == null)
    assert(r3.getAs[String]("body") == "<html>hi</html>")
    // malformed chunked framing surfaces as a NULL body row
    val r4 = one("HTTP/1.1 200 OK\r\n" +
      "Transfer-Encoding: chunked\r\n\r\nnot chunked at all")
    assert(r4.getAs[String]("body") == null)
  }

  test("decodeBody: the latin1-view convention recovers UTF-8 text " +
      "from its mojibake view; latin1/absent are identity; unknown " +
      "charset names route to NULL") {
    val text = "café — prêt € ✓"
    // the latin1 VIEW of the text's UTF-8 bytes (what a byte-faithful
    // reader sees before charset routing)
    val view = new String(text.getBytes("UTF-8"), "ISO-8859-1")
    val df = Seq(
      (view, "utf-8"), (view, "UTF8"),
      ("café latin", "iso-8859-1"), ("plain ascii", null),
      ("something", "x-no-such-charset"))
      .toDF("body", "charset")
      .select(HttpOps.decodeBody(col("body"), col("charset")).as("out"))
    val out = df.collect().map(r => Option(r.getString(0)))
    assert(out(0) == Some(text) && out(1) == Some(text))
    assert(out(2) == Some("café latin"))
    assert(out(3) == Some("plain ascii"))
    // r18: known legacy charsets now DECODE (CharsetDecodeSpec); only
    // genuinely unknown names stay the NULL routing miss
    assert(out(4).isEmpty)
  }

  test("decodeBody: windows-1252 translates the 27 defined 0x80-0x9F " +
      "bytes; latin1-range bytes pass through; undefined C1 bytes stay") {
    val text = "smart “quotes” — café’s €9"
    // cp1252 bytes of the text, as the latin1 view a byte reader sees
    val view = new String(text.getBytes("windows-1252"), "ISO-8859-1")
    assert(view != text) // the arm must actually do work
    val got = Seq((view, "windows-1252"), (view, "cp1252"),
        (" undefined", "windows-1252"))
      .toDF("body", "charset")
      .select(HttpOps.decodeBody(col("body"), col("charset")).as("out"))
      .collect().map(_.getString(0)).toSeq
    assert(got(0) == text && got(1) == text)
    assert(got(2) == " undefined") // WHATWG: undefined → C1 self
  }

  test("decodeContentCoding: gzip and deflate bodies decompress from " +
      "their views; identity/absent pass through; unknown codings NULL") {
    val text = "gzipped body — prêt"
    val view = new String(text.getBytes("UTF-8"), "ISO-8859-1")
    val df = Seq(view).toDF("s")
      .select(
        WarcOps.gzipMember(col("s")).as("gz"),
        org.apache.spark.sql.graftbridge.Bridge.column(
          graft.functions.DeflateBytes(
            org.apache.spark.sql.graftbridge.Bridge.expression(col("s"))))
          .as("df"))
      .select(
        decode(col("gz"), "ISO-8859-1").as("gz_view"),
        decode(col("df"), "ISO-8859-1").as("df_view"))
    val r = df.select(
      HttpOps.decodeContentCoding(col("gz_view"), lit("gzip")).as("a"),
      HttpOps.decodeContentCoding(col("gz_view"), lit("x-gzip")).as("b"),
      HttpOps.decodeContentCoding(col("df_view"), lit("deflate")).as("c"),
      HttpOps.decodeContentCoding(lit("as is"),
        lit(null).cast("string")).as("d"),
      HttpOps.decodeContentCoding(lit("as is"), lit("identity")).as("e"),
      HttpOps.decodeContentCoding(col("gz_view"), lit("br")).as("f"),
      HttpOps.decodeContentCoding(lit("not gzip"), lit("gzip")).as("g"))
      .head()
    assert(r.getAs[String]("a") == view && r.getAs[String]("b") == view)
    assert(r.getAs[String]("c") == view)
    assert(r.getAs[String]("d") == "as is" && r.getAs[String]("e") == "as is")
    assert(r.getAs[String]("f") == null) // no brotli codec — honest NULL
    assert(r.getAs[String]("g") == null) // corrupt stream → NULL
  }

  test("InflateToString accepts BOTH zlib-wrapped and raw deflate " +
      "streams (the real-server split RFC 9110 §8.4.1.2 notes)") {
    val body = "raw deflate body".getBytes("ISO-8859-1")
    def compress(nowrap: Boolean): Array[Byte] = {
      val d = new java.util.zip.Deflater(6, nowrap)
      d.setInput(body); d.finish()
      val buf = new Array[Byte](1024)
      val n = d.deflate(buf); d.end()
      buf.take(n)
    }
    for (nowrap <- Seq(false, true)) {
      val got = graft.functions.InflateToString.compute(compress(nowrap))
      assert(got != null && got.toString == "raw deflate body")
    }
    assert(graft.functions.InflateToString.compute(
      "garbage".getBytes("ISO-8859-1")) == null)
    assert(graft.functions.InflateToString.compute(
      Array.emptyByteArray) == null)
  }

  test("parseResponses: a gzip Content-Encoding body decodes through " +
      "the full envelope (status/type/charset routing intact)") {
    val html = "<html>prêt — body</html>"
    val view = new String(html.getBytes("UTF-8"), "ISO-8859-1")
    val msg = Seq(view).toDF("s")
      .select(decode(WarcOps.gzipMember(col("s")), "ISO-8859-1").as("gzv"))
      .select(concat(
        lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
          "Content-Encoding: gzip\r\n\r\n"), col("gzv")).as("msg"))
    val r = HttpOps.parseResponses(msg, "msg").head()
    assert(r.getAs[String]("content_encoding") == "gzip")
    assert(r.getAs[String]("body") == view)
    // and the charset arm then recovers the text
    val txt = HttpOps.parseResponses(msg, "msg")
      .select(HttpOps.decodeBody(col("body"), col("charset")).as("t"))
      .head().getString(0)
    assert(txt == html)
  }
}
