package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** WARC (ISO 28500) record parsing: field extraction, Content-Length
  * payload slicing, the length_ok self-diagnosis, and each documented
  * fidelity bound at its edge.
  */
class WarcOpsSpec extends SparkSpec {
  import spark.implicits._

  private def rec(tpe: String, payload: String,
                  uri: Option[String] = None,
                  lengthOverride: Option[Int] = None): String = {
    val len = lengthOverride.getOrElse(payload.length)
    "WARC/1.0\r\n" +
      s"WARC-Type: $tpe\r\n" +
      uri.map(u => s"WARC-Target-URI: $u\r\n").getOrElse("") +
      "WARC-Date: 2020-01-01T00:00:00Z\r\n" +
      s"Content-Length: $len\r\n" +
      "\r\n" + payload + "\r\n\r\n"
  }

  private def parse(content: String) =
    WarcOps.parseRecords(Seq((1L, content)).toDF("file_id", "content"),
        "file_id", "content")
      .orderBy("rec_no").collect()

  test("a three-record file parses into ordered typed records") {
    val content = rec("warcinfo", "software: graft/1.0") +
      rec("request", "GET /a HTTP/1.1", Some("https://e.com/a")) +
      rec("response", "<html>hi</html>", Some("https://e.com/a"))
    val rows = parse(content)
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Long]("rec_no")).toSeq == Seq(0L, 1L, 2L))
    assert(rows.map(_.getAs[String]("warc_type")).toSeq ==
      Seq("warcinfo", "request", "response"))
    // warcinfo has no Target-URI: NULL, not empty string
    assert(rows(0).isNullAt(rows(0).fieldIndex("target_uri")))
    assert(rows(2).getAs[String]("target_uri") == "https://e.com/a")
    assert(rows(2).getAs[String]("payload") == "<html>hi</html>")
    assert(rows(2).getAs[Long]("content_length") == 15L)
    assert(rows.forall(_.getAs[Boolean]("length_ok")))
  }

  test("a payload containing a bare blank line still slices exactly") {
    // \r\n\r\n INSIDE the payload is fine — Content-Length governs the
    // slice; only the record-boundary sequence (version line) breaks
    val p = "part one\r\n\r\npart two"
    val rows = parse(rec("response", p, Some("https://e.com/b")))
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("payload") == p)
    assert(rows(0).getAs[Boolean]("length_ok"))
  }

  test("truncated payload and wrong Content-Length flag length_ok=false") {
    val truncated = rec("response", "full payload text",
      Some("https://e.com/c")).dropRight(9)
    assert(!parse(truncated)(0).getAs[Boolean]("length_ok"))
    val wrongLen = rec("response", "short", Some("https://e.com/d"),
      lengthOverride = Some(999))
    assert(!parse(wrongLen)(0).getAs[Boolean]("length_ok"))
  }

  test("a payload embedding the record boundary false-splits — and is " +
      "flagged, not silently wrong") {
    val evil = "before WARC/1.0\r\nafter"
    val rows = parse(rec("response", evil, Some("https://e.com/e")))
    // the embedded version line splits the record in two; the real
    // record's payload region is now short of its Content-Length
    assert(rows.length == 2)
    assert(!rows(0).getAs[Boolean]("length_ok"))
  }

  test("header names match case-insensitively; missing Content-Length " +
      "yields NULL payload and length_ok=false") {
    val lower = "WARC/1.0\r\nwarc-type: response\r\n" +
      "content-length: 2\r\n\r\nok\r\n\r\n"
    val r = parse(lower)(0)
    assert(r.getAs[String]("warc_type") == "response")
    assert(r.getAs[String]("payload") == "ok")
    val noLen = "WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n"
    val r2 = parse(noLen)(0)
    assert(r2.isNullAt(r2.fieldIndex("payload")) &&
      !r2.getAs[Boolean]("length_ok"))
    // malformed (non-numeric) length: NULL, flagged — never a cast error
    val badLen = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: abc\r\n\r\nbody\r\n\r\n"
    val r3 = parse(badLen)(0)
    assert(r3.isNullAt(r3.fieldIndex("content_length")) &&
      !r3.getAs[Boolean]("length_ok"))
  }

  test("empty file and non-WARC preamble produce no record rows") {
    assert(parse("").isEmpty)
    val withPreamble = "garbage preamble\n" +
      rec("response", "x.", Some("https://e.com/f"))
    val rows = parse(withPreamble)
    assert(rows.length == 1 && rows(0).getAs[Long]("rec_no") == 0L)
  }

  test("responses() keeps only well-formed response records") {
    val content = rec("warcinfo", "i") +
      rec("response", "good.", Some("https://e.com/g")) +
      rec("request", "GET /g HTTP/1.1", Some("https://e.com/g")) +
      rec("response", "bad", Some("https://e.com/h"),
        lengthOverride = Some(999))
    val rows = WarcOps.responses(
        Seq((1L, content)).toDF("file_id", "content"), "file_id", "content")
      .collect()
    assert(rows.length == 1 &&
      rows(0).getAs[String]("target_uri") == "https://e.com/g")
  }

  test("parsing is a narrow map: no shuffle in the plan") {
    val df = WarcOps.parseRecords(
      Seq((1L, rec("response", "x.", Some("https://e.com/i"))))
        .toDF("file_id", "content"), "file_id", "content")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  private def revRec(tpe: String, uri: String, date: String,
                     digest: String, payload: String,
                     refersTo: Option[String] = None): String =
    "WARC/1.0\r\n" +
      s"WARC-Type: $tpe\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"WARC-Date: $date\r\n" +
      s"WARC-Payload-Digest: $digest\r\n" +
      refersTo.map(u => s"WARC-Refers-To-Target-URI: $u\r\n")
        .getOrElse("") +
      s"Content-Length: ${payload.length}\r\n" +
      "\r\n" + payload + "\r\n\r\n"

  test("resolveRevisits: digest identity beats the Refers-To header, " +
      "earliest response wins, dangling revisits keep NULL originals") {
    val content =
      revRec("response", "https://e.com/b", "2020-01-05T00:00:00Z",
        "md5:d1", "same") +
      revRec("response", "https://e.com/a", "2020-01-02T00:00:00Z",
        "md5:d1", "same") +
      revRec("revisit", "https://e.com/b2", "2020-01-09T00:00:00Z",
        "md5:d1", "", Some("https://e.com/b")) +
      revRec("revisit", "https://e.com/x", "2020-01-10T00:00:00Z",
        "md5:gone", "")
    val out = WarcOps.resolveRevisits(WarcOps.parseRecords(
        Seq((1L, content)).toDF("file_id", "content"),
        "file_id", "content"))
      .orderBy("target_uri")
      .select("target_uri", "refers_to", "original_uri", "original_date")
      .collect()
    assert(out.length == 2)
    // /b2's digest resolves to the EARLIEST capture (/a, Jan 02), even
    // though its Refers-To header names /b
    assert(out(0).getString(0) == "https://e.com/b2")
    assert(out(0).getString(1) == "https://e.com/b")
    assert(out(0).getString(2) == "https://e.com/a")
    assert(out(0).getString(3) == "2020-01-02T00:00:00Z")
    // dangling digest: NULL originals, row kept
    assert(out(1).getString(0) == "https://e.com/x")
    assert(out(1).getString(2) == null && out(1).getString(3) == null)
  }

  test("readWarcGzFiles: REAL .warc.gz files on disk round-trip " +
      "through the binaryFile source to the same records") {
    val dir = java.nio.file.Files.createTempDirectory("warcgz").toFile
    try {
      def gzMember(s: String): Array[Byte] = {
        val bos = new java.io.ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(bos)
        gz.write(s.getBytes("UTF-8")); gz.close(); bos.toByteArray
      }
      // two files, two members each (per-record members, the seekable
      // framing), plus one corrupt file that must surface as NULL
      val recs = Seq(
        ("f1.warc.gz", Seq(
          rec("warcinfo", "software: t"),
          rec("response", "hello one", Some("https://e.com/1")))),
        ("f2.warc.gz", Seq(
          rec("response", "hello two", Some("https://e.com/2")))))
      recs.foreach { case (name, rs) =>
        val out = new java.io.FileOutputStream(new java.io.File(dir, name))
        rs.foreach(r => out.write(gzMember(r)))
        out.close()
      }
      val bad = new java.io.FileOutputStream(
        new java.io.File(dir, "bad.warc.gz"))
      bad.write(Array[Byte](0x1f, 0x8b.toByte, 1, 2, 3)); bad.close()
      val files = WarcOps.readWarcGzFiles(spark, dir.getAbsolutePath)
      assert(files.count() == 3)
      assert(files.filter(org.apache.spark.sql.functions.col("content")
        .isNull).count() == 1) // the corrupt file, not a dead stage
      val parsed = WarcOps.responses(
          files.filter(org.apache.spark.sql.functions.col("content")
            .isNotNull), "file_id", "content")
        .select("target_uri", "payload")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(parsed == Set(
        "https://e.com/1" -> "hello one",
        "https://e.com/2" -> "hello two"))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("streamRecordBodies: lazy boundary split matches the sentinel " +
      "split — preamble skipped, binary payload bytes (0x01/0x02 and " +
      "non-ASCII views) intact, final record runs to EOF") {
    // a latin1-view payload with sentinel-colliding and non-ASCII bytes
    val binPay = new String(
      Array[Byte](0x01, 0x02, 0x03, 'a', 0xE9.toByte, 0xFF.toByte)
        .map(b => (b & 0xFF).toChar))
    val content = "garbage preamble\r\n" +
      rec("warcinfo", "software: graft/1.0") +
      rec("response", binPay, Some("https://e.com/bin")) +
      rec("response", "plain tail", Some("https://e.com/t"))
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(content.toCharArray.map(_.toByte)); g.close()
      bos.toByteArray
    }
    val streamed = WarcOps.streamRecordBodies(gz).toSeq
    assert(streamed.length == 3)
    assert(streamed(1).contains(binPay))
    // the sentinel-split path over the same content yields the same
    // record bodies (both feed the shared field tier)
    val viaSplit = parse(content).map(_.getAs[String]("payload")).toSeq
    assert(viaSplit == Seq("software: graft/1.0", binPay, "plain tail"))
  }

  test("streamRecordBodies: corrupt gzip yields no records and never " +
      "throws; an empty stream likewise") {
    assert(WarcOps.streamRecordBodies(
      Array[Byte](0x1f, 0x8b.toByte, 1, 2, 3)).toSeq.isEmpty)
    assert(WarcOps.streamRecordBodies(Array.emptyByteArray).toSeq.isEmpty)
    // a truncated member: records BEFORE the damage still surface
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(rec("warcinfo", "ok payload").getBytes("ISO-8859-1")); g.close()
    val whole = bos.toByteArray
    val m2 = {
      val b2 = new java.io.ByteArrayOutputStream()
      val g2 = new java.util.zip.GZIPOutputStream(b2)
      g2.write(rec("response", "never finishes").getBytes("ISO-8859-1"))
      g2.close()
      b2.toByteArray
    }
    val damaged = whole ++ m2.take(m2.length / 2)
    val got = WarcOps.streamRecordBodies(damaged).toSeq
    assert(got.nonEmpty && got.head.contains("ok payload"))
  }

  test("readWarcGzRecords: the streaming reader parses REAL files to " +
      "the SAME rows as readWarcGzFiles + parseRecords, without ever " +
      "materializing a whole decompressed file") {
    val dir = java.nio.file.Files.createTempDirectory("warcgzs").toFile
    try {
      def gzMember(s: String): Array[Byte] = {
        val bos = new java.io.ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(bos)
        gz.write(s.toCharArray.map(_.toByte)); gz.close(); bos.toByteArray
      }
      // per-record members incl. a non-ASCII byte-view payload
      val accView = new String("résumé — prêt".getBytes("UTF-8")
        .map(b => (b & 0xFF).toChar))
      val recs = Seq(
        ("s1.warc.gz", Seq(
          rec("warcinfo", "software: t"),
          rec("response", accView, Some("https://e.com/acc")))),
        ("s2.warc.gz", Seq(
          rec("response", "hello two", Some("https://e.com/2")))))
      recs.foreach { case (name, rs) =>
        val out = new java.io.FileOutputStream(new java.io.File(dir, name))
        rs.foreach(r => out.write(gzMember(r)))
        out.close()
      }
      val cols = Seq("file_id", "rec_no", "warc_type", "target_uri",
        "warc_date", "payload_digest", "refers_to", "content_length",
        "payload", "length_ok")
      val streamed = WarcOps.readWarcGzRecords(spark, dir.getAbsolutePath)
      assert(streamed.columns.toSeq == cols) // schema identity
      val a = streamed.orderBy("file_id", "rec_no")
        .collect().map(_.toSeq).toSeq
      val b = WarcOps.parseRecords(
          WarcOps.readWarcGzFiles(spark, dir.getAbsolutePath),
          "file_id", "content")
        .select(cols.map(org.apache.spark.sql.functions.col): _*)
        .orderBy("file_id", "rec_no")
        .collect().map(_.toSeq).toSeq
      assert(a == b && a.length == 3)
      assert(a.forall(_.last == true)) // every record length_ok
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}
