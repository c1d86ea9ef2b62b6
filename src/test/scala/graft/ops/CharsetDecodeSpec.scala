package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.functions.DecodeCharset

/** The legacy multi-byte charset tier (VERDICT r17 #1): real byte
  * goldens per charset — planted sequences from the PUBLIC code tables
  * (JIS X 0208 / GB 2312 / Big5 / KS X 1001 textbook values), decoded
  * through [[DecodeCharset]] against hand-written targets — plus the
  * WHATWG-superset label semantics, the never-throw NULL contracts,
  * and the full WARC → HTTP → decode → C4 chain. No DuckDB oracle is
  * possible for these charsets (the declared x33 spec-gate class), so
  * THIS suite is the correctness gate.
  */
class CharsetDecodeSpec extends SparkSpec {
  import spark.implicits._

  /** hex byte string → its latin1-view string (char i = byte i). */
  private def viewOf(hex: String): String =
    hex.split("\\s+").filter(_.nonEmpty)
      .map(h => Integer.parseInt(h, 16).toChar).mkString

  private def dec(viewHex: String, cs: String): String = {
    val r = DecodeCharset.compute(
      UTF8String.fromString(viewOf(viewHex)), UTF8String.fromString(cs))
    if (r == null) null else r.toString
  }

  test("hand byte goldens: the five legacy CJK charsets decode their " +
      "textbook sequences (public code-table values, not JDK echoes)") {
    // Shift_JIS (JIS X 0208 via the MS mapping): 日=93FA 本=967B 語=8CEA
    assert(dec("93 FA 96 7B 8C EA", "shift_jis") == "日本語")
    // EUC-JP: the same three kuten codes in EUC form (0xA0+row/cell):
    // 日=C6FC 本=CBDC 語=B8EC
    assert(dec("C6 FC CB DC B8 EC", "euc-jp") == "日本語")
    // GB 2312 (EUC-CN bytes, decoded via the WHATWG gbk fold):
    // 中=D6D0 文=CEC4 — and the same bytes are valid GBK and GB18030
    for (label <- Seq("gb2312", "gbk", "gb18030"))
      assert(dec("D6 D0 CE C4", label) == "中文", label)
    // Big5: 中=A4A4 文=A4E5
    assert(dec("A4 A4 A4 E5", "big5") == "中文")
    // EUC-KR (KS X 1001 wansung): 한=C7D1 국=B1B9
    assert(dec("C7 D1 B1 B9", "euc-kr") == "한국")
    // GB18030's linear 4-byte plane: U+3400 = 81 39 EE 39
    assert(dec("81 39 EE 39", "gb18030") == "㐀")
    // ASCII bytes are valid in all five (all are ASCII supersets)
    for (label <- Seq("shift_jis", "euc-jp", "gbk", "big5", "euc-kr"))
      assert(dec("68 69 20 31 32", label) == "hi 12", label)
  }

  test("WHATWG label semantics: shift_jis decodes the windows-31j " +
      "extension rows and euc-kr the UHC plane — the strict IANA " +
      "decoders REPORT on exactly these bytes") {
    // NEC row 13: ① (U+2460) = 87 40 — not in strict JIS X 0208
    assert(dec("87 40", "shift_jis") == "①")
    // UHC extension: 똠 (U+B620) = 8C 63 — not in KS X 1001
    assert(dec("8C 63", "euc-kr") == "똠")
    // the strict JDK charsets of the same IANA name reject both —
    // the reason the label map exists
    for ((name, hex) <- Seq("Shift_JIS" -> "87 40", "EUC-KR" -> "8C 63")) {
      val strict = java.nio.charset.Charset.forName(name).newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      val bytes = viewOf(hex).map(_.toByte).toArray
      intercept[java.nio.charset.CharacterCodingException] {
        strict.decode(java.nio.ByteBuffer.wrap(bytes))
      }
    }
    // big5 label includes the HKSCS plane (WHATWG big5): find a char
    // the HKSCS encoder covers but strict Big5 does not, and assert it
    // round-trips through the big5 LABEL
    val big5 = java.nio.charset.Charset.forName("Big5").newEncoder()
    val hk = java.nio.charset.Charset.forName("Big5-HKSCS").newEncoder()
    val probe = (0x3400 to 0x9FFF).iterator.map(_.toChar)
      .find(c => hk.canEncode(c) && !big5.canEncode(c))
    assert(probe.nonEmpty, "JDK HKSCS table missing its extension plane?")
    val hkscs = probe.get.toString
    val b = hkscs.getBytes(java.nio.charset.Charset.forName("Big5-HKSCS"))
    val viewHex = b.map(x => f"${x & 0xFF}%02X").mkString(" ")
    assert(dec(viewHex, "big5") == hkscs)
  }

  test("never-throw contracts: truncated/malformed sequences, unknown " +
      "and illegal charset names, and non-byte-view input all NULL") {
    // truncated lead byte at end-of-input
    assert(dec("93", "shift_jis") == null)
    assert(dec("C7", "euc-kr") == null)
    // a lead byte followed by an invalid trail byte
    assert(dec("93 0A", "shift_jis") == null)
    assert(dec("A4 0A", "big5") == null)
    // bytes that contradict the declared charset (mislabeled page):
    // 0xFF is no lead byte in EUC-JP
    assert(dec("FF FF", "euc-jp") == null)
    // unknown and syntactically illegal charset names
    assert(dec("68 69", "x-no-such-charset") == null)
    assert(dec("68 69", "not a charset!!") == null)
    // a char above 0xFF is not a byte view
    val r = DecodeCharset.compute(
      UTF8String.fromString("中"), UTF8String.fromString("gbk"))
    assert(r == null)
  }

  test("single-byte legacy families decode for free through the JDK " +
      "registry fallback (koi8-r, windows-1251, tis-620)") {
    for (cs <- Seq("koi8-r", "windows-1251", "tis-620")) {
      val text = cs match {
        case "tis-620" => "ไทย" // ไทย
        case _         => "да"       // да
      }
      val bytes = text.getBytes(java.nio.charset.Charset.forName(cs))
      val viewHex = bytes.map(x => f"${x & 0xFF}%02X").mkString(" ")
      assert(dec(viewHex, cs) == text, cs)
    }
  }

  test("decodeBody routes legacy charsets through the kernel; the " +
      "fast-path arms and the honest-NULL miss are unchanged") {
    val sjisView = viewOf("93 FA 96 7B 8C EA")
    val rows = Seq(
      (sjisView, "shift_jis"),
      (viewOf("C7 D1 B1 B9"), "euc-kr"),
      ("plain ascii", null),
      (sjisView, "x-mystery-charset"))
      .toDF("body", "charset")
      .select(HttpOps.decodeBody(col("body"), col("charset")).as("out"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(rows(0) == Some("日本語"))
    assert(rows(1) == Some("한국"))
    assert(rows(2) == Some("plain ascii"))
    assert(rows(3).isEmpty) // unknown name stays the auditable miss
  }

  test("full chain: a shift_jis page rides WARC → HTTP → charset " +
      "precedence → decode → C4 text against a hand target") {
    // 日本語のテキストです。 in Shift_JIS bytes (textbook values:
    // の=82CC, テ=8365, キ=834C, ス=8358, ト=8367, で=82C5, す=82B7,
    // 。=8142)
    val bodyJa = "93 FA 96 7B 8C EA 82 CC 83 65 83 4C 83 58 83 67 " +
      "82 C5 82 B7 81 42"
    val target = "日本語のテキスト" +
      "です。"
    val htmlView =
      "<html><head><meta charset=\"shift_jis\"></head><body><p>" +
        viewOf(bodyJa) + "</p></body></html>"
    // header-declared arm AND meta-declared arm (no charset in the
    // header; the page self-declares) — both must land on the target
    val msgs = Seq(
      ("hdr", "HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
        "charset=shift_jis\r\n\r\n" + htmlView),
      ("meta", "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
        htmlView))
    val warc = msgs.map { case (id, msg) =>
      (id, "WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Target-URI: https://jp.example/a\r\n" +
        "WARC-Date: 2020-01-01T00:00:00Z\r\n" +
        s"Content-Length: ${msg.length}\r\n\r\n" + msg + "\r\n\r\n")
    }
    val recs = WarcOps.parseRecords(
      warc.toDF("file_id", "content"), "file_id", "content")
    val resp = HttpOps.parseResponses(
      recs.filter(col("warc_type") === "response"), "payload")
    val decoded = resp.select(col("file_id"),
      HttpOps.stripBom(HttpOps.decodeBody(col("body"),
        coalesce(HttpOps.bomCharset(col("body")), col("charset"),
          HtmlOps.metaCharset(col("body"))))).as("text"))
    val got = decoded.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val want = s"<html><head><meta charset=\"shift_jis\"></head>" +
      s"<body><p>$target</p></body></html>"
    assert(got("hdr") == want)
    assert(got("meta") == want)
    // and the C4 text tier extracts the sentence itself
    val text = decoded.select(col("file_id"),
      HtmlOps.htmlToText(col("text")).as("t")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(text("hdr").contains(target))
    assert(text("meta").contains(target))
  }

  test("decode_charset is SQL-registered through the extension point") {
    graft.functions.GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT decode_charset(decode(unhex('93FA967B8CEA'), 'ISO-8859-1'), " +
        "'shift_jis') AS t").head().getString(0)
    assert(got == "日本語")
  }
}
