package graft.functions

import java.math.BigInteger

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ScalaCheck properties for the custom kernels (SURVEY §5.3): round-trips,
  * reference-implementation equivalence, and null/edge contracts — all at
  * expression level (no Spark session), so they run in milliseconds.
  */
object GraftProperties extends Properties("graft") {

  private val bytesGen: Gen[Array[Byte]] =
    Gen.chooseNum(0, 80).flatMap(n => Gen.containerOfN[Array, Byte](n, Gen.choose[Byte](-128, 127)))

  property("base58 round-trip") = forAll(bytesGen) { b =>
    Base58.decode(Base58.encode(b)).sameElements(b)
  }

  property("base58 leading zeros become leading '1's") = forAll(
    Gen.chooseNum(1, 8), bytesGen) { (z, tail) =>
    val b = Array.fill[Byte](z)(0) ++ tail
    Base58.encode(b).startsWith("1" * z)
  }

  property("u256 string round-trip for arbitrary 256-bit values") = forAll(
    Gen.containerOfN[Array, Byte](32, Gen.choose[Byte](-128, 127))) { raw =>
    val v = new BigInteger(1, raw)
    val enc = U256FromString(Literal(UTF8String.fromString(v.toString), StringType))
      .eval(null).asInstanceOf[Array[Byte]]
    val dec = U256ToString(Literal(enc, BinaryType)).eval(null).toString
    enc.length == 32 && dec == v.toString
  }

  property("keccak256 matches on incremental lengths (no rate-boundary bugs)") =
    forAll(Gen.chooseNum(130, 140)) { n =>
      // lengths straddling the 136-byte rate boundary hash without error
      Keccak.hash256(Array.fill[Byte](n)(0x61)).length == 32
    }

  property("FloatVecDot equals the reference left fold") = forAll(
    Gen.chooseNum(0, 65).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-100f, 100f)).flatMap(a =>
        Gen.listOfN(n, Gen.chooseNum(-100f, 100f)).map(b => (a, b))))) {
    case (a, b) =>
      val expect = a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)
      val got = FloatVecDot(
        Literal(new GenericArrayData(a.toArray[Any]), ArrayType(FloatType)),
        Literal(new GenericArrayData(b.toArray[Any]), ArrayType(FloatType)))
        .eval(null).asInstanceOf[Double]
      got == expect // bit-exact, not approximate
  }

  private val wordGen = Gen.nonEmptyListOf(Gen.oneOf("a", "bb", "ccc", "dd", "e"))
    .map(_.mkString(" "))

  property("WordNGrams equals naive distinct sliding window") = forAll(
    wordGen, Gen.chooseNum(1, 4)) { (text, n) =>
    val got = WordNGrams(Literal(UTF8String.fromString(text), StringType), n)
      .eval(null).asInstanceOf[ArrayData].toObjectArray(StringType).map(_.toString).toSeq
    val words = text.split(" ", -1)
    val expect = words.sliding(n).filter(_.length == n).map(_.mkString(" "))
      .toSeq.distinct
    got == expect
  }

  property("CharNGrams equals naive distinct sliding window") = forAll(
    Gen.alphaLowerStr.map(_.take(40)), Gen.chooseNum(1, 5)) { (s, n) =>
    val got = CharNGrams(Literal(UTF8String.fromString(s), StringType), n)
      .eval(null).asInstanceOf[ArrayData].toObjectArray(StringType).map(_.toString).toSeq
    val expect = s.sliding(n).filter(_.length == n).toSeq.distinct
    got == expect
  }

  property("Md5BottomK equals sorted-digest reference") = forAll(
    Gen.nonEmptyListOf(Gen.alphaNumStr.map(_.take(12))), Gen.chooseNum(1, 5)) {
    (strs, k) =>
      val got = Md5BottomK(
        Literal(new GenericArrayData(strs.map(UTF8String.fromString).toArray[Any]),
          ArrayType(StringType)), k).eval(null).toString
      val md = java.security.MessageDigest.getInstance("MD5")
      val expect = strs.map(s => md.digest(s.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString)
        .sorted.take(k).mkString
      got == expect
  }

  property("SimhashChunkPairs over all buckets equals the naive pair scan") = forAll(
    Gen.chooseNum(0, 6).flatMap(h =>
      Gen.chooseNum(h + 1, math.min(h + 4, 10)).flatMap(chunks =>
        Gen.chooseNum(2, 12).flatMap(n =>
          Gen.listOfN(n, Gen.chooseNum(0L, (1L << 60) - 1))
            .map(cs => (h, chunks, cs))))))
  { case (maxHamming, chunks, codes0) =>
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val codes = codes0.distinct.zipWithIndex.map { case (c, i) => (i.toLong, c) }
    // emulate the operator: group docs by every (combo, packed value) key,
    // run the kernel per bucket, union the emissions — covers BOTH the
    // default agree-on-1 blocking and Manku combo blocking (chunks > h+1)
    val combos = SimhashChunkPairs.combos(chunks, maxHamming)
    def comboVal(code: Long, ks: Array[Int]): Long =
      ks.foldLeft(0L) { (acc, k) =>
        val lo = k * 60 / chunks
        val width = (k + 1) * 60 / chunks - lo
        (acc << width) | ((code >> lo) & ((1L << width) - 1))
      }
    val emitted = (for {
      (ks, q) <- combos.zipWithIndex.toSeq
      (_, bucket) <- codes.groupBy { case (_, c) => comboVal(c, ks) }.toSeq
      if bucket.size > 1
      arr = new GenericArrayData(bucket.sortBy(_._1).map { case (id, c) =>
        new GenericInternalRow(Array[Any](id, c)): Any }.toArray)
      pairs = SimhashChunkPairs.compute(arr, q, chunks, maxHamming)
      i <- 0 until pairs.numElements()
    } yield {
      val r = pairs.getStruct(i, 3)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }).toSeq
    val naive = for {
      (i, ci) <- codes; (j, cj) <- codes if i < j
      ham = java.lang.Long.bitCount(ci ^ cj) if ham <= maxHamming
    } yield (i, j, ham.toLong)
    emitted.sorted == naive.sorted // exactly once each, same distances
  }

  property("Borsh u64/string/fixed-bytes round-trip") = forAll(
    Gen.chooseNum(0L, Long.MaxValue), Gen.alphaNumStr.map(_.take(20))) { (v, s) =>
    val sBytes = s.getBytes("UTF-8")
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + sBytes.length + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(v).putInt(sBytes.length).put(sBytes).putInt(0xdeadbeef)
    val sig = Borsh.InstructionSig(Array.emptyByteArray,
      Borsh.parseFields("amount:u64, memo:string, tag:[u8;4]"))
    val out = Borsh.decode(sig, bb.array())
    out(0).asInstanceOf[org.apache.spark.sql.types.Decimal].toLong == v &&
      out(1).toString == s &&
      out(2).asInstanceOf[Array[Byte]].length == 4
  }

  // chunked transfer framing: arbitrary bytes, arbitrary cut points —
  // encode per RFC 9112 §7.1 (mixed-case hex, an extension and a
  // trailer sprinkled in), decode must return the exact original bytes
  private val chunkedCase: Gen[(Array[Byte], List[Int], Boolean)] = for {
    n <- Gen.chooseNum(0, 200)
    body <- Gen.containerOfN[Array, Byte](n, Gen.choose[Byte](-128, 127))
    cuts <- Gen.listOf(Gen.chooseNum(0, math.max(0, n)))
    ext <- Gen.oneOf(true, false)
  } yield (body, cuts.distinct.sorted, ext)

  property("DechunkBody round-trips arbitrary bytes (as their latin1 " +
      "views) under arbitrary chunkings") = forAll(chunkedCase) {
    case (body, cuts, ext) =>
      val bounds = (0 +: cuts :+ body.length).distinct.sorted
      val chunks = bounds.zip(bounds.tail)
        .map { case (a, b) => body.slice(a, b) }
        .filter(_.nonEmpty)
      // the view convention: byte-carrying strings hold byte i as char i,
      // and chunk sizes (byte counts) therefore equal view-char counts
      val sb = new StringBuilder
      chunks.zipWithIndex.foreach { case (c, i) =>
        val hex = if (i % 2 == 0) c.length.toHexString
                  else c.length.toHexString.toUpperCase
        val extS = if (ext && i == 0) ";name=v" else ""
        sb.append(hex).append(extS).append("\r\n")
        sb.append(new String(c, "ISO-8859-1")).append("\r\n")
      }
      sb.append(if (ext) "0\r\nX-T: 1\r\n\r\n" else "0\r\n\r\n")
      val decoded = DechunkBody.compute(UTF8String.fromString(sb.toString))
      decoded != null &&
        decoded.toString.map(_.toByte).toArray.sameElements(body)
  }

  property("gzip and deflate kernels round-trip ARBITRARY bytes " +
      "through their latin1 views (GzipBytes→GunzipToString, " +
      "DeflateBytes→InflateToString)") = forAll(
    Gen.chooseNum(0, 300).flatMap(n =>
      Gen.containerOfN[Array, Byte](n, Gen.choose[Byte](-128, 127)))) { b =>
    val view = UTF8String.fromString(new String(b, "ISO-8859-1"))
    val gz = GzipBytes.compute(view)
    val df = DeflateBytes.compute(view)
    val backGz = GunzipToString.compute(gz)
    val backDf = InflateToString.compute(df)
    backGz != null && backDf != null &&
      backGz.toString.map(_.toByte).toArray.sameElements(b) &&
      backDf.toString.map(_.toByte).toArray.sameElements(b)
  }

  property("gunzip/inflate never throw on arbitrary garbage bytes " +
      "(null, not an exception)") = forAll(
    Gen.chooseNum(0, 120).flatMap(n =>
      Gen.containerOfN[Array, Byte](n, Gen.choose[Byte](-128, 127)))) { b =>
    GunzipToString.compute(b)   // must not throw
    InflateToString.compute(b)  // must not throw (zlib then raw retry)
    true
  }

  property("view encoders refuse non-view strings: any char above " +
      "0xFF makes GzipBytes/DeflateBytes NULL") = forAll(
    Gen.chooseNum(0x100, 0xD7FF)) { cp => // below the surrogate range
    val s = UTF8String.fromString("ab" + cp.toChar + "cd")
    GzipBytes.compute(s) == null && DeflateBytes.compute(s) == null
  }

  property("DechunkBody never throws on arbitrary garbage (null, not " +
      "an exception)") = forAll(
    Gen.chooseNum(0, 120).flatMap(n =>
      Gen.containerOfN[Array, Byte](n, Gen.choose[Byte](-128, 127)))) { b =>
    // both entry shapes: a latin1 view of the bytes, and the raw bytes
    // force-read as a UTF8String (invalid sequences included)
    DechunkBody.compute(UTF8String.fromString(new String(b, "ISO-8859-1")))
    DechunkBody.compute(UTF8String.fromBytes(b)) // must not throw
    true
  }

  private val cjkLabels =
    Seq("shift_jis", "euc-jp", "gbk", "gb18030", "big5", "euc-kr")

  property("DecodeCharset never throws on arbitrary garbage bytes " +
      "under every CJK label (null or a decoded string, no exception)") =
    forAll(
      Gen.chooseNum(0, 120).flatMap(n =>
        Gen.containerOfN[Array, Byte](n, Gen.choose[Byte](-128, 127))),
      Gen.oneOf(cjkLabels)) { (b, label) =>
      val view = UTF8String.fromString(new String(b, "ISO-8859-1"))
      DecodeCharset.compute(view, UTF8String.fromString(label)) // no throw
      true
    }

  property("DecodeCharset inverts the JDK encoder: any encodable text " +
      "round-trips bit-exactly through each CJK charset's bytes") = {
    // a pool of chars every one of the six charsets can encode is tiny;
    // instead, per label, draw text from chars ITS encoder covers
    val pools: Map[String, String] = Map(
      "shift_jis" -> "日本語のテキストです。カナ混じりabc 123",
      "euc-jp" -> "日本語のテキストです。abc",
      "gbk" -> "中文网页内容测试abc 123",
      "gb18030" -> "中文㐀内容abc",
      "big5" -> "中文網頁內容abc",
      "euc-kr" -> "한국어 웹 페이지 abc")
    forAll(Gen.oneOf(cjkLabels), Gen.chooseNum(1, 20), Gen.long) {
      (label, n, seed) =>
        val pool = pools(label)
        val rnd = new scala.util.Random(seed)
        val text = Seq.fill(n)(pool.charAt(rnd.nextInt(pool.length))).mkString
        val cs = java.nio.charset.Charset.forName(
          DecodeCharset.WhatwgLabels(label))
        val view = new String(text.getBytes(cs), "ISO-8859-1")
        val got = DecodeCharset.compute(
          UTF8String.fromString(view), UTF8String.fromString(label))
        got != null && got.toString == text
    }
  }
}
