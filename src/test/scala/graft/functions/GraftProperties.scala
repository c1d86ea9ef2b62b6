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
}
