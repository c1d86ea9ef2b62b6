package graft.sources

import org.apache.arrow.memory.RootAllocator
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}

import graft.functions.Hex
import graft.sources.WireProtocol.WireQuery

/** Round-trip properties for the wire protocol: query JSON and Arrow IPC
  * pages must survive serialize→parse bit-exactly — including the empty
  * request list (match-NOTHING, distinct from the match-all `[{}]`), null
  * values in nullable pages, empty pages, and strict hex rejection.
  */
object WireProtocolProperties extends Properties("wire") {

  private val bytesGen: Gen[Seq[Byte]] =
    Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose[Byte](-128, 127)).map(_.toSeq))

  private val reqGen: Gen[ChainReq] = for {
    nCols <- Gen.chooseNum(0, 3)
    cols  <- Gen.pick(nCols, Seq("address", "topic0", "program_id", "discriminator"))
    sets  <- Gen.sequence[Seq[Set[Seq[Byte]]], Set[Seq[Byte]]](
      cols.map(_ => Gen.chooseNum(0, 3).flatMap(k =>
        Gen.listOfN(k, bytesGen).map(_.toSet))))
  } yield ChainReq(cols.zip(sets).toMap)

  private val queryGen: Gen[WireQuery] = for {
    table <- Gen.oneOf("logs", "instructions")
    from  <- Gen.chooseNum(0L, 1000000000L)
    span  <- Gen.chooseNum(0L, 1000000L)
    nReq  <- Gen.chooseNum(0, 3) // 0 = the match-nothing empty list
    reqs  <- Gen.listOfN(nReq, reqGen)
    nCols <- Gen.chooseNum(1, 5)
    cols  <- Gen.pick(nCols,
      Seq("block_number", "log_index", "address", "topic0", "topic1", "data"))
  } yield WireQuery(table, from, from + span, reqs, cols.toSeq)

  property("query JSON round-trip (incl. empty request list)") =
    forAll(queryGen) { q => WireProtocol.parseQuery(q.toJson) == q }

  property("empty request list stays empty; [{}] stays match-all") = Prop {
    val none = WireQuery("logs", 0, 10, Seq.empty, Seq("block_number"))
    val all = WireQuery("logs", 0, 10, Seq(ChainReq(Map.empty)), Seq("block_number"))
    none.toJson.contains("\"requests\":[]") &&
      WireProtocol.parseQuery(none.toJson).requests.isEmpty &&
      all.toJson.contains("\"requests\":[{}]") &&
      WireProtocol.parseQuery(all.toJson).requests == Seq(ChainReq(Map.empty))
  }

  // ---- Arrow page round-trip ----

  private val schemaGen: Gen[StructType] = for {
    n     <- Gen.chooseNum(1, 4)
    types <- Gen.listOfN(n, Gen.oneOf(LongType: Any, BinaryType: Any))
  } yield StructType(types.zipWithIndex.map { case (t, i) =>
    StructField(s"c$i", t.asInstanceOf[org.apache.spark.sql.types.DataType])
  })

  private def cellGen(t: Any): Gen[Any] = t match {
    case LongType => Gen.frequency(
      9 -> Gen.chooseNum(Long.MinValue, Long.MaxValue).map(l => l: Any),
      1 -> Gen.const(null: Any))
    case BinaryType => Gen.frequency(
      9 -> bytesGen.map(b => b.toArray: Any),
      1 -> Gen.const(null: Any))
  }

  private val pageGen: Gen[(StructType, Seq[Array[Any]])] = for {
    schema <- schemaGen
    nRows  <- Gen.chooseNum(0, 30) // 0 = the empty page
    rows   <- Gen.listOfN(nRows, Gen.sequence[Seq[Any], Any](
      schema.fields.toSeq.map(f => cellGen(f.dataType))).map(_.toArray))
  } yield (schema, rows)

  property("Arrow page round-trip with nulls and empty pages") =
    forAll(pageGen) { case (schema, rows) =>
      val alloc = new RootAllocator()
      try {
        // batchRows=7 forces multi-batch pages at gen sizes
        val body = WireProtocol.encodePage(schema, rows, alloc, batchRows = 7)
        val got = WireProtocol.decodePage(schema, body, alloc)
        got.size == rows.size && rows.zip(got).forall { case (exp, r) =>
          schema.fields.indices.forall { i =>
            exp(i) match {
              case null            => r.isNullAt(i)
              case l: Long         => !r.isNullAt(i) && r.getLong(i) == l
              case b: Array[Byte]  => !r.isNullAt(i) && r.getBinary(i).sameElements(b)
            }
          }
        }
      } finally alloc.close()
    }

  // ---- strict hex ----

  property("hex round-trip") = forAll(bytesGen) { b =>
    Hex.decode(Hex.encode(b)).toSeq == b
  }

  property("odd-length hex is rejected, not misparsed") = forAll(
    Gen.chooseNum(0, 10).flatMap(n =>
      Gen.listOfN(2 * n + 1, Gen.oneOf("0123456789abcdef".toSeq)).map(_.mkString))) { s =>
    Prop.throws(classOf[IllegalArgumentException])(Hex.decode(s))
  }

  property("non-hex characters are rejected") = Prop {
    Seq("zz", "0xg1", "12 4", "--").forall { s =>
      try { Hex.decode(s); false }
      catch { case _: IllegalArgumentException => true }
    }
  }
}
