package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit specs for the round-10 surface: the `nearDupPairs` default flip
  * (LSH-verify is the path a caller gets without asking; the exact
  * enumeration is an opt-in) and the `NearestCentroid` codegen'd cell
  * assignment that replaced the n×k crossJoin in SemDeDup. Tiny fixtures;
  * the oracle-gated x34/x64/x42/x65 cover the sf-scale cross-engine
  * contract.
  */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus: org.apache.spark.sql.DataFrame = {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    Seq(
      (0L, base),
      (1L, base + " today"),                         // near-dup of 0
      (2L, "completely different words in this one"),
      (3L, base.replace("quick", "slow")),           // near-dup of 0
      (4L, "another unrelated document about spark joins and shuffles"),
      (5L, base)                                     // exact dup of 0
    ).toDF("doc_id", "text")
  }

  test("nearDupPairs default (LSH-verify) and exact arm agree on planted near-dups") {
    val sh = TextOps.wordShingles(col("text"), 3)
    val exact = DedupOps.nearDupPairs(corpus, "doc_id", sh, 0.5, exact = true)
      .select("i", "j", "jaccard_bp").collect().toSet
    val lsh = DedupOps.nearDupPairs(corpus, "doc_id", sh, 0.5)
      .select("i", "j", "jaccard_bp").collect().toSet
    // at J well above the banding threshold the LSH path must find every
    // exact pair with the SAME verified jaccard; the fixture's pairs are
    // all J >= 0.85 where P(banding miss) ~ 0
    assert(exact.nonEmpty, "fixture must plant near-dup pairs")
    assert(lsh == exact,
      s"default path ${lsh.size} pairs, exact arm ${exact.size}: must agree")
  }

  test("nearDupPairs default never reports a pair below threshold (verify is exact)") {
    val sh = TextOps.wordShingles(col("text"), 3)
    val rows = DedupOps.nearDupPairs(corpus, "doc_id", sh, 0.5).collect()
    rows.foreach { r =>
      assert(r.getLong(2) >= 5000L,
        s"pair (${r.getLong(0)},${r.getLong(1)}) verified at ${r.getLong(2)}bp < threshold")
    }
  }

  test("NearestCentroid matches the broadcast-join argmax on every vector") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 200L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    // reference assignment: the crossJoin + row_number form the DuckDB
    // oracle mirrors (ties -> lowest cid)
    val cent = vecs.orderBy(col("vec_id")).limit(24)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      .withColumn("cn", VectorOps.norm(col("cv")))
      .filter(col("cn") > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))
    val joined = vecs
      .withColumn("nrm", VectorOps.norm(col("embedding")))
      .filter(col("nrm") > 0)
      .crossJoin(broadcast(cent))
      .withColumn("ccos",
        VectorOps.dot(col("embedding"), col("cv")) / (col("nrm") * col("cn")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("cid").as("cell"))
    // expression assignment over the same codebook
    val seeds = cent.orderBy("cid").collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    val assign = bridge.column(graft.functions.NearestCentroid(
      bridge.expression(col("embedding")),
      bridge.expression(VectorOps.norm(col("embedding"))),
      seeds.map(_._1), seeds.flatMap(_._2), seeds.map(_._3), 16))
    val expr = vecs.select(col("vec_id"), assign.as("cell"))
    val diff = expr.as("a").join(joined.as("b"), Seq("vec_id"))
      .filter(col("a.cell") =!= col("b.cell")).count()
    assert(diff == 0L, s"$diff vectors assigned to a different cell")
  }

  test("QuantizeVec bytes match the reference clamp-floor on random vectors") {
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 100L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 4f - 2f))).toDF("id", "v")
    val maxAbs = 2.0 // fixture range; deliberately NOT the corpus max so the clamp fires
    val qscale = 127.0 / maxAbs
    val got = vecs.select(col("id"), VectorOps.quantizeInt8(col("v"), qscale).as("qv"))
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toMap
    vecs.collect().foreach { r =>
      val exp = r.getSeq[Float](1).map { x =>
        math.max(-127.0, math.min(127.0, math.floor(x.toDouble * qscale))).toByte
      }.toArray
      assert(got(r.getLong(0)).sameElements(exp), s"row ${r.getLong(0)}")
    }
  }

  test("int8 dot kernels match reference left folds; length mismatch is loud") {
    val rnd = new scala.util.Random(13)
    val rows = (0L until 50L).map { i =>
      val f = Array.fill(16)(rnd.nextFloat() * 2f - 1f)
      val q = Array.fill(16)((rnd.nextInt(255) - 127).toByte)
      (i, q, f)
    }
    val df = rows.toDF("id", "q", "f")
    val got = df.select(col("id"),
        VectorOps.int8Dot(col("q"), col("q")).as("qq"),
        VectorOps.int8FloatDot(col("q"), col("f")).as("qf"))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getDouble(2)))).toMap
    rows.foreach { case (i, q, f) =>
      val qq = q.foldLeft(0.0)((a, b) => a + b.toDouble * b.toDouble)
      val qf = q.zip(f).foldLeft(0.0)((a, p) => a + p._1.toDouble * p._2.toDouble)
      assert(got(i)._1 == qq && got(i)._2 == qf, s"row $i") // bit-exact, not approx
    }
    val bad = Seq((1L, Array[Byte](1, 2, 3), Array(1f, 2f))).toDF("id", "q", "f")
    val e = intercept[Exception] {
      bad.select(VectorOps.int8FloatDot(col("q"), col("f"))).collect()
    }
    assert(e.getMessage.contains("length mismatch")
      || e.getCause != null && e.getCause.getMessage.contains("length mismatch"))
  }

  test("quantized IVF probe finds the planted nearest neighbors (ADC sanity)") {
    val rnd = new scala.util.Random(17)
    // 4 well-separated direction clusters; neighbors-of-query = its cluster
    val base = Array.tabulate(4)(c => Array.tabulate(16)(d =>
      if (d / 4 == c) 1.0f else 0.0f))
    val vecs = (0L until 80L).map { i =>
      val c = (i % 4).toInt
      val v = base(c).map(x => x + rnd.nextFloat() * 0.05f)
      (i, v)
    }.toDF("vec_id", "embedding")
    val cents = base.map(_.map(x => x: Float))
    val qscale = VectorOps.sqScale(vecs, "embedding")
    val got = VectorOps.ivfTopKQuantizedWithCentroids(
      vecs.filter(col("vec_id") < 4), vecs, "vec_id", "embedding", 5,
      cents.toSeq, qscale, nProbe = 1).collect()
    assert(got.length == 4 * 5)
    got.foreach { r =>
      assert(r.getLong(1) % 4 == r.getLong(0) % 4,
        s"query ${r.getLong(0)} got cross-cluster neighbor ${r.getLong(1)}")
    }
  }

  test("multi-probe LSH probes are distinct, start at the base bucket, and dominate single-table recall") {
    val rnd = new scala.util.Random(19)
    val vecs = (0L until 400L).map(i =>
      (i, Array.fill(32)(rnd.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    val probes = vecs.filter(col("vec_id") < 10)
      .select(col("vec_id"),
        VectorOps.lshProbeBuckets(col("embedding"), 32, 8, 8).as("pb"),
        VectorOps.lshBucket(col("embedding"), 32, 8).as("base"))
      .collect()
    probes.foreach { r =>
      val pb = r.getSeq[Long](1)
      assert(pb.length == 8 && pb.distinct.length == 8, "probes must be distinct")
      assert(pb.head == r.getLong(2), "first probe must be the query's own bucket")
      pb.tail.foreach { b =>
        assert(java.lang.Long.bitCount(b ^ pb.head) == 1,
          s"probe $b is not a single-bit flip of base ${pb.head}")
      }
    }
    val q = vecs.filter(col("vec_id") < 10)
    val exact = VectorOps.bruteForceTopK(q, vecs, "vec_id", "embedding", 5)
    def meanRecall(ap: org.apache.spark.sql.DataFrame): Double =
      VectorOps.annRecall(ap, exact, "qid", "nid")
        .agg(avg(col("recall_bp"))).first().getDouble(0)
    val single = meanRecall(VectorOps.lshTopK(q, vecs, "vec_id", "embedding",
      5, dim = 32, numPlanes = 8))
    val multi = meanRecall(VectorOps.lshTopKMultiProbe(q, vecs, "vec_id",
      "embedding", 5, dim = 32, numPlanes = 8, numProbes = 8))
    // candidate superset (base bucket is probe 0) -> recall must not drop;
    // on any non-degenerate fixture the 7 extra probes strictly add hits
    assert(multi >= single,
      s"multi-probe recall $multi must dominate single-table $single")
  }

  test("salted candidate-verify matches the unsalted result under a planted hot key") {
    // one boilerplate template near-duplicated 60x: doc 0 is a hot i in
    // the candidate set (paired with every clone), the x64 skew scenario
    val words = (0 until 30).map(i => s"w$i").mkString(" ")
    val hot = (0L until 60L).map(i => (i, s"$words tail$i")) ++
      (100L until 140L).map(i => (i, s"unrelated document number $i with its own words ${i * 7}"))
    val docs = hot.toDF("doc_id", "text")
    val sh = TextOps.wordShingles(col("text"), 3)
    val unsalted = DedupOps.nearDupPairs(docs, "doc_id", sh, 0.5, salts = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val salted = DedupOps.nearDupPairs(docs, "doc_id", sh, 0.5, salts = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(unsalted.nonEmpty, "fixture must produce near-dup pairs")
    assert(unsalted.exists(_._1 == 0L), "doc 0 must be a hot candidate key")
    assert(salted == unsalted,
      s"salting changed the verify result: ${salted.size} vs ${unsalted.size}")
  }

  test("saltScatter bounds the hot key's per-reducer input") {
    // the verify's i-join reduces on (i, saltScatter(j, salts)): for a
    // hot i in P pairs, max task input is the largest scatter group —
    // assert it stays near P/salts instead of P
    val salts = 8
    val pairs = (1L to 400L).map(j => (0L, j)).toDF("i", "j")
    val groups = pairs
      .groupBy(col("i"), JoinOps.saltScatter(col("j"), salts).as("s"))
      .count().collect()
    assert(groups.length == salts, s"expected $salts scatter groups, got ${groups.length}")
    val max = groups.map(_.getLong(2)).max
    assert(max <= 2 * 400 / salts,
      s"hot key max reducer input $max exceeds 2x the even share ${400 / salts}")
  }

  test("sqScale and QuantizeVec fail loudly on degenerate input") {
    intercept[IllegalArgumentException] {
      graft.functions.QuantizeVec(
        org.apache.spark.sql.graftbridge.Bridge.expression(col("v")), 0.0)
    }
    val zeros = Seq((1L, Array(0f, 0f))).toDF("id", "v")
    intercept[IllegalArgumentException] {
      VectorOps.sqScale(zeros, "v")
    }
  }

  test("codegen'd ABI/Borsh decode matches eval semantics incl. allowFail nulls") {
    import graft.functions.GraftFunctions
    // Transfer(from indexed, to indexed, value): row 1 valid, row 2 has
    // truncated data — allowFail=true must null the struct, not throw
    val a1 = Array.tabulate[Byte](32)(i => if (i >= 12) (i + 1).toByte else 0)
    val a2 = Array.tabulate[Byte](32)(i => if (i >= 12) (i + 7).toByte else 0)
    val amount = { val b = new Array[Byte](32); b(31) = 42; b }
    val rows = Seq(
      (1L, a1, a2, amount),
      (2L, a1, a2, Array[Byte](1, 2, 3))
    ).toDF("id", "t1", "t2", "data")
    val dec = GraftFunctions.evm_decode_event(
      "Transfer(address indexed from, address indexed to, uint32 value)",
      col("t1"), col("t2"), lit(null).cast("binary"), col("data"),
      allowFail = true)
    val got = rows.select(col("id"), dec.as("e"))
      .select(col("id"), col("e.value").as("v")).orderBy("id").collect()
    assert(got(0).getLong(1) == 42L, "valid row must decode through codegen")
    assert(got(1).isNullAt(1), "allowFail row must null, not throw, in codegen")
    // Borsh: u64 LE amount after an 8-byte discriminator
    val disc = "0102030405060708"
    val ok = Hex.decodeHex(disc) ++ Array[Byte](9, 0, 0, 0, 0, 0, 0, 0)
    val badDisc = Array.fill[Byte](8)(0) ++ Array[Byte](9, 0, 0, 0, 0, 0, 0, 0)
    val brows = Seq((1L, ok), (2L, badDisc)).toDF("id", "data")
    val bdec = GraftFunctions.svm_decode_instruction(disc, "amount:u64",
      col("data"), allowFail = true)
    val bgot = brows.select(col("id"), bdec.as("e"))
      .select(col("id"), col("e.amount").as("a")).orderBy("id").collect()
    assert(bgot(0).getDecimal(1).longValueExact == 9L)
    assert(bgot(1).isNullAt(1), "discriminator mismatch must null under allowFail")
  }

  private object Hex {
    def decodeHex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  }

  test("NearestCentroid fails loudly on a malformed codebook") {
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    val v = bridge.expression(col("embedding"))
    val n = bridge.expression(lit(1.0))
    intercept[IllegalArgumentException] { // unsorted cids break the tie rule
      graft.functions.NearestCentroid(v, n,
        Array(2L, 1L), Array.fill(4)(1f), Array(1.0, 1.0), 2)
    }
    intercept[IllegalArgumentException] { // zero-norm centroid
      graft.functions.NearestCentroid(v, n,
        Array(1L, 2L), Array.fill(4)(1f), Array(1.0, 0.0), 2)
    }
    intercept[IllegalArgumentException] { // flat length != k * dim
      graft.functions.NearestCentroid(v, n,
        Array(1L, 2L), Array.fill(3)(1f), Array(1.0, 1.0), 2)
    }
  }

  test("duplicatedSpans finds maximal cross-doc spans, within-doc repeats, and merges adjacent coverage") {
    val docs = Seq(
      // docs 10/11 share the 7-token run D1..D7 inside unique filler:
      // dup shingle positions {3,4,5} and {2,3,4} merge to 7-token spans
      (10L, "a1 a2 a3 D1 D2 D3 D4 D5 D6 D7 a4 a5"),
      (11L, "b1 b2 D1 D2 D3 D4 D5 D6 D7 b3"),
      // doc 12 repeats R1..R5 internally: two islands (8 > 1 + 5)
      (12L, "c1 R1 R2 R3 R4 R5 c2 c3 R1 R2 R3 R4 R5 c4"),
      // docs 13/14 share blocks A1..A5 and B1..B5; contiguous in 13
      // (positions 0 and 5 merge: 5 <= 0+5) but split by a token in 14
      (13L, "A1 A2 A3 A4 A5 B1 B2 B3 B4 B5"),
      (14L, "A1 A2 A3 A4 A5 zz B1 B2 B3 B4 B5"),
      (15L, "tiny doc"),                         // sub-k: zero positions
      (16L, "e1 e2 e3 e4 e5 e6 e7 e8")           // unique: no spans
    ).toDF("doc_id", "text")
    val spans = DedupOps.duplicatedSpans(docs, "doc_id", "text", k = 5)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(spans.toSeq == Seq(
      (10L, 3L, 7L), (11L, 2L, 7L),
      (12L, 1L, 5L), (12L, 8L, 5L),
      (13L, 0L, 10L),
      (14L, 0L, 5L), (14L, 6L, 5L)))
  }

  test("duplicatedSpans rejects degenerate parameters") {
    val docs = Seq((0L, "x y")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      DedupOps.duplicatedSpans(docs, "doc_id", "text", k = 0)
    }
    intercept[IllegalArgumentException] {
      DedupOps.duplicatedSpans(docs, "doc_id", "text", minCount = 1)
    }
  }

  test("qualityClassifierScore computes the quantized NB posterior exactly") {
    val docs = Seq(
      (0L, "the of and a in"),  // stop ratio 10000 -> good
      (1L, "the of and a in"),  // good (exact dup is fine)
      (2L, "b0 b1 b2 b3 b4")    // stop ratio 0 -> bad
    ).toDF("doc_id", "text")
    val rows = TextOps.qualityClassifierScore(docs, "doc_id")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // stop tokens: df=2 both good -> (2+1)*10000 div (2+2) = 7500
    // b* tokens:   df=1, gdf=0   -> (0+1)*10000 div (1+2) = 3333
    assert(rows.toSeq == Seq((0L, 5L, 7500L), (1L, 5L, 7500L), (2L, 5L, 3333L)))
  }
}
