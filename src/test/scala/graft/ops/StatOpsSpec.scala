package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** StatOps (two-pass exact quantiles, column profile) and the global row
  * index — checked against naive single-machine references.
  */
class StatOpsSpec extends SparkSpec {
  import spark.implicits._

  test("exactQuantiles matches naive rank selection on every group") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map { i =>
      (s"g${i % 3}", rnd.nextDouble() * 1000 - 200)
    }
    val df = rows.toDF("k", "v")
    val qs = Seq(("p25", 1L, 4L), ("p50", 1L, 2L), ("p99", 99L, 100L))
    val got = StatOps.exactQuantiles(df, "k", "v", qs, buckets = 16)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val sorted = grp.map(_._2).sorted
      val n = sorted.length.toLong
      def pick(num: Long, den: Long) = sorted(((num * n + den - 1) / den - 1).toInt)
      assert(got(g) == ((pick(1, 4), pick(1, 2), pick(99, 100))),
        s"group $g mismatch")
    }
  }

  test("exactQuantiles handles ties, single-value groups, and p100") {
    val df = Seq(("a", 5.0), ("a", 5.0), ("a", 5.0), ("b", 1.0))
      .toDF("k", "v")
    val got = StatOps.exactQuantiles(df, "k", "v",
        Seq(("p50", 1L, 2L), ("p100", 1L, 1L)), buckets = 4)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(got("a") == ((5.0, 5.0)))
    assert(got("b") == ((1.0, 1.0)))
  }

  test("exactQuantiles ignores nulls") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)))
      .toDF("k", "v")
    val got = StatOps.exactQuantiles(df, "k", "v", Seq(("p100", 1L, 1L)))
      .collect().head.getDouble(1)
    assert(got == 3.0)
  }

  test("exactQuantiles scales to 10k groups without driver collection") {
    // The bucket search is a distributed window over (group, bucket) — no
    // per-group state ever lands on the driver, so high group cardinality
    // must just work. 10k groups x 5 values each; p50 = 3rd value = g*5+2.
    val df = spark.range(50000)
      .select((col("id") % 10000).cast("string").as("k"),
        ((col("id") % 10000) * 5 + expr("id div 10000")).cast("double").as("v"))
    val got = StatOps.exactQuantiles(df, "k", "v",
        Seq(("p50", 1L, 2L)), buckets = 8)
    assert(got.count() == 10000)
    val sample = got.filter(col("k").isin("0", "123", "9999"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sample == Map("0" -> 2.0, "123" -> 617.0, "9999" -> 49997.0))
  }

  test("exactQuantiles rejects NaN input loudly") {
    val df = Seq(("a", 1.0), ("a", Double.NaN), ("a", 3.0)).toDF("k", "v")
    val e = intercept[Exception] {
      StatOps.exactQuantiles(df, "k", "v", Seq(("p50", 1L, 2L))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("NaN")), s"unexpected: $e")
  }

  test("profile reports counts, nulls, distincts, bounds per column") {
    val df = Seq((Some(1.0), 10L), (Some(2.0), 10L), (None, 20L))
      .toDF("a", "b")
    val got = StatOps.profile(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got("a") == ((2L, 1L, 2L, 1.0, 2.0)))
    assert(got("b") == ((3L, 0L, 2L, 10.0, 20.0)))
  }

  test("profile uses lossless identity: strings profile, big longs distinct") {
    // 2^53 and 2^53+1 collapse to the SAME double — the old double-cast
    // identity counted them as one distinct; strings profiled as all-null.
    val df = Seq(
      (Some("x"), 9007199254740992L),
      (Some("y"), 9007199254740993L),
      (None: Option[String], 9007199254740992L)
    ).toDF("s", "big")
    val rows = StatOps.profile(df, Seq("s", "big"))
      .collect().map(r => r.getString(0) -> r).toMap
    val s = rows("s")
    assert((s.getLong(1), s.getLong(2), s.getLong(3)) == ((2L, 1L, 2L)))
    assert(s.isNullAt(4) && s.isNullAt(5)) // non-numeric → null bounds, not 0
    val big = rows("big")
    assert((big.getLong(1), big.getLong(2), big.getLong(3)) == ((3L, 0L, 2L)))
  }

  test("globalRowIndex is contiguous, 0-based, and order-correct") {
    val rnd = new scala.util.Random(11)
    val rows = rnd.shuffle((0L until 1000L).toList).map(i => (i, i % 17))
    val df = rows.toDF("id", "grp").repartition(7)
    val got = SampleOps.globalRowIndex(df, Seq(col("id")))
      .select("id", "idx").as[(Long, Long)].collect().toMap
    // ids are 0..999 and the order column is id, so idx must equal id
    assert(got.size == 1000)
    assert(got.forall { case (id, idx) => id == idx })
  }

  test("globalRowIndex respects descending order with tiebreaks") {
    val df = Seq((1L, 5L), (2L, 9L), (3L, 5L), (4L, 9L)).toDF("id", "score")
    val got = SampleOps.globalRowIndex(df,
        Seq(col("score").desc, col("id")))
      .select("id", "idx").as[(Long, Long)].collect().toMap
    assert(got == Map(2L -> 0L, 4L -> 1L, 1L -> 2L, 3L -> 3L))
  }

  test("count-min sketch: shard-merge exact, estimates one-sided") {
    // skewed token stream over two groups: token t0 is the heavy hitter
    val rnd = new scala.util.Random(13)
    val rows = (0 until 600).map { i =>
      (s"g${i % 2}", if (rnd.nextInt(4) == 0) "t0" else s"t${rnd.nextInt(40)}")
    }
    val df = rows.toDF("k", "tok")
    val exact = rows.groupBy(identity).map { case ((k, t), g) =>
      (k, t) -> g.size.toLong }.toMap

    val single = StatOps.cmsSketch(df, "k", "tok", width = 64, depth = 4)
    // counters are linear: sketching two shards and merging must equal
    // sketching the concatenation BIT-FOR-BIT (the incremental contract)
    val shardA = StatOps.cmsSketch(df.filter(col("tok") =!= "t0"), "k", "tok",
      width = 64, depth = 4)
    val shardB = StatOps.cmsSketch(df.filter(col("tok") === "t0"), "k", "tok",
      width = 64, depth = 4)
    val merged = StatOps.mergeCmsSketches(shardA.unionByName(shardB), "k")
    def byKey(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(byKey(merged) == byKey(single))

    // estimates: NEVER an undercount; exact for every item at width 64
    // over ≤ 41 distinct tokens unless rows collide (then strictly over)
    val items = rows.map(_._2).distinct.toDF("tok")
    val est = StatOps.cmsEstimate(
        items.crossJoin(single), "tok", width = 64, depth = 4)
      .select("k", "tok", "freq_est")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
    est.foreach { case ((k, t), e) =>
      val truth = exact.getOrElse((k, t), 0L)
      assert(e >= truth, s"($k,$t): est $e under-counts true $truth")
    }
    // the heavy hitter is found exactly (its count dwarfs collision noise)
    val hh = est.filter(_._1._2 == "t0").toMap
    assert(hh(("g0", "t0")) == exact(("g0", "t0")))
    assert(hh(("g1", "t0")) == exact(("g1", "t0")))
  }

  test("count-min sketch: parameter mismatch fails loudly, never under-counts") {
    val df = Seq(("g", "t1"), ("g", "t2")).toDF("k", "tok")
    val sk64 = StatOps.cmsSketch(df, "k", "tok", width = 64, depth = 4)
    // probing a width-64 sketch as width-256 would index out of range and
    // silently return null/under-counts without the length guard
    val bad = intercept[Exception] {
      StatOps.cmsEstimate(Seq("t1").toDF("tok").crossJoin(sk64), "tok",
        width = 256, depth = 4).collect()
    }
    assert(bad.getMessage.contains("cmsEstimate"))
    // SAME-PRODUCT factorization mismatch (64×4 = 32×8 slots) must ALSO
    // raise — the length check alone cannot see it; the [width, depth]
    // header can
    val sameProduct = intercept[Exception] {
      StatOps.cmsEstimate(Seq("t1").toDF("tok").crossJoin(sk64), "tok",
        width = 32, depth = 8).collect()
    }
    assert(sameProduct.getMessage.contains("cmsEstimate"))
    // merging sketches built with different widths is meaningless
    val sk32 = StatOps.cmsSketch(df, "k", "tok", width = 32, depth = 4)
    val mixed = intercept[Exception] {
      StatOps.mergeCmsSketches(sk64.unionByName(sk32), "k").collect()
    }
    assert(mixed.getMessage.contains("mergeCmsSketches"))
    // and a same-LENGTH merge with different factorizations raises off
    // the header even though every position has a contributor
    val sk32d8 = StatOps.cmsSketch(df, "k", "tok", width = 32, depth = 8)
    val mixed2 = intercept[Exception] {
      StatOps.mergeCmsSketches(sk64.unionByName(sk32d8), "k").collect()
    }
    assert(mixed2.getMessage.contains("mergeCmsSketches"))
  }
}
