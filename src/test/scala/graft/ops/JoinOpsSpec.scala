package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  test("asOfJoinBackward picks the latest right row at-or-before, per key") {
    val left = Seq((1L, "k1", 100L), (2L, "k1", 200L), (3L, "k2", 150L),
      (4L, "k3", 50L)).toDF("id", "k", "t")
    val right = Seq(("k1", 90L, "a"), ("k1", 100L, "b"), ("k1", 150L, "c"),
      ("k2", 10L, "d")).toDF("k", "t", "p")
    val got = JoinOps.asOfJoinBackward(left, right, "k", "t", Seq("p"))
      .select("id", "p").as[(Long, Option[String])].collect().toMap
    assert(got(1L).contains("b")) // inclusive: right at t=100 matches left t=100
    assert(got(2L).contains("c")) // latest of {a,b,c}
    assert(got(3L).contains("d"))
    assert(got(4L).isEmpty)       // no right row before t=50 for k3
  }

  test("asOfJoinBackward equals the naive per-row definition on random data") {
    val rnd = new scala.util.Random(7)
    val left = (1L to 200L).map(i =>
      (i, s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong)).toDF("id", "k", "t")
    val rightRows = (1 to 100).map(i =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, i))
      .distinct.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (k,t)
    val right = rightRows.toDF("k", "t", "p")
    val got = JoinOps.asOfJoinBackward(left, right, "k", "t", Seq("p"))
      .select("id", "p").as[(Long, Option[Int])].collect().toMap
    val leftLocal = left.as[(Long, String, Long)].collect()
    leftLocal.foreach { case (id, k, t) =>
      val expect = rightRows.filter(r => r._1 == k && r._2 <= t)
        .sortBy(_._2).lastOption.map(_._3)
      assert(got(id) == expect, s"id=$id k=$k t=$t")
    }
  }

  test("intervalJoin equals the naive range-predicate join on random data") {
    val rnd = new scala.util.Random(11)
    val ls = (1L to 100L).map(i => (i, s"k${rnd.nextInt(4)}", rnd.nextInt(5000).toLong))
    val rs = (1L to 300L).map(i => (i + 1000L, s"k${rnd.nextInt(4)}", rnd.nextInt(5000).toLong))
    val gap = 500L
    val left = ls.toDF("pid", "k", "lus")
      .select(col("pid"), col("k"), timestamp_micros(col("lus")).as("lts"))
    val right = rs.toDF("rid", "k", "rus")
      .select(col("rid"), col("k"), timestamp_micros(col("rus")).as("rts"))
    val got = JoinOps.intervalJoin(left, right, "k", "lts", "rts", gap)
      .select("pid", "rid").as[(Long, Long)].collect().toSet
    val naive = (for {
      (pid, lk, lus) <- ls
      (rid, rk, rus) <- rs
      if lk == rk && rus >= lus && rus <= lus + gap
    } yield (pid, rid)).toSet
    assert(got == naive && naive.nonEmpty)
  }

  test("saltedJoin is semantically identical to a plain equi-join") {
    val left = (1 to 500).map(i => (i, s"k${i % 3}")).toDF("id", "key")
    val right = Seq(("k0", "x"), ("k1", "y"), ("k2", "z"), ("k9", "w"))
      .toDF("key", "v")
    val plain = left.join(right, Seq("key")).select("id", "v")
      .as[(Int, String)].collect().toSet
    val salted = JoinOps.saltedJoin(left, right, "key", col("id"), salts = 8)
      .select("id", "v").as[(Int, String)].collect().toSet
    assert(salted == plain && salted.size == 500)
  }
}
