package graft.sinks

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** WarehouseDdl specs (cherry W2 `writers/clickhouse.py:11-85,112-148`
  * analog): schema → DDL generation, type-map edges, unknown-type rejection.
  */
class DdlSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("block_number", LongType, nullable = false),
    StructField("hash", BinaryType, nullable = true),
    StructField("ts", TimestampType, nullable = true),
    StructField("amount", DecimalType(38, 0), nullable = true),
    StructField("topics", ArrayType(BinaryType, containsNull = false), nullable = true),
    StructField("meta", MapType(StringType, LongType, valueContainsNull = true), nullable = true),
    StructField("pos", StructType(Seq(
      StructField("tx", IntegerType, nullable = true),
      StructField("log", IntegerType, nullable = false))), nullable = true)
  ))

  test("ClickHouse DDL: engine, ORDER BY key stays non-Nullable, codecs") {
    val ddl = WarehouseDdl.createTable("logs", schema,
      orderBy = Seq("block_number"),
      codecs = Map("hash" -> "ZSTD(3)"))
    assert(ddl.contains("CREATE TABLE IF NOT EXISTS `logs`"))
    assert(ddl.contains("`block_number` Int64")) // ORDER BY col: no Nullable
    assert(!ddl.contains("Nullable(Int64),\n  `hash`"))
    assert(ddl.contains("`hash` Nullable(String) CODEC(ZSTD(3))"))
    assert(ddl.contains("`ts` Nullable(DateTime64(6))"))
    assert(ddl.contains("`amount` Nullable(Decimal(38, 0))"))
    assert(ddl.contains("`topics` Array(String)"))
    assert(ddl.contains("`meta` Map(String, Nullable(Int64))"))
    // tuple field names are backquoted like top-level columns (r15: an
    // unquoted reserved word or dashed name inside Tuple is invalid DDL)
    assert(ddl.contains("`pos` Tuple(`tx` Nullable(Int32), `log` Int32)"))
    assert(ddl.contains("ENGINE = MergeTree()"))
    assert(ddl.contains("ORDER BY (`block_number`)")) // keys quoted like columns
  }

  test("ClickHouse DDL: typo'd codec or orderBy columns fail loudly " +
      "instead of silently dropping the clause (r15)") {
    val e1 = intercept[IllegalArgumentException] {
      WarehouseDdl.createTable("logs", schema,
        codecs = Map("Hash" -> "ZSTD(3)")) // wrong case = wrong column
    }
    assert(e1.getMessage.contains("codecs") && e1.getMessage.contains("Hash"))
    val e2 = intercept[IllegalArgumentException] {
      WarehouseDdl.createTable("logs", schema, orderBy = Seq("block_num"))
    }
    assert(e2.getMessage.contains("orderBy") &&
      e2.getMessage.contains("block_num"))
  }

  test("ClickHouse DDL: no ORDER BY → ORDER BY tuple(); unknown type raises") {
    val ddl = WarehouseDdl.createTable("t",
      StructType(Seq(StructField("a", IntegerType))))
    assert(ddl.contains("ORDER BY tuple()"))
    intercept[IllegalArgumentException] {
      WarehouseDdl.chType(CalendarIntervalType)
    }
  }

  test("ANSI DDL: NOT NULL carried, quoting, decimal precision") {
    val ddl = WarehouseDdl.createTableAnsi("transfers", StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("price", DecimalType(20, 4), nullable = true),
      StructField("raw", BinaryType, nullable = true))))
    assert(ddl.contains("\"id\" BIGINT NOT NULL"))
    assert(ddl.contains("\"price\" DECIMAL(20, 4)"))
    assert(ddl.contains("\"raw\" BLOB"))
  }

  test("DeltaSink wiring reaches the delta format writer (jar-gated)") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "v")
    // no delta jars on this classpath: the push must fail INSIDE Spark's
    // data-source lookup for "delta" — proving the sink wired the write
    // correctly, not short-circuiting earlier.
    val err = intercept[Exception] {
      DeltaSink("/tmp/graft-delta-test").push(Map("t" -> df))
    }
    assert(err.getMessage.toLowerCase.contains("delta"), err.getMessage)
  }

  test("IcebergSink wiring reaches the catalog append (jar-gated)") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "v")
    // no iceberg catalog configured: the failure names the target table,
    // proving writeTo(prefix + name) is reached with the right identifier.
    val err = intercept[Exception] {
      IcebergSink("nosuchcatalog.db.").push(Map("t" -> df))
    }
    assert(err.getMessage.contains("nosuchcatalog"), err.getMessage)
  }

  test("AnchorLast writes non-anchor tables concurrently, anchor strictly after") {
    import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, TimeUnit}
    val events = new ConcurrentLinkedQueue[String]()
    val bothStarted = new CountDownLatch(2)
    // three tables, anchor = "blocks"; the two non-anchor writes each block
    // until BOTH have started — only possible if they run concurrently.
    val tables = Map[String, org.apache.spark.sql.DataFrame](
      "a" -> null, "b" -> null, "blocks" -> null)
    AnchorLast.push(tables, Some("blocks")) { (name, _) =>
      if (name != "blocks") {
        bothStarted.countDown()
        assert(bothStarted.await(10, TimeUnit.SECONDS),
          "non-anchor writes did not overlap (sequential writer?)")
      }
      events.add(name)
    }
    val order = events.toArray(Array.empty[String]).toSeq
    assert(order.size == 3)
    assert(order.last == "blocks", s"anchor not last: $order")
  }

  test("AnchorLast never writes the anchor when a table write fails") {
    val written = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val err = intercept[RuntimeException] {
      AnchorLast.push(
        Map[String, org.apache.spark.sql.DataFrame]("a" -> null, "blocks" -> null),
        Some("blocks")) { (name, _) =>
        if (name == "a") throw new RuntimeException("boom")
        written.add(name)
      }
    }
    assert(err.getMessage == "boom")
    assert(!written.contains("blocks"))
  }
}
