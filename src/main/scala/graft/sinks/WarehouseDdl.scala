package graft.sinks

import java.util.Properties

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.api.Sink

/** Warehouse DDL generation (≙ cherry W2 ClickHouse writer,
  * `writers/clickhouse.py:88-186`): the reference auto-creates each sink
  * table from the arriving Arrow schema, with per-table ORDER BY keys,
  * engine choice, and per-column codecs. Here the same contract is derived
  * from the DataFrame's `StructType` — the type map below is the Spark-side
  * analog of the reference's Arrow→ClickHouse enumeration
  * (`writers/clickhouse.py:11-85`; unknown types raise, `clickhouse.py:85`).
  */
object WarehouseDdl {

  /** Spark SQL type → ClickHouse column type. Nested element nullability is
    * carried into Nullable(...) wrappers exactly where ClickHouse allows
    * them (top-level + array/map elements; tuple fields are never Nullable
    * at the outer position).
    */
  def chType(dt: DataType): String = dt match {
    case BooleanType => "Bool"
    case ByteType => "Int8"
    case ShortType => "Int16"
    case IntegerType => "Int32"
    case LongType => "Int64"
    case FloatType => "Float32"
    case DoubleType => "Float64"
    case StringType => "String"
    case BinaryType => "String" // CH convention: raw bytes travel as String
    case DateType => "Date32"
    case TimestampType | TimestampNTZType => "DateTime64(6)"
    case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
    case ArrayType(et, containsNull) =>
      s"Array(${nullable(chType(et), containsNull)})"
    case MapType(kt, vt, valueContainsNull) =>
      s"Map(${chType(kt)}, ${nullable(chType(vt), valueContainsNull)})"
    case StructType(fields) =>
      // tuple FIELD names backquote like top-level columns and ORDER BY
      // keys (r15 review): an unquoted "block-number" or reserved word
      // inside Tuple(...) is invalid ClickHouse DDL just as it is outside
      fields.map(f =>
          s"`${f.name}` ${nullable(chType(f.dataType), f.nullable)}")
        .mkString("Tuple(", ", ", ")")
    case other =>
      throw new IllegalArgumentException(s"no warehouse mapping for $other")
  }

  private def nullable(t: String, isNullable: Boolean): String =
    // CH forbids Nullable around composite types.
    if (isNullable && !t.startsWith("Array(") && !t.startsWith("Map(") &&
        !t.startsWith("Tuple(")) s"Nullable($t)" else t

  /** CREATE TABLE DDL from a schema: engine + ORDER BY key + optional
    * per-column compression codecs (cherry `writers/clickhouse.py:119-148`).
    * ORDER BY columns keep their natural type (a MergeTree key can't be
    * Nullable), everything else nullable per the schema.
    */
  def createTable(table: String, schema: StructType,
                  orderBy: Seq[String] = Seq.empty,
                  engine: String = "MergeTree()",
                  codecs: Map[String, String] = Map.empty): String = {
    // loud-typo policy (the package's sink-config rule): a codec keyed on
    // a name the schema lacks would be silently dropped — the table comes
    // up uncompressed and nobody is told; an orderBy typo would at least
    // fail on the server, but with a far worse error than naming it here
    val names = schema.fieldNames.toSet
    val badCodec = codecs.keySet -- names
    require(badCodec.isEmpty,
      s"codecs name unknown column(s): ${badCodec.toSeq.sorted.mkString(", ")} " +
        s"(schema has: ${schema.fieldNames.sorted.mkString(", ")})")
    val badOrder = orderBy.filterNot(names)
    require(badOrder.isEmpty,
      s"orderBy names unknown column(s): ${badOrder.sorted.mkString(", ")} " +
        s"(schema has: ${schema.fieldNames.sorted.mkString(", ")})")
    val cols = schema.fields.map { f =>
      val base = chType(f.dataType)
      val t = if (orderBy.contains(f.name)) base else nullable(base, f.nullable)
      val codec = codecs.get(f.name).map(c => s" CODEC($c)").getOrElse("")
      s"  `${f.name}` $t$codec"
    }.mkString(",\n")
    val order =
      // backquote key names like the column list — an unquoted
      // "block-number" or reserved word is invalid ClickHouse DDL
      if (orderBy.nonEmpty)
        orderBy.map(n => s"`$n`").mkString("\nORDER BY (", ", ", ")")
      else "\nORDER BY tuple()"
    s"CREATE TABLE IF NOT EXISTS `$table` (\n$cols\n) ENGINE = $engine$order"
  }

  /** Generic ANSI DDL for JDBC warehouses (the W1 DuckDB / generic-JDBC
    * shape): first-push auto-creation the reference does with
    * `CREATE TABLE … AS SELECT` (`writers/duckdb.py:31-33`).
    */
  def ansiType(dt: DataType): String = dt match {
    case BooleanType => "BOOLEAN"
    case ByteType => "TINYINT"
    case ShortType => "SMALLINT"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case FloatType => "REAL"
    case DoubleType => "DOUBLE PRECISION"
    case StringType => "VARCHAR"
    case BinaryType => "BLOB"
    case DateType => "DATE"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case d: DecimalType => s"DECIMAL(${d.precision}, ${d.scale})"
    case other =>
      throw new IllegalArgumentException(s"no ANSI mapping for $other")
  }

  def createTableAnsi(table: String, schema: StructType): String = {
    val cols = schema.fields.map { f =>
      val nn = if (f.nullable) "" else " NOT NULL"
      s"  \"${f.name}\" ${ansiType(f.dataType)}$nn"
    }.mkString(",\n")
    s"CREATE TABLE IF NOT EXISTS \"$table\" (\n$cols\n)"
  }
}

/** JDBC warehouse sink (≙ cherry W1/W2 shape): append per micro-batch over
  * `df.write.jdbc`, anchor table last (resume contract, see Sinks.scala).
  * Spark's JDBC writer issues the CREATE TABLE itself on first push; the
  * WarehouseDdl generators above serve warehouses whose DDL needs engine /
  * ORDER BY / codec clauses Spark's generic writer can't emit.
  */
final case class JdbcSink(url: String,
                          properties: Properties = new Properties(),
                          tablePrefix: String = "",
                          anchorTable: Option[String] = None) extends Sink {
  def push(tables: Map[String, DataFrame]): Unit =
    AnchorLast.push(tables, anchorTable) { (name, df) =>
      df.write.mode("append").jdbc(url, tablePrefix + name, properties)
    }
}
