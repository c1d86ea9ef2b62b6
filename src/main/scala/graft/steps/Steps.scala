package graft.steps

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.Step
import graft.functions.{GraftFunctions => F}

/** The dispatched step library (SURVEY.md §2.2, T1–T12) re-expressed as
  * DataFrame plan rewrites. Where cherry runs a Rust kernel per Arrow
  * RecordBatch (`steps/cast.py:17-20`), we rewrite the lazy plan and let
  * whole-stage codegen vectorize — same semantics, zero interpreter loop.
  *
  * Scale notes: every step here is a narrow per-row transformation (no
  * shuffle introduced by any of them), so a pipeline of N steps still
  * executes as one fused codegen stage over the scan.
  */
object Steps {

  private def targetTables(tables: Map[String, DataFrame],
                           only: Option[Seq[String]]): Set[String] =
    only.map(_.toSet).getOrElse(tables.keySet)

  /** Columns of `df` whose type is `dt`. */
  private def colsOfType(df: DataFrame, dt: DataType): Seq[String] =
    df.schema.fields.filter(_.dataType == dt).map(_.name).toSeq

  // --- T4 CAST (cherry steps/cast.py:9-27) ----------------------------------

  /** Cast named columns of one table; `allowCastFail` → `try_cast` semantics
    * (null on failure), exactly the reference's `allow_cast_fail` contract.
    */
  final case class Cast(tableName: String, mappings: Map[String, DataType],
                        allowCastFail: Boolean = false) extends Step {
    def apply(spark: SparkSession, tables: Map[String, DataFrame]): Map[String, DataFrame] =
      tables.map {
        case (name, df) if name == tableName =>
          name -> mappings.foldLeft(df) { case (d, (c, t)) =>
            d.withColumn(c, if (allowCastFail) col(c).try_cast(t.sql)
                            else col(c).cast(t))
          }
        case kv => kv
      }
  }

  // --- T5 CAST_BY_TYPE (cherry steps/cast_by_type.py:9-27) ------------------

  /** Cast every column whose type == `from`, across all tables. */
  final case class CastByType(from: DataType, to: DataType,
                              allowCastFail: Boolean = false) extends Step {
    def apply(spark: SparkSession, tables: Map[String, DataFrame]): Map[String, DataFrame] =
      tables.map { case (name, df) =>
        name -> colsOfType(df, from).foldLeft(df) { (d, c) =>
          d.withColumn(c, if (allowCastFail) col(c).try_cast(to.sql)
                          else col(c).cast(to))
        }
      }
  }

  // --- T6 HEX_ENCODE (cherry steps/hex_encode.py:10-27) ---------------------

  /** Encode ALL binary columns of the selected tables to lowercase hex
    * strings, `prefixed` → "0x…" (cherry defaults prefixed=True; note Spark's
    * `hex()` is uppercase — `F.hex_lower` wraps it, oracle-visible).
    */
  final case class HexEncode(tables: Option[Seq[String]] = None,
                             prefixed: Boolean = true) extends Step {
    def apply(spark: SparkSession, all: Map[String, DataFrame]): Map[String, DataFrame] = {
      val targets = targetTables(all, tables)
      all.map { case (name, df) =>
        name -> (if (!targets(name)) df
                 else colsOfType(df, BinaryType).foldLeft(df) { (d, c) =>
                   d.withColumn(c, F.hex_lower(col(c), prefixed))
                 })
      }
    }
  }

  // --- T7 BASE58_ENCODE (cherry steps/base58_encode.py:10-28) ---------------

  /** Encode ALL binary columns of the selected tables to base58 (bitcoin
    * alphabet) strings.
    */
  final case class Base58Encode(tables: Option[Seq[String]] = None) extends Step {
    def apply(spark: SparkSession, all: Map[String, DataFrame]): Map[String, DataFrame] = {
      val targets = targetTables(all, tables)
      all.map { case (name, df) =>
        name -> (if (!targets(name)) df
                 else colsOfType(df, BinaryType).foldLeft(df) { (d, c) =>
                   d.withColumn(c, F.base58_encode(col(c)))
                 })
      }
    }
  }

  // --- T8 U256 canon (cherry steps/u256_to_binary.py:11-29) -----------------

  /** In cherry, u256 arrives as decimal256(76,0) and this step rewrites it to
    * raw 32-byte binary. Our engine's canonical u256 IS 32-byte big-endian
    * binary (SURVEY §7.3 — Spark decimals cap at 38 digits), so the
    * equivalent boundary step converts decimal-string columns to the canon.
    */
  final case class U256FromString(tableName: String, columns: Seq[String]) extends Step {
    def apply(spark: SparkSession, tables: Map[String, DataFrame]): Map[String, DataFrame] =
      tables.map {
        case (name, df) if name == tableName =>
          name -> columns.foldLeft(df)((d, c) =>
            d.withColumn(c, F.u256_from_string(col(c))))
        case kv => kv
      }
  }

  // --- T9 SET_CHAIN_ID (cherry steps/set_chain_id.py:7-21) ------------------

  /** Drop any existing `chain_id`, append constant chain_id to every table.
    * uint64 in the reference → LongType here (widen convention §1.3: chain
    * ids are far below 2^63).
    */
  final case class SetChainId(chainId: Long) extends Step {
    def apply(spark: SparkSession, tables: Map[String, DataFrame]): Map[String, DataFrame] =
      tables.map { case (name, df) =>
        name -> df.drop("chain_id").withColumn("chain_id", lit(chainId))
      }
  }

  // --- T1 EVM_DECODE_EVENTS (cherry steps/evm_decode_events.py:9-35) --------

  /** Decode `inputTable` logs against one event signature into typed columns;
    * `hstack` appends all input columns (cherry's 1:1 cardinality contract —
    * decode is an expression, not a generator). Expects the conventional
    * column names topic1..topic3 + data (absent topics decode as null).
    */
  final case class EvmDecodeEvents(eventSignature: String,
                                   allowDecodeFail: Boolean = false,
                                   inputTable: String = "logs",
                                   outputTable: String = "decoded_logs",
                                   hstack: Boolean = false) extends Step {
    def apply(spark: SparkSession, tables: Map[String, DataFrame]): Map[String, DataFrame] = {
      val in = tables(inputTable)
      def topic(n: String): Column =
        if (in.columns.contains(n)) col(n) else lit(null).cast(BinaryType)
      val decoded = in.withColumn("__d", F.evm_decode_event(
          eventSignature, topic("topic1"), topic("topic2"), topic("topic3"),
          col("data"), allowDecodeFail))
      val dFields = decoded.select("__d.*").columns
      val out =
        if (hstack)
          decoded.select(col("__d.*") +: in.columns.map(col).toSeq: _*)
        else decoded.select(dFields.map(f => col(s"__d.$f")).toSeq: _*)
      tables + (outputTable -> out)
    }
  }

  // --- T2/T3 SVM_DECODE_* (cherry steps/svm_decode_instructions.py:9-35) ----

  /** Decode Borsh-encoded `data` of `inputTable` against a discriminator +
    * field spec. For SVM_DECODE_LOGS semantics pass discriminatorHex = ""
    * (cherry reuses the instruction path with a dummy discriminator,
    * `steps/svm_decode_logs.py:26-34`).
    */
  final case class SvmDecodeInstructions(discriminatorHex: String,
                                         fieldSpec: String,
                                         allowDecodeFail: Boolean = false,
                                         inputTable: String = "instructions",
                                         outputTable: String = "decoded_instructions",
                                         hstack: Boolean = false) extends Step {
    def apply(spark: SparkSession, tables: Map[String, DataFrame]): Map[String, DataFrame] = {
      val in = tables(inputTable)
      val decoded = in.withColumn("__d",
        F.svm_decode_instruction(discriminatorHex, fieldSpec, col("data"), allowDecodeFail))
      val dFields = decoded.select("__d.*").columns
      val out =
        if (hstack)
          decoded.select(col("__d.*") +: in.columns.map(col).toSeq: _*)
        else decoded.select(dFields.map(f => col(s"__d.$f")).toSeq: _*)
      tables + (outputTable -> out)
    }
  }

  /** T3 SVM_DECODE_LOGS (cherry `steps/svm_decode_logs.py:10-41`): decode
    * Borsh-encoded log payloads — exactly the instruction path with no
    * discriminator (the reference reuses the instruction schema-gen with a
    * dummy discriminator, `svm_decode_logs.py:26-34`; here the empty
    * discriminator means "skip 0 prefix bytes").
    */
  final case class SvmDecodeLogs(fieldSpec: String,
                                 allowDecodeFail: Boolean = false,
                                 inputTable: String = "logs",
                                 outputTable: String = "decoded_logs",
                                 hstack: Boolean = false) extends Step {
    def apply(spark: SparkSession, tables: Map[String, DataFrame]): Map[String, DataFrame] =
      SvmDecodeInstructions("", fieldSpec, allowDecodeFail, inputTable,
        outputTable, hstack)(spark, tables)
  }

  // --- T14 GLACIERS_EVENTS analog (cherry config.py:137-142 — declared but
  //     never dispatched): decode logs against a MULTI-signature ABI set ---

  /** Decode `inputTable` against several event signatures at once: each log
    * routes to the signature whose topic0 (keccak of the canonical form)
    * matches, decodes with that ABI, and the per-signature results union by
    * name (missing columns null — signatures rarely share fields). Adds
    * `event_name`. Spark-first shape: per-signature filtered decode plans
    * unioned — each branch's topic0 filter sits on the scan, and the union
    * is plan-level (no data copied).
    */
  final case class EvmDecodeMultiEvents(signatures: Seq[String],
                                        allowDecodeFail: Boolean = true,
                                        inputTable: String = "logs",
                                        outputTable: String = "decoded_logs")
      extends Step {
    def apply(spark: SparkSession, tables: Map[String, DataFrame]): Map[String, DataFrame] = {
      val in = tables(inputTable)
      def topic(n: String): Column =
        if (in.columns.contains(n)) col(n) else lit(null).cast(BinaryType)
      val branches = signatures.map { sig =>
        val parsed = graft.functions.Abi.parseEvent(sig)
        val t0 = graft.functions.Keccak.topic0(sig)
        val decoded = in.filter(col("topic0") === lit(t0))
          .withColumn("__d", F.evm_decode_event(
            sig, topic("topic1"), topic("topic2"), topic("topic3"),
            col("data"), allowDecodeFail))
        decoded.select(
          (lit(parsed.name).as("event_name") +:
            parsed.schema.fieldNames.map(f => col(s"__d.$f")).toSeq) ++
            in.columns.map(col): _*)
      }
      val out = branches.reduce(_.unionByName(_, allowMissingColumns = true))
      tables + (outputTable -> out)
    }
  }

  // --- T12 EVM_VALIDATE_BLOCK_DATA (declared-but-undispatched in cherry,
  //     config.py:120-125; semantics: block-hash chain continuity) ----------

  /** Append `valid` to the blocks table: hash-chain continuity via a lag
    * window over block_number (prev.hash == this.parent_hash). Scale note:
    * a single ordered window over the whole chain would serialize; partition
    * by a block-range bucket so the check parallelizes, at the cost of not
    * checking the (rare) bucket-boundary links — pass bucketSize <= 0 for
    * the exact single-partition check on bounded slices.
    */
  final case class EvmValidateBlockData(blocksTable: String = "blocks",
                                        numberCol: String = "block_number",
                                        hashCol: String = "hash",
                                        parentHashCol: String = "parent_hash",
                                        bucketSize: Long = 0L) extends Step {
    def apply(spark: SparkSession, tables: Map[String, DataFrame]): Map[String, DataFrame] =
      tables.map {
        case (name, df) if name == blocksTable =>
          val w =
            if (bucketSize > 0)
              Window.partitionBy(floor(col(numberCol) / bucketSize)).orderBy(col(numberCol))
            else Window.orderBy(col(numberCol))
          val prevHash = lag(col(hashCol), 1).over(w)
          name -> df.withColumn("valid",
            prevHash.isNull || prevHash === col(parentHashCol))
        case kv => kv
      }
  }

  // --- T10 POLARS-analog: whole-bundle user function ------------------------

  /** The engine's user-function escape hatch (cherry `steps/polars_step.py`):
    * an arbitrary bundle→bundle function over the DataFrame API.
    */
  final case class Fn(run: (SparkSession, Map[String, DataFrame]) => Map[String, DataFrame])
      extends Step {
    def apply(spark: SparkSession, tables: Map[String, DataFrame]): Map[String, DataFrame] =
      run(spark, tables)
  }

  // --- T11 DATAFUSION-analog: SQL-context step ------------------------------

  /** Register every table as a temp view, run user SQL, bind results
    * (cherry `steps/datafusion_step.py:8-28` — the SessionContext is
    * Catalyst itself here). `outputs` maps new/replaced table name → SQL.
    */
  final case class Sql(outputs: Map[String, String]) extends Step {
    def apply(spark: SparkSession, tables: Map[String, DataFrame]): Map[String, DataFrame] = {
      tables.foreach { case (name, df) => df.createOrReplaceTempView(name) }
      tables ++ outputs.map { case (name, q) => name -> spark.sql(q) }
    }
  }
}
