package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.unix_micros
import org.apache.spark.sql.types.TimestampType

/** Timestamp input tolerance for the time operators.
  *
  * Parquet written with `TIMESTAMP(isAdjustedToUTC=false)` reads back as
  * `TIMESTAMP_NTZ` under Spark 4's default inference, and `unix_micros`
  * (plus every epoch-math operator built on it) accepts only `TIMESTAMP` —
  * a type-strictness break at the file boundary that took out four shipped
  * operators in round 11 when the fixtures flipped encodings. The engine
  * must not depend on a session flag to survive that, so every epoch-micros
  * computation funnels through here: NTZ inputs are cast to `TIMESTAMP`
  * (interpreted in the session timezone, which graft pins to UTC — the
  * epoch value is then bit-identical to the stored micros), and
  * already-`TIMESTAMP` inputs are untouched (Catalyst's SimplifyCasts
  * removes the same-type cast, so green plans are byte-identical to the
  * pre-hardening ones).
  */
object TsCompat {

  /** The column as session-zone `TIMESTAMP`, whatever timestamp flavor it
    * arrived as. No-op (cast folded away) when already `TIMESTAMP`.
    */
  def utc(c: Column): Column = c.cast(TimestampType)

  /** Epoch microseconds of a `TIMESTAMP` or `TIMESTAMP_NTZ` column — the
    * NTZ-tolerant spelling of `unix_micros(c)`.
    */
  def micros(c: Column): Column = unix_micros(utc(c))
}
