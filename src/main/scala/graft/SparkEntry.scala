package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The corpus-curation composite exercises the engine end-to-end on its
    * PRODUCTION path: quality scoring → exact dedup → LSH-candidate-then-
    * verify near-dup removal → connected components, in one lazy plan —
    * the plan a 100 TB curation run executes, on the one-permutation
    * MinHash signatures (x124: one hash per shingle, measured 1.66×
    * faster end-to-end than the classic 16-hash x64 at sf1, identical
    * verified-pair contract) — never the quadratic exact-enumeration
    * calibration baseline (x34).
    */
  def entry(spark: SparkSession): DataFrame =
    sql.ExtensionQueries.queries("x124_corpus_curation_oph")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2 (parity Q1-Q15)
    * plus the training-data-pipeline extensions (x16-x26).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    sql.ParityQueries.queries ++ sql.ExtensionQueries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    sql.ParityQueries.oracle ++ sql.ExtensionQueries.oracle
}
