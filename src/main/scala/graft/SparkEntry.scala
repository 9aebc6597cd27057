package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * One `queries` entry per implemented operator from SURVEY.md §2.2; each
  * SQL-expressible one also has an `oracleSql` entry (identical column
  * aliases — the driver's DuckDB compare is column-name-sensitive).
  */
object SparkEntry {
  /** Full registry, one Seq per SURVEY §2.2 category. */
  def all: Seq[Q] =
    ScanQueries.defs ++ AggQueries.defs ++ JoinQueries.defs ++
      SubqQueries.defs ++ WindowQueries.defs ++ FnQueries.defs ++
      LlmQueries.defs ++ TextQueries.defs ++ VectorQueries.defs ++
      StreamQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AggQueries.defs.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
