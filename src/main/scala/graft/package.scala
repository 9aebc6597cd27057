package object graft {
  import org.apache.spark.sql.{DataFrame, SparkSession}

  /** One declared operator from SURVEY.md §2.2: the Spark implementation and,
    * when SQL-expressible, the equivalent DuckDB oracle SQL (same column
    * names/aliases on both sides — the driver's compare is name-sensitive).
    */
  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String] = None)
}
