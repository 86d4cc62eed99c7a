package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory: one entry per implemented operator
  * from SURVEY.md §2 (+ the training-data pipeline pack). `oracleSql` carries
  * the DuckDB-equivalent SQL for the driver's hash compare; queries absent
  * from it are non-SQL-expressible and get the weaker rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_join_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  val packs: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (RelationalQueries.queries, RelationalQueries.oracles),
      (WindowQueries.queries, WindowQueries.oracles),
      (DomainQueries.queries, DomainQueries.oracles),
      (PipelineQueries.queries, PipelineQueries.oracles),
      (SystemQueries.queries, SystemQueries.oracles))

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    packs.map(_._2).reduce(_ ++ _)
}
