package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins (SURVEY.md §4 "Partitioning &
  * shuffle": big fact↔fact joins shuffle on their keys UNLESS both sides are
  * pre-bucketed on the join key — then the join is a zero-shuffle sort-merge
  * over aligned buckets).
  *
  * At 100 TB this is the difference between re-shuffling the fact table on
  * every join and paying the layout cost once at write time: orders⋈lineitem
  * style joins (or chunk⋈stream by device) read co-located buckets. The spec
  * asserts the physical property: the executed join plan of two tables
  * bucketed on the same key contains NO ShuffleExchange.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (parquet). `buckets` should be
    * sized so one bucket of the larger table fits an executor's memory
    * comfortably at target scale.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    sortBy: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, key)
    sortBy.fold(w)(s => w.sortBy(s)).saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata comes from the catalog —
    * reading the files directly would lose it and reintroduce the shuffle).
    */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
