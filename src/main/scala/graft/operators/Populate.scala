package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** The incremental derivation ("populate") engine — SURVEY.md §3.1 as a small
  * library.
  *
  * Reference: DataJoint's `Table.populate()` loops over
  * `key_source - already-done-keys` and calls `make(key)` per key
  * (`aeon/dj_pipeline/utils/streams_maker.py:202-264`,
  * `acquisition.py:243-245, 516-518`). Here the per-key loop disappears: the
  * same transformation runs set-at-a-time as one Spark job —
  * `newKeys = keySource ⟕̸ existing` (left_anti), `make(newKeys)`, idempotent
  * append.
  *
  * Scale: the anti-join shuffles only the PK columns (project before join);
  * when the done-keys side is small it broadcasts. The anti-join re-check at
  * write time is the Spark-native analogue of `skip_duplicates=True`
  * (`acquisition.py:547-549`) and makes RETRIES of a single writer
  * idempotent; see [[appendIdempotent]] for the (non-)guarantee under
  * concurrent writers.
  */
object Populate {

  /** Keys still to do: declared upstream keys minus already-materialized keys
    * (J7 anti join — THE core primitive, SURVEY.md §2.3).
    */
  def newKeys(keySource: DataFrame, existing: Option[DataFrame], pk: Seq[String]): DataFrame =
    existing match {
      case Some(done) =>
        keySource.join(done.select(pk.map(col): _*).distinct(), pk, "left_anti")
      case None => keySource
    }

  /** One populate step: compute rows for not-yet-done keys.
    * `make` is a pure DataFrame→DataFrame derivation (the `make()` body).
    */
  def derive(keySource: DataFrame, existing: Option[DataFrame], pk: Seq[String])
            (make: DataFrame => DataFrame): DataFrame =
    make(newKeys(keySource, existing, pk))

  /** Idempotent append to a parquet table path: anti-join against current
    * contents (skip_duplicates), then append. Returns rows written.
    *
    * Only a genuinely-absent table skips the dedup check; any other read
    * failure (transient FS error, permissions, corrupt footer) rethrows —
    * treating those as "empty table" would silently break skip_duplicates.
    *
    * Guarantee: idempotent under RETRIES of a single writer (re-running the
    * same populate never duplicates rows). NOT safe under concurrent writers
    * to the same table — plain parquet has no atomic read-check-append; the
    * reference used MySQL transactions for that (`acquisition.py:547-549`).
    * Run one populate per table at a time (the reference's populate loop is
    * likewise serialized per table via its job reservation table).
    */
  /** Read a parquet table that may not exist yet. ONLY a genuinely-absent
    * path maps to None; any other read failure (transient FS error,
    * permissions, corrupt footer) rethrows — treating those as "empty
    * table" would silently break skip_duplicates for every caller.
    */
  def readIfExists(spark: org.apache.spark.sql.SparkSession,
                   tablePath: String): Option[DataFrame] =
    try Some(spark.read.parquet(tablePath)) catch {
      case _: java.io.FileNotFoundException => None
      case e: org.apache.spark.sql.AnalysisException
          if e.getErrorClass != null &&
            e.getErrorClass.startsWith("PATH_NOT_FOUND") => None
    }

  def appendIdempotent(result: DataFrame, tablePath: String, pk: Seq[String]): Long = {
    val spark = result.sparkSession
    val existing = readIfExists(spark, tablePath)
    val fresh = existing match {
      case Some(e) => result.join(e.select(pk.map(col): _*).distinct(), pk, "left_anti")
      case None    => result
    }
    val cached = fresh.cache()
    try {
      val n = cached.count()
      if (n > 0) cached.write.mode(SaveMode.Append).parquet(tablePath)
      n
    } finally cached.unpersist()
  }
}
