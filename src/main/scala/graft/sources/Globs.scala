package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Driver-side glob expansion for the V1 file readers.
  *
  * Spark's V1 `DataSource.resolveRelation` probes the LITERAL path string for
  * a streaming-sink metadata directory before globbing, so every glob-path
  * read logs a `FileStreamSink: Assume no metadata directory` WARN with a
  * FileNotFoundException stack — pure noise that buries real warnings in
  * PlanAudit/bench output. Expanding the glob here (the same driver-side
  * `fs.globStatus` Spark itself runs next in `checkAndGlobPathIfNecessary`)
  * hands the reader concrete paths, which probe cleanly. No extra listing
  * cost at any scale; an empty expansion fails loudly, same contract as
  * Spark's own "Path does not exist".
  */
object Globs {
  private val globChars = "{}[]*?\\"

  def isGlob(pattern: String): Boolean = pattern.exists(globChars.contains(_))

  /** Concrete paths matching `pattern`; the pattern itself if it has no glob
    * characters (plain files/dirs keep Spark's native handling).
    */
  def expand(spark: SparkSession, pattern: String): Seq[String] = {
    if (!isGlob(pattern)) return Seq(pattern)
    val p = new Path(pattern)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Nil)
    require(matched.nonEmpty, s"Path glob matched no files: $pattern")
    matched.map(_.getPath.toString)
  }
}
