package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).toSet // optional query-name filter (local iteration)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // the library's own session defaults (GraftSession) — the gate must
    // exercise the same AQE/broadcast/runtime-filter configs users run with
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .appName("graft-verify")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // A query that throws must NOT silently vanish from the round's
    // correctness report (an all-pass report that omits regressed queries
    // masks the regression). Record every failure and exit nonzero.
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // Output-type lint (VERDICT r11 #2a, rule + rationale in GateTypes):
    // a declared query emitting a type the driver hash is not
    // empirically stable on (DECIMAL caused the r11 regression) fails
    // the LOCAL gate loudly instead of shipping green locally and red
    // at the driver.
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val bad = GateTypes.unstableColumns(name, df.schema)
        if (bad.nonEmpty) {
          val msg = "unstable output type(s) for the driver hash: " +
            bad.mkString(", ") +
            " — snap to BIGINT/DOUBLE/STRING at the query edge " +
            "(StatsFunctions.snapLong) or whitelist in GateTypes with " +
            "a citation"
          System.err.println(s"[verify] $name failed: $msg")
          failures(name) = msg
        } else df.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failures(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val failJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/failures.json"), failJson)
    spark.stop()
    if (failures.nonEmpty) {
      System.err.println(
        s"[verify] ${failures.size} quer${if (failures.size == 1) "y" else "ies"} FAILED: ${failures.keys.mkString(", ")}")
      sys.exit(1)
    }
  }
}
