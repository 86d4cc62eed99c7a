package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs: one JVM-wide session (tests fork
  * into a single JVM via sbt `Test / fork`), small shuffle partition count so
  * the suite stays fast on the CI-sized machine.
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  lazy val sf0001 = "/root/testdata/sf0.001"
}

object SparkSpec {
  lazy val session: SparkSession = {
    // the library's session defaults, downsized for the test machine
    val s = GraftSession.builder("local[4]", shufflePartitions = 4)
      .appName("graft-test")
      .config("spark.sql.warehouse.dir", // keep saveAsTable out of the repo
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
