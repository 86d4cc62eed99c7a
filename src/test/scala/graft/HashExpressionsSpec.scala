package graft

import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** The codegen'd portable-hash kernels must be bit-identical to the
  * hex-string formulation they replace — that formulation IS the wire
  * contract (it's what the DuckDB oracles execute).
  */
class HashExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def referenceH60(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")
  private def referenceH28(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 16, 7), 16, 10).cast("long")

  test("digest-byte kernels equal the hex-string formulation on varied input") {
    val samples = Seq("", "abc", "graft", "a b c d e",
      "Ünïcødé — ünįcödë tëxt 🎉", "0:3:17", "x" * 500) ++
      (0 until 200).map(i => s"doc $i body ${i * 37}")
    val df = samples.toDF("s")
    val mismatches = df.select(
        HashFunctions.portableHash60(col("s")).as("k60"),
        referenceH60(col("s")).as("r60"),
        HashFunctions.portableHash28(col("s")).as("k28"),
        referenceH28(col("s")).as("r28"))
      .filter(col("k60") =!= col("r60") || col("k28") =!= col("r28"))
    assert(mismatches.count() == 0)
  }

  test("interpreted eval path matches codegen (and nulls stay null)") {
    // force the interpreted path through a filter on a literal expression
    val row = spark.sql(
      "SELECT 1").select(
        HashFunctions.portableHash60(lit("abc")).as("h"),
        HashFunctions.portableHash28(lit("abc")).as("h2"),
        HashFunctions.portableHash60(lit(null).cast("string")).as("n"))
      .head()
    assert(row.getLong(0) == 648541476951500027L)
    assert(row.getLong(1) == 14063167L)
    assert(row.isNullAt(2))
  }

  test("fused pair kernel equals the two standalone slices on varied input") {
    val samples = Seq("", "abc", "Ünïcødé 🎉", "x" * 500) ++
      (0 until 200).map(i => s"shingle $i text ${i * 13}")
    val mismatches = samples.toDF("s").select(
        HashFunctions.portableHashPair(col("s")).as("p"),
        HashFunctions.portableHash60(col("s")).as("h1"),
        HashFunctions.portableHash60b(col("s")).as("h2"))
      .filter(col("p.h1") =!= col("h1") || col("p.h2") =!= col("h2"))
    assert(mismatches.count() == 0)
    // null in -> null struct out (not a struct of nulls)
    val n = spark.sql("SELECT 1")
      .select(HashFunctions.portableHashPair(lit(null).cast("string")).as("p"))
      .head()
    assert(n.isNullAt(0))
  }

  // SQL registration of portable_hash60/28 is covered by
  // LayoutExtensionsSpec's extensions-session test (the shared test session
  // deliberately runs without GraftExtensions).
}
