package graft

import org.apache.spark.sql.types._

/** The driver-gate OUTPUT CONTRACT, executable.
  *
  * The correctness gate dumps each query to parquet, loads it into pandas,
  * and `sort_values` every column before hashing. pandas cannot hash/sort
  * numpy-array cells, so an `array<…>` (or map/struct) output column turns
  * a CORRECT answer into an `err` row — exactly what happened to
  * q153_kmeans_step in round 8 (values verified right, gate red). This spec
  * pins the constraint at build time: every declared query's top-level
  * schema must be scalar-typed, so the failure class is dead rather than
  * re-discoverable one round at a time.
  *
  * The schema check is plan-analysis only (no job for plain queries; the
  * training-loop queries do their bounded driver work, same as any caller).
  */
class GateContractSpec extends SparkSpec {

  /** Column names whose type the driver's pandas sort cannot handle.
    * Everything the gate must sort has to be hashable/orderable in pandas:
    * numerics, strings, booleans, timestamps, dates, decimals, and binary
    * (python `bytes`) are; array/map/struct cells become numpy arrays /
    * dicts and raise `TypeError: unhashable type`.
    */
  def gateViolations(schema: StructType): Seq[String] =
    schema.fields.toSeq.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
                f.dataType.isInstanceOf[MapType] ||
                f.dataType.isInstanceOf[StructType] =>
        s"${f.name}: ${f.dataType.simpleString}"
    }

  test("checker rejects a planted array-output query") {
    import spark.implicits._
    val planted = Seq((1L, Seq(1L, 2L))).toDF("id", "sums")
    val v = gateViolations(planted.schema)
    assert(v.nonEmpty && v.head.startsWith("sums"), v)
    val plantedMap = Seq((1L, Map("a" -> 1L))).toDF("id", "m")
    assert(gateViolations(plantedMap.schema).nonEmpty)
    val ok = Seq((1L, "x", 2.0)).toDF("id", "s", "x")
    assert(gateViolations(ok.schema).isEmpty)
  }

  test("every declared query's output schema is gate-sortable (scalar columns only)") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val v = gateViolations(fn(spark, sf0001).schema)
      if (v.isEmpty) Nil else Seq(s"$name -> ${v.mkString(", ")}")
    }
    assert(bad.isEmpty,
      s"queries with pandas-unsortable output columns:\n${bad.mkString("\n")}")
  }
}
