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

  test("checker rejects a planted DECIMAL-output query (VERDICT r11 #1)") {
    import spark.implicits._
    // the exact shape that shipped green locally and red at the driver in
    // r11: values identical both sides, output type decimal(38,0)
    val planted = Seq((1L, BigDecimal(-50661))).toDF("n", "num")
      .select($"n", $"num".cast("decimal(38,0)").as("num"))
    val v = GateTypes.unstableColumns("planted", planted.schema)
    assert(v.nonEmpty && v.head.startsWith("num"), v)
    // and the snapped form passes
    val snapped = planted.select($"n",
      graft.functions.StatsFunctions.snapLong($"num").as("num"))
    assert(GateTypes.unstableColumns("planted", snapped.schema).isEmpty)
  }

  test("snapLong is exact in range and fails LOUDLY out of Long range") {
    import spark.implicits._
    val ok = Seq(BigDecimal(Long.MaxValue), BigDecimal(Long.MinValue),
        BigDecimal(-50661), BigDecimal(0))
      .toDF("v").select($"v".cast("decimal(38,0)").as("v"))
      .select(graft.functions.StatsFunctions.snapLong($"v").as("v"))
      .as[Long].collect().toSet
    assert(ok === Set(Long.MaxValue, Long.MinValue, -50661L, 0L))
    val boom = intercept[Exception] {
      Seq(BigDecimal(Long.MaxValue) + 1)
        .toDF("v").select($"v".cast("decimal(38,0)").as("v"))
        .select(graft.functions.StatsFunctions.snapLong($"v").as("v"))
        .collect()
    }
    def chain(e: Throwable): Seq[Throwable] =
      e +: Option(e.getCause).toSeq.flatMap(chain)
    assert(chain(boom).exists(c =>
      Option(c.getMessage).exists(_.contains("snapLong"))), boom.getMessage)
  }

  test("every declared query's output schema is gate-sortable AND hash-type-stable") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val schema = fn(spark, sf0001).schema
      val v = gateViolations(schema) ++ GateTypes.unstableColumns(name, schema)
      if (v.isEmpty) Nil else Seq(s"$name -> ${v.mkString(", ")}")
    }
    assert(bad.isEmpty,
      s"queries with gate-breaking output columns:\n${bad.mkString("\n")}")
  }
}
