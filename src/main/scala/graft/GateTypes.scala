package graft

import org.apache.spark.sql.types._

/** The driver correctness gate's OUTPUT-TYPE contract (VERDICT r11 #2a).
  *
  * Eleven rounds of driver artifacts establish which output types the
  * driver's value hash treats stably: BIGINT/INT (widths interchange),
  * DOUBLE, STRING, BOOLEAN, TIMESTAMP, DATE — and nothing else. Raw
  * DECIMAL columns hash-mismatch even when every value is identical on
  * both sides (the r11 q207/q215/q216/q231/q246 regression: rows_match
  * and schema_match true, hash_match false, values byte-identical as
  * typed arrow). So: DECIMAL(38,0) stays the INTERNAL arithmetic type
  * for overflow-proof `n·Σx²` products, and declared queries snap the
  * emitted statistic to BIGINT at the query edge
  * ([[graft.functions.StatsFunctions.snapLong]] — loud range guard, no
  * silent wrap).
  *
  * [[graft.Verify]] enforces this on every declared query before dumping
  * it, so an unstable output type fails the LOCAL gate loudly instead of
  * shipping green locally and red at the driver; GateContractSpec makes
  * the same check (plus a planted-violation case) a build failure.
  */
object GateTypes {

  /** Types the driver hash is empirically stable on. Arrays thereof are
    * value-stable too but separately rejected at top level by the gate's
    * pandas sort (GateContractSpec's array/map/struct rule).
    */
  def stable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | DoubleType |
         FloatType | StringType | BooleanType | TimestampType |
         DateType => true
    case ArrayType(e, _) => stable(e)
    case _ => false
  }

  /** `(query, column)` pairs exempt from the lint — each must cite the
    * driver artifact proving that query+type hashes stably. Empty: no
    * such proof exists for any non-stable type.
    */
  val whitelist: Set[(String, String)] = Set.empty

  /** Violations in a declared query's output schema, formatted for the
    * failure report; empty = safe to dump.
    */
  def unstableColumns(queryName: String, schema: StructType): Seq[String] =
    schema.fields.toSeq.collect {
      case f if !stable(f.dataType) && !whitelist((queryName, f.name)) =>
        s"${f.name}: ${f.dataType.sql}"
    }
}
