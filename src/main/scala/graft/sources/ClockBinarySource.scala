package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.{Map => JMap}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for the flat uint64 clock-binary family (S4/S10 as a REAL
  * source, not a reader function): `spark.read.format("graft-clock")
  * .load(glob)` yields `(file, row_index, clock)` with
  *
  *  - **filter pushdown on `clock`**: range/equality predicates reach the
  *    scan (visible as `PushedFilters` in `.explain`) and each file is
  *    admitted or skipped on its first/last uint64 alone — two positioned
  *    8-byte reads, the distributed form of the reference's O(1) interval
  *    check (`aeon/dj_pipeline/utils/onix_imu.py:112-130`) — before any
  *    decode. Pushed filters are also re-applied by Spark row-wise
  *    (returned as residuals), so for files honoring the format contract
  *    pushdown changes IO only, never results.
  *
  * FORMAT CONTRACT (same as the reference's): clock files are written
  * monotonically by the acquisition system, so first/last bound every value.
  * A corrupted file with interior values outside [first, last] can be
  * wrongly skipped — the same trust parquet places in writer-produced
  * footer stats. Files must be < 2 GiB (one buffered decode per file; the
  * acquisition writes hour-sized chunks, orders of magnitude smaller).
  *  - **column pruning**: unprojected columns are never materialized
  *    (`row_index`-free scans skip the per-row id arithmetic, `clock`-only
  *    scans skip the UTF8 file string).
  *
  * Planning lists files (metadata only); all IO — the 16 stat bytes and any
  * decode — happens in executors, one partition per file. This is the
  * idiomatic-Spark upgrade over `binaryFile` + `mapPartitions`
  * ([[BronzeIngest.flatBinaryU64]], kept for glob-free embedding in larger
  * ingest flows): queries compose with plain `filter`, and Catalyst sees a
  * scan it can reason about.
  */
class ClockBinarySource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-clock"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ClockBinarySource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "graft-clock requires a path: spark.read.format(\"graft-clock\").load(<glob>)")
    new ClockBinaryTable(path)
  }
}

object ClockBinarySource {
  val Schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("row_index", LongType, nullable = false),
    StructField("clock", LongType, nullable = false)))
}

private[sources] class ClockBinaryTable(pathGlob: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft-clock($pathGlob)"
  override def schema(): StructType = ClockBinarySource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ClockScanBuilder(pathGlob)
}

private[sources] class ClockScanBuilder(pathGlob: String)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = ClockBinarySource.Schema
  private var accepted: Array[Filter] = Array.empty
  private var lo: Long = Long.MinValue
  private var hi: Long = Long.MaxValue

  /** Tighten [lo, hi] from a filter; true when the filter constrains only
    * the clock column (and therefore contributed to the file-skip bounds).
    */
  private def absorb(f: Filter): Boolean = f match {
    case GreaterThan("clock", v: Long) =>
      if (v != Long.MaxValue) lo = math.max(lo, v + 1); true
    case GreaterThanOrEqual("clock", v: Long) => lo = math.max(lo, v); true
    case LessThan("clock", v: Long) =>
      if (v != Long.MinValue) hi = math.min(hi, v - 1); true
    case LessThanOrEqual("clock", v: Long) => hi = math.min(hi, v); true
    case EqualTo("clock", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v); true
    case And(l, r) =>
      val la = absorb(l); val ra = absorb(r); la && ra
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    accepted = filters.filter(absorb)
    filters // everything stays residual: Spark re-applies exact row predicates
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new ClockScan(pathGlob, required, accepted, lo, hi)
}

private[sources] class ClockScan(pathGlob: String, required: StructType,
                                 pushed: Array[Filter], lo: Long, hi: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-clock($pathGlob) clockRange=[$lo,$hi] " +
      s"PushedFilters: [${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    // metadata-only listing; every byte of file IO happens in executors.
    // A path resolving to a DIRECTORY expands one level to its files (the
    // binaryFile convention) — silently planning zero partitions for a
    // directory load would return empty data with no signal.
    val spark = SparkSession.active
    val p = new org.apache.hadoop.fs.Path(pathGlob)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statuses = Option(fs.globStatus(p)).getOrElse(Array.empty)
    statuses
      .flatMap(st => if (st.isDirectory) fs.listStatus(st.getPath) else Array(st))
      .filter(_.isFile)
      .map { st =>
        require(st.getLen < Int.MaxValue.toLong,
          s"graft-clock file ${st.getPath} is ${st.getLen} bytes; the format " +
            "contract caps files below 2 GiB (hour-sized chunks)")
        ClockFilePartition(st.getPath.toString, st.getLen): InputPartition
      }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableHadoopConf(
      SparkSession.active.sparkContext.hadoopConfiguration)
    new ClockReaderFactory(required.fieldNames, lo, hi, conf)
  }
}

private[sources] case class ClockFilePartition(path: String, length: Long)
    extends InputPartition

private[sources] class ClockReaderFactory(
    requiredCols: Array[String], lo: Long, hi: Long,
    conf: SerializableHadoopConf) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[ClockFilePartition]
    new ClockPartitionReader(part, requiredCols, lo, hi, conf)
  }
}

/** One file per partition. If the scan carries clock bounds, the reader
  * first checks the file's first/last uint64 (two 8-byte positioned reads);
  * a disjoint file is skipped without decoding a single payload byte.
  */
private[sources] class ClockPartitionReader(
    part: ClockFilePartition, requiredCols: Array[String],
    lo: Long, hi: Long, conf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {

  private val nRows = part.length / 8
  private val fileUtf8 = UTF8String.fromString(part.path)
  private val hadoopPath = new org.apache.hadoop.fs.Path(part.path)
  // resolve column extraction to ordinals ONCE — get() is the per-row hot
  // path and must not string-match names or allocate intermediates
  private val FileCol = 0; private val RowIndexCol = 1; private val ClockCol = 2
  private val colCodes: Array[Int] = requiredCols.map {
    case "file" => FileCol
    case "row_index" => RowIndexCol
    case "clock" => ClockCol
  }

  private var data: ByteBuffer = _
  private var idx: Long = -1
  private var exhausted = nRows == 0
  // one reusable row per reader — downstream copies (unsafe projection)
  // before buffering, the standard DSv2 reader pattern
  private val values = new Array[Any](colCodes.length)
  private val row = new GenericInternalRow(values)

  private def overlaps(): Boolean = {
    if (lo == Long.MinValue && hi == Long.MaxValue) return true
    val (first, last) = ClockFormat.readFirstLast(hadoopPath, nRows, conf.value)
    math.max(first, last) >= lo && math.min(first, last) <= hi
  }

  private def load(): Unit = {
    if (!overlaps()) { exhausted = true; return }
    val in = hadoopPath.getFileSystem(conf.value).open(hadoopPath)
    try {
      val bytes = new Array[Byte](part.length.toInt)
      in.readFully(0L, bytes)
      data = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    } finally in.close()
  }

  override def next(): Boolean = {
    if (exhausted) return false
    if (data == null && idx < 0) load()
    if (exhausted) return false
    idx += 1
    idx < nRows
  }

  override def get(): InternalRow = {
    var i = 0
    while (i < colCodes.length) {
      values(i) = colCodes(i) match {
        case FileCol     => fileUtf8
        case RowIndexCol => idx
        case ClockCol    => data.getLong((idx * 8).toInt)
      }
      i += 1
    }
    row
  }

  override def close(): Unit = { data = null }
}

/** The clock-binary FORMAT contract in one place: little-endian uint64
  * samples, written monotonically, so the first and last value bound every
  * value in the file — the basis of every O(1) interval check (both the V2
  * reader's skip and [[BronzeIngest.clockFileStats]]).
  */
private[sources] object ClockFormat {
  /** Positioned reads of the first and last uint64 (two 8-byte reads). */
  def readFirstLast(path: org.apache.hadoop.fs.Path, nRows: Long,
                    conf: org.apache.hadoop.conf.Configuration): (Long, Long) = {
    val in = path.getFileSystem(conf).open(path)
    try {
      val buf = new Array[Byte](8)
      in.readFully(0L, buf)
      val first = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN).getLong
      in.readFully((nRows - 1) * 8, buf)
      val last = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN).getLong
      (first, last)
    } finally in.close()
  }
}
