package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.PartitionReader

/** Size-bounded file bin-packing shared by the `graft-clock` / `graft-avi` /
  * `graft-zarr` V2 sources.
  *
  * Each of these sources naturally reads one FILE (or zarr chunk) per task —
  * the right granularity for hour-sized chunk files, but a scheduler
  * bottleneck when a directory holds millions of small files (every file
  * becomes a task launch, and the plan carries one partition object each).
  * Packing files into byte-budgeted partitions is parquet's
  * `maxPartitionBytes` defense, applied to these formats via a
  * `maxPartitionBytes` read option.
  *
  * Per-file pruning is UNCHANGED by packing: the packed reader drives the
  * per-file readers strictly one at a time, and each still applies its own
  * skip logic (the clock-range 16-byte check, the headers-only AVI walk;
  * zarr chunk-range pruning happens before packing even sees the list).
  * Memory per task is one open reader, exactly as unpacked.
  */
private[graft] object Packing {

  /** Parquet's default `spark.sql.files.maxPartitionBytes`. */
  val DefaultMaxPartitionBytes: Long = 128L * 1024 * 1024

  def maxPartitionBytes(opt: Option[String]): Long = {
    val cap = opt.map(_.toLong).getOrElse(DefaultMaxPartitionBytes)
    require(cap > 0, s"maxPartitionBytes must be positive (got $cap)")
    cap
  }

  /** Greedy in-order pack of (item, weight) into bins of capacity `cap`; an
    * item alone may exceed `cap` (it gets its own bin, never splits).
    * Listing order is preserved, so consecutive files — typically
    * time-adjacent chunks of one stream — stay in one task, the locality a
    * sorted listing gives parquet's packing too.
    */
  def pack[T](items: Seq[(T, Long)], cap: Long): Seq[Seq[T]] = {
    val bins = Seq.newBuilder[Seq[T]]
    var cur = List.empty[T]
    var size = 0L
    items.foreach { case (item, w) =>
      if (cur.nonEmpty && size + w > cap) {
        bins += cur.reverse; cur = Nil; size = 0L
      }
      cur = item :: cur
      size += w
    }
    if (cur.nonEmpty) bins += cur.reverse
    bins.result()
  }
}

/** Drives per-file readers sequentially — one open at a time — presenting
  * them as a single [[PartitionReader]] over the packed partition.
  */
private[sources] class PackedPartitionReader[P](
    parts: Iterator[P], mkReader: P => PartitionReader[InternalRow])
    extends PartitionReader[InternalRow] {

  private var cur: PartitionReader[InternalRow] = _

  override def next(): Boolean = {
    var decided = false
    var has = false
    while (!decided) {
      if (cur == null) {
        if (parts.hasNext) cur = mkReader(parts.next())
        else { decided = true; has = false }
      } else if (cur.next()) { decided = true; has = true }
      else { cur.close(); cur = null }
    }
    has
  }

  override def get(): InternalRow = cur.get()

  override def close(): Unit = if (cur != null) { cur.close(); cur = null }
}
