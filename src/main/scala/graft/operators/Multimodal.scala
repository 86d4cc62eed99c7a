package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (driver brief): image/audio/video as opaque
  * `binary` columns with typed metadata, processed per-partition so one task
  * owns one batch of blobs — the Spark-side shape of a decode/feature
  * pipeline over 100 TB of media.
  *
  * The decode kernels themselves are STUBBED with a deterministic fake (this
  * container has no image/audio codecs — see the driver brief); everything
  * around them — schema, partitioning, batch iteration, output contract — is
  * real and tested. Swapping in a real decoder is replacing the body of one
  * function.
  *
  * Reference analogue: per-frame video metadata + OpenCV frame extraction
  * (`aeon/dj_pipeline/utils/video.py:13-62`), kept behind a UDF boundary
  * exactly as the reference keeps pixels out of the relational layer.
  */
object Multimodal {

  /** Output schema of the fake feature extractor: per-blob typed metadata +
    * a fixed-width feature vector.
    */
  val featureSchema: StructType = StructType(Seq(
    // nullable: a null blob yields null width/height/features (P5 null-row
    // discipline — absent media is a row, not a dropped record).
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_bytes", LongType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = true)))

  /** STUB decode kernel — deterministic fake standing in for a real image
    * decoder: "dimensions" derived from a byte hash, "features" a seeded
    * per-blob byte histogram projection. Replace the body with e.g. a JNI
    * codec call; the partition iteration and schema stay identical.
    */
  private def fakeDecode(bytes: Array[Byte], dim: Int): Row = {
    val h = java.util.Arrays.hashCode(bytes)
    val width = 64 + math.floorMod(h, 1024)
    val height = 64 + math.floorMod(h >> 10, 1024)
    val feats = Array.tabulate(dim) { i =>
      var acc = 0L
      var j = i
      while (j < bytes.length) { acc += (bytes(j) & 0xFF); j += dim }
      (acc % 1000).toFloat / 1000.0f
    }
    Row(width, height, bytes.length.toLong, feats)
  }

  /** Decode/feature-extract a binary column per partition. Keeps all input
    * columns and appends `featureSchema`'s fields. One blob is decoded at a
    * time per task — media batches stream through without materializing the
    * whole partition (the 100 TB discipline: bound memory by blob, not by
    * partition).
    */
  def extractFeatures(df: DataFrame, binaryCol: String, dim: Int = 16): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ featureSchema.fields)
    val binIdx = inSchema.fieldIndex(binaryCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val extra =
          if (bytes == null) Row(null, null, 0L, null)
          else fakeDecode(bytes, dim)
        Row.fromSeq(r.toSeq ++ extra.toSeq)
      }
    }(enc)
  }

  /** Deterministic frame sampling over a video-like blob column: emit one row
    * per sampled frame index (the `retrieve_video_frames` slice contract,
    * `utils/video.py:29-46`) with a byte-slice "frame" — STUB standing in for
    * codec frame extraction; the explode/posexplode shape is the real thing.
    */
  def sampleFrames(df: DataFrame, binaryCol: String, idCols: Seq[String],
                   everyNth: Int = 10, maxFrames: Int = 8): DataFrame = {
    require(everyNth > 0 && maxFrames > 0)
    // Frame count proxy: blob length / 1024 (stub "frame size"); real codecs
    // replace this with container metadata. The plumbing — per-row sequence +
    // posexplode, never a driver loop — is the scale path.
    val nFrames = least(
      greatest(floor(length(col(binaryCol)) / 1024).cast("int"), lit(1)),
      lit(everyNth * maxFrames))
    df.select((idCols.map(col) :+ col(binaryCol) :+ nFrames.as("__n")): _*)
      .select((idCols.map(col) :+ col(binaryCol) :+
        posexplode(sequence(lit(0), col("__n") - 1, lit(everyNth)))
          .as(Seq("frame_pos", "frame_index"))): _*)
      .withColumn("frame_bytes",
        expr(s"substring($binaryCol, frame_index * 1024 + 1, 1024)"))
      .drop(binaryCol, "frame_pos")
  }

  /** Synthesize an opaque binary column from any string column — the test/
    * bench harness for the multimodal path in this codec-less container.
    */
  def synthesizeBlobs(df: DataFrame, fromCol: String, blobCol: String = "blob",
                      repeat: Int = 64): DataFrame =
    df.withColumn(blobCol,
      unbase64(base64(encode(repeat_string(col(fromCol), repeat), "UTF-8"))))

  private def repeat_string(c: org.apache.spark.sql.Column, n: Int) =
    concat_ws("", (0 until n).map(_ => c): _*)
}
