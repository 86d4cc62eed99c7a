package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JSON metadata source (SURVEY.md S8): rig-config files —
  * `Metadata.json` (nested rig config, `acquisition.py:373-399`),
  * `Metadata.yml` (JSON content despite the extension,
  * `utils/ephys_utils.py:355-372`), camera blob-tracking regions
  * (`utils/load_metadata.py:606-665`), probe assignments
  * (`ephys_utils.py:257-313`).
  *
  * Spark shape: `spark.read.json(multiLine)` + generic traversal. The
  * reference walks these dicts with Python; here nested structures flatten
  * into (path, value) rows so downstream config-hash aggregates (A7) and
  * device discovery are plain DataFrame ops — and schema drift in rig files
  * cannot break a static schema (everything lands as strings).
  */
object MetadataSource {

  /** Read one-or-many multiline JSON metadata files; one row per file with
    * `file` + the inferred nested struct. */
  def readJson(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.option("multiLine", "true")
      .json(Globs.expand(spark, pathGlob): _*)
      .withColumn("file", input_file_name())

  /** Flatten a nested metadata document into (file, path, value) rows —
    * `a.b.c` dotted paths, scalars stringified. The generic analogue of
    * `flatten_rig_devices` (`load_metadata.py:606-631`): downstream joins
    * and config hashes need flat key/value pairs, not nested structs.
    *
    * JSON is re-parsed into a MapType per level driver-free: the document is
    * serialized once per row (`to_json`) and walked with a small recursive
    * flatten over `MapType(String, String)` retries. Arrays index as `[i]`.
    */
  def flatten(meta: DataFrame, structCol: String = "*"): DataFrame = {
    val spark = meta.sparkSession
    import spark.implicits._
    val jsonified = meta.select(col("file"),
      to_json(struct(meta.columns.toIndexedSeq.filter(_ != "file").map(col): _*)).as("doc"))
    jsonified.flatMap { row =>
      val file = row.getString(0)
      flattenJson(row.getString(1)).map { case (p, v) => (file, p, v) }
    }.toDF("file", "path", "value")
  }

  /** Shared parser instance: ObjectMapper is thread-safe for readTree and
    * expensive to construct — one per JVM (serialized into tasks via the
    * object), never one per row.
    */
  @transient private lazy val jsonMapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  /** Pure-Scala JSON flatten (runs per-row inside tasks; documents are KBs).
    * Uses Spark's shaded Jackson — no extra dependency.
    */
  private[graft] def flattenJson(doc: String): Seq[(String, String)] = {
    import com.fasterxml.jackson.databind.JsonNode
    def walk(node: JsonNode, prefix: String): Seq[(String, String)] = {
      import scala.jdk.CollectionConverters._
      if (node.isObject) {
        node.properties().asScala.toSeq.flatMap { e =>
          val p = if (prefix.isEmpty) e.getKey else s"$prefix.${e.getKey}"
          walk(e.getValue, p)
        }
      } else if (node.isArray) {
        node.elements().asScala.zipWithIndex.toSeq.flatMap { case (n, i) =>
          walk(n, s"$prefix[$i]")
        }
      } else if (node.isNull) Seq(prefix -> null)
      else Seq(prefix -> node.asText())
    }
    walk(jsonMapper.readTree(doc), "")
  }

  /** Camera blob-tracking regions (`load_metadata.py:646-658`): extract
    * per-camera region vertex lists from flattened rig metadata — rows whose
    * path matches `cameras.<name>.cameraTracking.blobTracking.<region>[i].<axis>`.
    * Output: (file, camera, region, vertex_index, axis, value) — the polygon
    * dimension table the point-in-polygon operator broadcasts.
    */
  def cameraRegions(flat: DataFrame): DataFrame = {
    val p = "cameras\\.([^.]+)\\.cameraTracking\\.blobTracking\\.([^.\\[]+)\\[(\\d+)\\]\\.([xy])"
    flat
      .withColumn("camera", regexp_extract(col("path"), p, 1))
      .withColumn("region", regexp_extract(col("path"), p, 2))
      .withColumn("vertex_index", regexp_extract(col("path"), p, 3).cast("int"))
      .withColumn("axis", regexp_extract(col("path"), p, 4))
      .filter(col("camera") =!= "")
      .select("file", "camera", "region", "vertex_index", "axis", "value")
  }
}
