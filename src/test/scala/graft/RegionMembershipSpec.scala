package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.GeometryFunctions
import graft.sources.MetadataSource

/** Integration: rig Metadata.json → camera region vertices → polygon
  * dimension row → point-in-polygon membership over a position stream — the
  * full nest-membership path of the reference
  * (`load_metadata.py:646-658` regions + `tracking.py:326-340` containment),
  * with the polygon riding along as a broadcast dimension table.
  */
class RegionMembershipSpec extends SparkSpec {
  import spark.implicits._

  test("regions parsed from rig metadata drive point-in-polygon membership") {
    val rigJson =
      """{"cameras": {"CameraTop": {"cameraTracking": {"blobTracking": {
        |  "nest": [
        |    {"x": 0.0, "y": 0.0}, {"x": 10.0, "y": 0.0},
        |    {"x": 10.0, "y": 10.0}, {"x": 0.0, "y": 10.0}
        |  ]}}}}}""".stripMargin
    val dir = Files.createTempDirectory("rig")
    Files.write(dir.resolve("Metadata.json"), rigJson.getBytes)

    // metadata → (camera, region) polygon vertex arrays
    val flat = MetadataSource.flatten(
      MetadataSource.readJson(spark, dir.resolve("*.json").toString))
    val polys = MetadataSource.cameraRegions(flat)
      .groupBy("camera", "region", "vertex_index")
      .pivot("axis", Seq("x", "y"))
      .agg(first(col("value").cast("double")))
      .groupBy("camera", "region")
      .agg(sort_array(collect_list(struct(col("vertex_index"), col("x"), col("y"))))
        .as("verts_idx"))
      .select(col("camera"), col("region"),
        transform(col("verts_idx"),
          v => struct(v.getField("x").as("x"), v.getField("y").as("y"))).as("vertices"))

    // position stream × broadcast polygon dim → membership
    val positions = Seq((1L, 5.0, 5.0), (2L, 15.0, 5.0), (3L, -1.0, 3.0))
      .toDF("sample_id", "x", "y")
    val membership = positions.crossJoin(broadcast(polys))
      .withColumn("in_region",
        GeometryFunctions.pointInPolygon(col("x"), col("y"), col("vertices")))
      .select("sample_id", "region", "in_region")
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap

    assert(membership == Map(1L -> true, 2L -> false, 3L -> false))
  }
}
