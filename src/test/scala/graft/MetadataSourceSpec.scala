package graft

import java.nio.file.Files

import graft.sources.MetadataSource

class MetadataSourceSpec extends SparkSpec {

  private val rigJson =
    """{
      |  "rig": "rig0",
      |  "cameras": {
      |    "CameraTop": {
      |      "fps": 50,
      |      "cameraTracking": {
      |        "blobTracking": {
      |          "nest": [
      |            {"x": 100.0, "y": 2.0},
      |            {"x": 150.0, "y": 7.0},
      |            {"x": 100.0, "y": 12.0}
      |          ]
      |        }
      |      }
      |    }
      |  },
      |  "patches": [{"name": "Patch1", "radius": 4}]
      |}""".stripMargin

  test("flattenJson produces dotted paths with array indices") {
    val flat = MetadataSource.flattenJson(rigJson).toMap
    assert(flat("rig") == "rig0")
    assert(flat("cameras.CameraTop.fps") == "50")
    assert(flat("cameras.CameraTop.cameraTracking.blobTracking.nest[1].x") == "150.0")
    assert(flat("patches[0].name") == "Patch1")
  }

  test("readJson + flatten + cameraRegions end to end over a Metadata.json file") {
    val dir = Files.createTempDirectory("meta")
    Files.write(dir.resolve("Metadata.json"), rigJson.getBytes)

    val meta = MetadataSource.readJson(spark, dir.resolve("*.json").toString)
    assert(meta.count() == 1)

    val flat = MetadataSource.flatten(meta).cache()
    assert(flat.filter(flat("path") === "rig").count() == 1)

    val regions = MetadataSource.cameraRegions(flat)
      .orderBy("vertex_index", "axis").collect()
    assert(regions.length == 6) // 3 vertices x 2 axes
    assert(regions.forall(_.getAs[String]("camera") == "CameraTop"))
    assert(regions.forall(_.getAs[String]("region") == "nest"))
    val v1x = regions.find(r => r.getAs[Int]("vertex_index") == 1 &&
      r.getAs[String]("axis") == "x").get
    assert(v1x.getAs[String]("value") == "150.0")
  }
}
