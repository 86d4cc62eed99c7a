package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.EventMatch
import graft.streaming.StreamingUnitMatch

/** Incremental global-unit propagation (`streaming/StreamingUnitMatch`):
  * drained ≡ one-shot over block waves, replay idempotence, and the
  * seed-first gap guard.
  */
class StreamingUnitMatchSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(StructField("block", LongType),
    StructField("unit", LongType), StructField("us", LongType)))

  // 4 units on a sparse grid; block b relabels by (u + b) % 4 with times
  // unchanged (perfect cross-block agreement), block 2 adds new unit 9
  private def block(b: Long, withNew: Boolean) = {
    val base = (0L to 3L).flatMap { u =>
      (0 until 40).map(k => (b, (u + b) % 4, k * 100000L + u * 10L))
    }
    val extra = if (withNew)
      (0 until 40).map(k => (b, 9L, k * 100000L + 500L)) else Nil
    (base ++ extra).toDF("block", "unit", "us")
  }

  private def dirs() = {
    val root = Files.createTempDirectory("unitmatch_drain")
    (root.resolve("src").toString, root.resolve("trains").toString,
      root.resolve("asg").toString, root.resolve("ckpt").toString)
  }

  test("drained assignments equal the one-shot propagation across waves") {
    val (src, trains, asg, ckpt) = dirs()
    def wave(): Unit = StreamingUnitMatch.drain(spark, src, trains, asg,
      ckpt, "block", "unit", "us", schema, deltaUs = 4L, minPermille = 500L)
    block(0L, withNew = false).write.mode("append").parquet(src)
    wave()
    block(1L, withNew = false).unionByName(block(2L, withNew = true))
      .write.mode("append").parquet(src)
    wave()
    val drained = StreamingUnitMatch.loadAssignments(spark, asg)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val oneShot = EventMatch.propagateGlobalIds(
        Seq(block(0L, withNew = false).select("unit", "us"),
          block(1L, withNew = false).select("unit", "us"),
          block(2L, withNew = true).select("unit", "us")),
        "unit", "us", deltaUs = 4L, minPermille = 500L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(drained === oneShot)
    // the relabeling chain resolves: block 2's unit (u+2)%4 has global u
    (0L to 3L).foreach { u =>
      assert(drained((2L, (u + 2) % 4)) === u, s"two-hop inherit $u")
    }
    assert(drained((2L, 9L)) === 4L, "new unit mints above the running max")

    // replaying the same backlog (fresh checkpoint) is a keyed no-op
    val n = StreamingUnitMatch.loadAssignments(spark, asg).count()
    StreamingUnitMatch.drain(spark, src, trains, asg,
      Files.createTempDirectory("unitmatch_ckpt2").toString,
      "block", "unit", "us", schema, deltaUs = 4L, minPermille = 500L)
    assert(StreamingUnitMatch.loadAssignments(spark, asg).count() === n)
  }

  test("a block draining before its predecessor fails loudly (seed-first guard)") {
    val (src, trains, asg, ckpt) = dirs()
    block(0L, withNew = false).write.mode("append").parquet(src)
    StreamingUnitMatch.drain(spark, src, trains, asg, ckpt,
      "block", "unit", "us", schema, deltaUs = 4L, minPermille = 500L)
    // block 2 lands while block 1 is still missing
    block(2L, withNew = false).write.mode("append").parquet(src)
    val e = intercept[Exception] {
      StreamingUnitMatch.drain(spark, src, trains, asg, ckpt,
        "block", "unit", "us", schema, deltaUs = 4L, minPermille = 500L)
    }
    def chain(t: Throwable): Seq[Throwable] =
      t +: Option(t.getCause).toSeq.flatMap(chain)
    assert(chain(e).exists(c => Option(c.getMessage)
      .exists(_.contains("predecessor"))), e.getMessage)
  }
}
