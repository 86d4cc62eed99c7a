package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Dedup
import graft.streaming.StreamingHamming

/** Drained banded-Hamming near-dup ≡ one-shot: the persisted band index
  * must surface exactly the pairs the one-shot join finds, across
  * arbitrary wave splits.
  */
class StreamingHammingSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("h", LongType)))

  private def genHashes(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    // clustered hashes: groups of 4 share a base, members flip ≤ 2 bits
    (0L until n.toLong).map { i =>
      val base = new scala.util.Random(seed + (i / 4)).nextLong()
      val flips = (0 until rnd.nextInt(3))
        .map(_ => 1L << rnd.nextInt(64)).fold(0L)(_ ^ _)
      (i, base ^ flips)
    }
  }

  private def oneShot(rows: Seq[(Long, Long)]) =
    Dedup.hammingNearDup(rows.toDF("id", "h"), "id", "h",
        bits = 64, maxHamming = 4, nBands = 4)
      .as[(Long, Long, Int)].collect().toSet

  private def drained(waves: Seq[Seq[(Long, Long)]]) = {
    val root = Files.createTempDirectory("graft-hamdrain-spec").toString
    val (src, idx, hs, pairs, ckpt) = (root + "/src", root + "/i",
      root + "/h", root + "/p", root + "/c")
    waves.foreach { wave =>
      wave.toDF("id", "h").write.mode("append").parquet(src)
      StreamingHamming.drain(spark, src, idx, hs, pairs, ckpt,
        "id", "h", schema, bits = 64, maxHamming = 4, nBands = 4)
    }
    if (!Files.exists(java.nio.file.Paths.get(pairs)))
      Set.empty[(Long, Long, Int)]
    else StreamingHamming.loadPairs(spark, pairs)
      .as[(Long, Long, Int)].collect().toSet
  }

  test("three waves equal the one-shot on clustered random hashes") {
    val rows = genHashes(19, 120)
    val got = drained(Seq(rows.take(40), rows.slice(40, 80), rows.drop(80)))
    assert(got === oneShot(rows))
    assert(got.nonEmpty, "fixture should produce near-dup pairs")
  }

  test("a cross-wave pair surfaces only through the persisted index") {
    val a = Seq((1L, 0x1234567811112222L))
    val b = Seq((2L, 0x1234567811112223L)) // 1 bit away, other wave
    val far = Seq((3L, -0x4CC306E9743EDCE6L))
    val got = drained(Seq(a, far, b))
    assert(got === oneShot(a ++ far ++ b))
    assert(got.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1))
  }

  test("replayed drain is a no-op") {
    val rows = genHashes(31, 60)
    val root = Files.createTempDirectory("graft-hamdrain-idem").toString
    val (src, idx, hs, pairs, ckpt) = (root + "/src", root + "/i",
      root + "/h", root + "/p", root + "/c")
    rows.toDF("id", "h").write.mode("append").parquet(src)
    def run(): Set[(Long, Long, Int)] = {
      StreamingHamming.drain(spark, src, idx, hs, pairs, ckpt,
        "id", "h", schema, bits = 64, maxHamming = 4, nBands = 4)
      StreamingHamming.loadPairs(spark, pairs)
        .as[(Long, Long, Int)].collect().toSet
    }
    val first = run()
    val second = run()
    assert(first === second)
    assert(first === oneShot(rows))
  }
}
