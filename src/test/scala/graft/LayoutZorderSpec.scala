package graft

import org.apache.spark.sql.functions._

import graft.sources.Layout

/** Z-order (Morton) layout: interleave correctness against a plain-Scala
  * reference, exact integer bucketing, and the property the whole feature
  * exists for — measured ON DISK: a rectangle query intersects fewer
  * z-ordered files' min/max envelopes than linearly-sorted files'.
  */
class LayoutZorderSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("morton2 matches the reference interleave over the full grid + random longs") {
    val grid = for { a <- 0L until 32L; b <- 0L until 32L } yield (a, b)
    // deterministic "random" wide values for bits=20
    val wide = (1 to 200).map { i =>
      val x = (i * 2654435761L) % (1L << 20); val y = (i * 40503L * 65537L) % (1L << 20)
      (x, y)
    }
    for ((bits, cases) <- Seq((5, grid), (20, wide))) {
      val got = cases.toDF("a", "b")
        .select(col("a"), col("b"), Layout.morton2(col("a"), col("b"), bits).as("z"))
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      cases.foreach { case (a, b) =>
        assert(got((a, b)) == mortonRef(a, b, bits), s"($a, $b) bits=$bits")
      }
    }
  }

  test("mortonBucket is exact integer math where a double round-trip is not") {
    // microsecond-scale span at bits=16: (c-lo)*2^16 overflows 2^53, the
    // regime where floor((c-lo)*2^16 / span) computed in doubles goes wrong
    val lo = 1704067200000000L // 2024-01-01 in micros
    val span = 30L * 86400 * 1000000 // 30 days
    val vals = (0 until 500).map(i => lo + (i * 5101L * 1000003L) % span)
    val got = vals.toDF("c")
      .select(col("c"), Layout.mortonBucket(col("c"), lo, lo + span - 1, 16).as("bk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vals.foreach { c =>
      val exact = ((BigInt(c) - BigInt(lo)) * BigInt(1L << 16) / BigInt(span)).toLong
      assert(got(c) == exact, s"c=$c")
      assert(got(c) >= 0 && got(c) < (1L << 16))
    }
  }

  test("z-ordered files skip a rectangle query that a linear sort cannot") {
    // full 64x64 grid, one row per cell; 16 files per layout
    val grid = (for { u <- 0 until 64; t <- 0 until 64 } yield
      (u.toLong, t.toLong)).toDF("u", "t")
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    val linDir = java.nio.file.Files.createTempDirectory("linear").toString
    Layout.zorderBy(grid, col("u"), col("t"), numFiles = 16, bits = 6)
      .write.mode("overwrite").parquet(zDir)
    grid.repartitionByRange(16, col("t")).sortWithinPartitions("t")
      .write.mode("overwrite").parquet(linDir)

    // per-FILE min/max envelopes — what parquet footer stats give a scanner
    def envelopes(dir: String) = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("u").as("ulo"), max("u").as("uhi"),
        min("t").as("tlo"), max("t").as("thi"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    // rectangle u in [0,15] x t in [0,15] — 1/16 of the area
    def intersecting(env: Seq[(Long, Long, Long, Long)]) =
      env.count { case (ulo, uhi, tlo, thi) =>
        ulo <= 15 && uhi >= 0 && tlo <= 15 && thi >= 0 }

    val zHit = intersecting(envelopes(zDir).toSeq)
    val linHit = intersecting(envelopes(linDir).toSeq)
    // linear: every file spans all of u, so only the t bound filters
    // (~16/64 of rows -> ~4 of 16 files). z-order: the rectangle is one
    // contiguous z-range of 256 codes (~1 file of 256 rows, at most 2 with
    // sampled boundaries).
    assert(zHit <= 2, s"z-order should bound the rectangle to <=2 files, hit $zHit")
    assert(linHit >= 3, s"linear sort should NOT skip in u: expected >=3 files, hit $linHit")
    assert(zHit < linHit)

    // and both layouts still hold exactly the same rows
    assert(spark.read.parquet(zDir).orderBy("u", "t").collect().toSeq ==
      spark.read.parquet(linDir).orderBy("u", "t").collect().toSeq)
  }

  test("SQL frontend builds the same z-codes as the Column API") {
    GraftFunctions.register(spark)
    val df = Seq((7L, 1704067200123456L), (140L, 1705000000000000L))
      .toDF("u", "tm")
    df.createOrReplaceTempView("zorder_spec_v")
    val sql = spark.sql(
      """SELECT graft_morton2(u % 256, graft_morton_bucket(
        |  tm, 1704067200000000, 1706659199999999, 8), 8) AS z
        |FROM zorder_spec_v ORDER BY z""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    val col0 = df.select(Layout.morton2(pmod(col("u"), lit(256L)),
        Layout.mortonBucket(col("tm"), 1704067200000000L, 1706659199999999L, 8),
        8).as("z"))
      .orderBy("z").collect().map(_.getLong(0)).toSeq
    assert(sql == col0)
  }
}
