package graft

import org.apache.spark.sql.functions._

import graft.operators.Features

/** Feature transforms against literal replays: rank-shared bins and
  * leave-one-out means.
  */
class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("quantileBin: ties share a bin; bins are balanced without ties") {
    val noTies = (0 until 100).map(i => ("k", i.toLong))
    val bins = Features.quantileBin(noTies.toDF("g", "v"), Seq("g"), "v", 4)
      .select("v", "bin").as[(Long, Long)].collect().toMap
    (0 until 100).foreach(i => assert(bins(i.toLong) === i / 25))
    // all-equal values: one rank -> everyone in bin 0
    val allTies = (0 until 10).map(_ => ("k", 7L))
    val tied = Features.quantileBin(allTies.toDF("g", "v"), Seq("g"), "v", 4)
      .select("bin").as[Long].collect()
    assert(tied.toSet === Set(0L))
    // null values pass through with a null bin AND must not shift the
    // real values' ranks (nulls-first ordering would push v=2 into the
    // out-of-range bin 2)
    val withNull = Seq(("k", Some(1L)), ("k", None), ("k", Some(2L)))
    val nb = Features.quantileBin(withNull.toDF("g", "v"), Seq("g"), "v", 2)
      .select("v", "bin").as[(Option[Long], Option[Long])].collect()
      .toMap
    assert(nb(None) === None)
    assert(nb(Some(1L)) === Some(0L))
    assert(nb(Some(2L)) === Some(1L))
  }

  test("targetEncodeLoo equals the literal leave-one-out mean") {
    val rows = Seq(("a", 100L), ("a", 200L), ("a", 330L),
      ("b", 50L), ("b", 70L), ("c", 999L))
    val got = Features.targetEncodeLoo(rows.toDF("cat", "t"), Seq("cat"), "t")
      .select("cat", "t", "enc_micro")
      .as[(String, Long, Option[Long])].collect().toSet
    val want = Set(
      ("a", 100L, Some((200L + 330L) / 2)),
      ("a", 200L, Some((100L + 330L) / 2)),
      ("a", 330L, Some((100L + 200L) / 2)),
      ("b", 50L, Some(70L)), ("b", 70L, Some(50L)),
      ("c", 999L, None)) // singleton: no other evidence
    assert(got === want)
  }

  test("targetEncodeLoo refuses negative targets loudly") {
    val rows = Seq(("a", 5L), ("a", -1L))
    val e = intercept[Exception] {
      Features.targetEncodeLoo(rows.toDF("cat", "t"), Seq("cat"), "t")
        .collect()
    }
    assert(e.getMessage.contains("nonnegative") ||
      Option(e.getCause).exists(_.getMessage.contains("nonnegative")))
  }
}
