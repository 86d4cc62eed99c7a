package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  test("winnowing guarantee: a shared run >= w+k-1 tokens shares a fingerprint") {
    val shared = (1 to 30).map(i => s"common$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma $shared delta epsilon"),
      (2L, s"one two three four five $shared six"),  // same run, shifted position
      (3L, (100 to 140).map(i => s"other$i").mkString(" "))) // disjoint
      .toDF("doc_id", "text")

    val fps = Dedup.winnowFingerprints(docs, "doc_id", "text",
      shingleN = 3, windowSize = 4)
    val sets = fps.collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1).toSet).toMap

    assert((sets(1L) & sets(2L)).nonEmpty, "shared run produced no common fingerprint")
    assert((sets(1L) & sets(3L)).isEmpty, "disjoint docs share fingerprints")
    // fingerprints are far fewer than shingles (that's the point of winnowing)
    assert(sets(1L).size < 30)
  }

  test("identical docs yield identical fingerprint sets; deterministic") {
    val docs = Seq((1L, "a b c d e f g h i j"), (2L, "a b c d e f g h i j"))
      .toDF("doc_id", "text")
    val sets = Dedup.winnowFingerprints(docs, "doc_id", "text")
      .collect().map(r => r.getSeq[Long](1)).toSeq
    assert(sets(0) == sets(1))
  }
}
