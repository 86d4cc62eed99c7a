package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Scd2

/** SCD2 merge: every branch (unchanged, changed, deleted, inserted,
  * re-inserted after deletion), history pass-through, null-safe attribute
  * compare, and idempotency of re-merging the same snapshot.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2020-01-01 00:00:00")
  private val t1 = Timestamp.valueOf("2021-01-01 00:00:00")
  private val t2 = Timestamp.valueOf("2022-01-01 00:00:00")

  // id 1: unchanged; id 2: attr changes; id 3: deleted; id 5: had an old
  // closed version + open one (history must pass through); id 6: attr is
  // NULL in both (null-safe equality → unchanged)
  private def dim = Seq(
    (1L, Some("a"), t0, None: Option[Timestamp]),
    (2L, Some("b"), t0, None: Option[Timestamp]),
    (3L, Some("c"), t0, None: Option[Timestamp]),
    (5L, Some("old"), t0, Some(t1)),
    (5L, Some("e"), t1, None: Option[Timestamp]),
    (6L, None: Option[String], t0, None: Option[Timestamp]))
    .toDF("id", "attr", "valid_from", "valid_to")

  // snapshot at t2: 1 same, 2 -> b2, 3 missing, 4 new, 5 same, 6 null
  private def snap = Seq(
    (1L, Some("a")), (2L, Some("b2")), (4L, Some("d")), (5L, Some("e")),
    (6L, None: Option[String]))
    .toDF("id", "attr")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), Option(r.getString(1)),
      r.getTimestamp(2), Option(r.getTimestamp(3)))).toSet

  test("merge covers unchanged/changed/deleted/inserted/history branches") {
    val out = Scd2.merge(dim, snap, "id", Seq("attr"), "valid_from",
      "valid_to", lit(t2))
    assert(rows(out) == Set(
      (1L, Some("a"), t0, None),              // unchanged, still open
      (2L, Some("b"), t0, Some(t2)),          // closed
      (2L, Some("b2"), t2, None),             // new version
      (3L, Some("c"), t0, Some(t2)),          // deleted → closed
      (4L, Some("d"), t2, None),              // inserted
      (5L, Some("old"), t0, Some(t1)),        // history verbatim
      (5L, Some("e"), t1, None),              // unchanged open
      (6L, None, t0, None)))                  // null <=> null → unchanged
  }

  test("re-merging the same snapshot is a no-op (idempotent)") {
    val once = Scd2.merge(dim, snap, "id", Seq("attr"), "valid_from",
      "valid_to", lit(t2))
    val twice = Scd2.merge(once, snap, "id", Seq("attr"), "valid_from",
      "valid_to", lit(t2))
    assert(rows(once) == rows(twice))
  }

  test("diffSnapshots: added/removed/changed and per-attribute counts") {
    val a = Seq((1L, Some("x"), 10), (2L, Some("y"), 20),
      (3L, Some("z"), 30), (5L, None: Option[String], 50))
      .toDF("id", "s", "v")
    val b = Seq((1L, Some("x"), 10),          // unchanged
      (2L, Some("y2"), 20),                   // s changed
      (3L, Some("z"), 31),                    // v changed
      (4L, Some("new"), 40),                  // added
      (5L, None: Option[String], 50))         // null <=> null unchanged
      .toDF("id", "s", "v")
    val got = graft.operators.Scd2.diffSnapshots(a, b, "id", Seq("s", "v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("added" -> 1L, "removed" -> 0L, "changed" -> 2L,
      "changed:s" -> 1L, "changed:v" -> 1L))
  }

  test("asOf reads the point-in-time snapshot across versions") {
    val merged = Scd2.merge(dim, snap, "id", Seq("attr"), "valid_from",
      "valid_to", lit(t2))
    def at(ts: Timestamp) =
      Scd2.asOf(merged, "valid_from", "valid_to", lit(ts))
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    // before the merge: the original open state (id 5 on its FIRST version
    // at t0, since the second only opens at t1)
    assert(at(t0) == Map(1L -> Some("a"), 2L -> Some("b"), 3L -> Some("c"),
      5L -> Some("old"), 6L -> None))
    // between t1 and t2: id 5 on its second version
    assert(at(t1) == Map(1L -> Some("a"), 2L -> Some("b"), 3L -> Some("c"),
      5L -> Some("e"), 6L -> None))
    // at t2 (inclusive lower bound): post-merge state — 2 on b2, 3 gone,
    // 4 present
    assert(at(t2) == Map(1L -> Some("a"), 2L -> Some("b2"), 4L -> Some("d"),
      5L -> Some("e"), 6L -> None))
    // at most one row per id at every instant
    Seq(t0, t1, t2).foreach { ts =>
      val ids = Scd2.asOf(merged, "valid_from", "valid_to", lit(ts))
        .collect().map(_.getLong(0)).toSeq
      assert(ids.distinct == ids, s"duplicate id at $ts")
    }
  }

  test("re-insert after deletion opens a fresh version") {
    val afterDelete = Scd2.merge(dim, snap, "id", Seq("attr"), "valid_from",
      "valid_to", lit(t2))
    val resnap = Seq((3L, Some("c3"))).toDF("id", "attr")
    val t3 = Timestamp.valueOf("2023-01-01 00:00:00")
    val out = Scd2.merge(afterDelete, resnap, "id", Seq("attr"),
      "valid_from", "valid_to", lit(t3))
    assert(rows(out).contains((3L, Some("c3"), t3, None)))
    assert(rows(out).contains((3L, Some("c"), t0, Some(t2))))
    // everyone else (absent from resnap) closes at t3
    assert(rows(out).contains((1L, Some("a"), t0, Some(t3))))
  }
}
