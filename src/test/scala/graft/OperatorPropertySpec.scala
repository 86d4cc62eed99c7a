package graft

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, IntervalJoin, Sessionize}

/** Randomized differential tests: each operator vs a brute-force in-memory
  * reference implementation over seeded random datasets (the reference repo
  * has no property tests — SURVEY.md §5; these close that gap for the
  * operators whose edge cases fixed fixtures can miss: ties, empty groups,
  * boundary-straddling intervals).
  */
class OperatorPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(42)
  private def t(ms: Long) = new Timestamp(1700000000000L + ms)

  test("AsOfJoin.backward matches brute-force as-of over random data (5 trials)") {
    for (trial <- 1 to 5) {
      val keys = Seq("a", "b", "c")
      val left = (1 to 40).map(i =>
        (keys(rnd.nextInt(3)), t(rnd.nextInt(1000) * 1000L), i))
      val right = (1 to 25).map(i =>
        (keys(rnd.nextInt(3)), t(rnd.nextInt(1000) * 1000L), s"v$i"))

      val expected = left.map { case (k, lt, id) =>
        val candidates = right.filter(r => r._1 == k && !r._2.after(lt))
        val best = if (candidates.isEmpty) None
        else Some(candidates.maxBy(r => (r._2.getTime, r._3))._3)
        (k, id, best)
      }.toSet

      // tie-break determinism: brute force picks max value on equal rt; the
      // window form picks the LAST in (time, arrival) order — make right
      // times unique per key to keep the property well-defined
      val rightU = right.groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq

      val expectedU = left.map { case (k, lt, id) =>
        val candidates = rightU.filter(r => r._1 == k && !r._2.after(lt))
        val best = if (candidates.isEmpty) None
        else Some(candidates.maxBy(_._2.getTime)._3)
        (k, id, best)
      }.toSet

      val got = AsOfJoin.backward(
        left.toDF("k", "lt", "id"), rightU.toDF("k", "rt", "v"),
        "lt", "rt", keys = Seq("k"), valueCols = Seq("v"))
        .select("k", "id", "v").collect()
        .map(r => (r.getString(0), r.getInt(1), Option(r.getString(2)))).toSet
      assert(got == expectedU, s"trial $trial")
    }
  }

  test("overlapBucketed matches brute-force overlap across bucket widths (5 trials)") {
    for (trial <- 1 to 5) {
      val left = (1 to 30).map { i =>
        val s = rnd.nextInt(2000).toLong; (i.toLong, s, s + rnd.nextInt(300))
      }
      val right = (1 to 30).map { i =>
        val s = rnd.nextInt(2000).toLong; (i.toLong, s, s + rnd.nextInt(300))
      }
      val expected = (for {
        (li, ls, le) <- left
        (ri, rs, re) <- right
        if ls <= re && rs <= le
      } yield (li, ri)).toSet

      val width = Seq(7L, 64L, 1024L)(trial % 3) // incl. widths ≪ and ≫ interval size
      val got = IntervalJoin.overlapBucketed(
        left.toDF("lid", "ls", "le"), right.toDF("rid", "rs", "re"),
        "ls", "le", "rs", "re", bucketWidth = width,
        leftKeys = Seq("lid"), rightKeys = Seq("rid"))
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"trial $trial width $width")
    }
  }

  test("Sessionize.byGap matches brute-force sessionization (5 trials)") {
    for (trial <- 1 to 5) {
      val events = (1 to 50).map(i => ("u", t(rnd.nextInt(100000) * 1000L)))
        .distinct.sortBy(_._2.getTime)
      val gapS = 60L + rnd.nextInt(600)

      var sid = -1L; var prev: Option[Long] = None
      val expected = events.map { case (k, ts) =>
        if (prev.forall(p => ts.getTime - p > gapS * 1000)) sid += 1
        prev = Some(ts.getTime)
        (ts, sid)
      }.toMap

      val got = Sessionize.byGap(events.toDF("k", "ts"), "ts", Seq("k"), gapS)
        .select("ts", "session_id").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1))).toMap
      assert(got == expected, s"trial $trial gap $gapS")
    }
  }

  test("pointInInterval half-open semantics hold on random boundaries (3 trials)") {
    for (trial <- 1 to 3) {
      val points = (1 to 40).map(i => (i.toLong, t(rnd.nextInt(500) * 1000L)))
      val ivs = (1 to 10).map { i =>
        val s = rnd.nextInt(400) * 1000L
        (i.toLong, t(s), if (rnd.nextBoolean()) Some(t(s + rnd.nextInt(200) * 1000L)) else None)
      }
      val expected = (for {
        (pid, p) <- points
        (iid, s, eOpt) <- ivs
        if !p.before(s) && eOpt.forall(e => p.before(e))
      } yield (pid, iid)).toSet

      val got = IntervalJoin.pointInInterval(
        points.toDF("pid", "p"), ivs.toDF("iid", "s", "e"),
        point = col("p"), start = col("s"), end = col("e"))
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"trial $trial")
    }
  }
}
