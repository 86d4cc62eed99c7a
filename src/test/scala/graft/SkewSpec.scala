package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // Pathological distribution: one key holds 90% of rows.
  private lazy val skewed = (
    (1 to 900).map(i => ("hot", i.toDouble)) ++
    (1 to 50).map(i => ("cold_a", i.toDouble)) ++
    (1 to 50).map(i => ("cold_b", i.toDouble))
  ).toDF("k", "v").cache()

  test("saltedAggregate equals plain aggregate") {
    val plain = skewed.groupBy("k")
      .agg(sum(col("v")).as("total"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedAggregate(skewed, Seq("k"), buckets = 8)(
      partials = Seq(sum(col("v")).as("p_total"), count(lit(1)).as("p_n")),
      merges = Seq(sum(col("p_total")).as("total"), sum(col("p_n")).as("n")))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("detectHotKeys finds the dominant key") {
    val hot = Skew.detectHotKeys(skewed, "k", fraction = 1.0, threshold = 0.5)
    assert(hot == Seq("hot"))
  }

  test("saltedJoin equals plain join, incl. hot-key fanout") {
    val right = Seq(("hot", "H"), ("cold_a", "A"), ("cold_b", "B"))
      .toDF("k", "label")
    val plain = skewed.join(right, "k")
      .groupBy("k", "label").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(skewed, right, "k",
        hotKeys = Seq("hot"), buckets = 4)
      .groupBy("k", "label").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("saltedJoin with no hot keys degrades to a plain join") {
    val right = Seq(("hot", "H")).toDF("k", "label")
    assert(Skew.saltedJoin(skewed, right, "k", Seq.empty, 4).count() == 900)
  }
}
