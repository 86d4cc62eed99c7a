package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

import graft.sources.{Bucketing, Tables}

class BucketingSpec extends SparkSpec {

  private def shuffles(plan: SparkPlan): Int = {
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case q: QueryStageExec => Seq(q.plan)
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case _ => p.children
      }
      p +: kids.flatMap(walk)
    }
    walk(plan).count(_.isInstanceOf[ShuffleExchangeExec])
  }

  test("same-key bucketed tables join with zero shuffles and correct results") {
    val orders = Tables.orders(spark, sf0001)
    val lineitem = Tables.lineitem(spark, sf0001)
    Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", buckets = 4,
      sortBy = Some("o_orderkey"))
    Bucketing.writeBucketed(lineitem, "lineitem_b", "l_orderkey", buckets = 4,
      sortBy = Some("l_orderkey"))

    // broadcast would trivially avoid the shuffle — force the SMJ path so
    // the zero-shuffle property comes from bucketing alone
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.table(spark, "orders_b")
        .join(Bucketing.table(spark, "lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .select("o_orderkey", "l_linenumber", "l_quantity")
      joined.collect()
      assert(shuffles(joined.queryExecution.executedPlan) == 0,
        s"bucketed join still shuffles:\n${joined.queryExecution.executedPlan}")

      val expected = orders.join(lineitem, col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
