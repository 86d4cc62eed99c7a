package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec,
  CartesianProductExec}

/** Plan audit main: for each declared query, walk the physical plan and
  * report the properties that matter at 100 TB — shuffle count, join
  * strategies (broadcast where a dimension side is small; never an
  * unbounded cartesian), parquet filter pushdown, and whole-stage-codegen
  * coverage. Prints one line per query plus a failing-check summary; exits
  * non-zero if a hard rule breaks (cartesian product without broadcast).
  *
  * Usage: runMain graft.PlanAudit [sfDir] [query ...]
  */
object PlanAudit {

  final case class Audit(name: String, shuffles: Int, bhj: Int, bnlj: Int,
                         cartesian: Int, scans: Int, pushedFilters: Int,
                         codegenSpans: Int, notes: List[String])

  def collectPlan(p: SparkPlan): Seq[SparkPlan] = {
    // AQE wraps materialized stages in QueryStageExec whose `children` is
    // empty — descend through `plan` explicitly or the audit sees nothing.
    val kids = p match {
      case q: QueryStageExec => Seq(q.plan)
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case _ => p.children
    }
    p +: (kids ++ p.subqueries).flatMap(collectPlan)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    val spark: SparkSession = GraftSession.getOrCreate()

    var hardFailures = 0
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          // Execute THIS dataset's own QueryExecution (collect, not a write —
          // a write wraps a fresh QE and the inspected AQE plan would stay
          // unmaterialized with no final stages or codegen inserted).
          df.collect()
          val executed = df.queryExecution.executedPlan match {
            case a: AdaptiveSparkPlanExec => a.executedPlan
            case p => p
          }
          val nodes = collectPlan(executed)
          val planStr = executed.toString
          val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
          val bhj = nodes.count(_.isInstanceOf[BroadcastHashJoinExec])
          val bnlj = nodes.count(_.isInstanceOf[BroadcastNestedLoopJoinExec])
          val cartesian = nodes.count(_.isInstanceOf[CartesianProductExec])
          val scans = nodes.count(n => n.nodeName.contains("Scan"))
          val pushed = "PushedFilters: \\[[^\\]]".r.findAllIn(planStr).length
          val codegen = nodes.count(_.isInstanceOf[WholeStageCodegenExec])
          // SPARK_GRAFT_PLAN_DUMP=1: print the executed plan after the audit
          // line — for chasing where a flagged shuffle actually sits.
          if (sys.env.get("SPARK_GRAFT_PLAN_DUMP").contains("1")) println(planStr)
          val notes = scala.collection.mutable.ListBuffer.empty[String]
          if (cartesian > 0) { notes += "CARTESIAN"; hardFailures += 1 }
          if (shuffles > 6) notes += s"many-shuffles($shuffles)"
          println(f"$name%-28s shuffles=$shuffles%-2d bhj=$bhj%-2d bnlj=$bnlj%-2d " +
            f"scans=$scans%-2d pushed=$pushed%-2d codegenSpans=$codegen%-2d ${notes.mkString(",")}")
        } catch {
          case e: Throwable => println(f"$name%-28s ERROR ${e.getMessage.take(80)}")
        }
      }
    spark.stop()
    if (hardFailures > 0) {
      System.err.println(s"$hardFailures hard plan failures")
      sys.exit(1)
    }
  }
}
