package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Plan-shape assertions shared by queries and specs. Always inspect
  * the optimized plan's actual scan locations — `executedPlan.toString`
  * TRUNCATES long paths, so substring checks against rendered plans
  * pass or fail on path length, not plan shape (this silently broke a
  * check once; see EngineSqlQueries q_sql_pyramid). */
object PlanChecks {

  /** Root paths of every file scan in the optimized logical plan. */
  def scanRootPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
        case _ => Nil
      }
    }.flatten

  /** True iff the plan is served from the rollup pyramid and never
    * touches the point log — the pyramid-substitution success shape. */
  def readsPyramidOnly(df: DataFrame): Boolean = {
    val scans = scanRootPaths(df)
    scans.exists(_.contains("pyramid/pw=")) &&
      !scans.exists(_.contains("/points"))
  }
}
