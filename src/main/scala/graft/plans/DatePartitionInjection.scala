package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, EqualTo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Injected optimizer rule (SURVEY.md §4: "a custom Rule only if we later
  * add automatic date-partition injection for incremental models"): when
  * a session sets
  *
  *   spark.graft.inject.dateColumn = <column name>
  *   spark.graft.inject.runDate    = <date/timestamp literal>
  *
  * every scan exposing that column is wrapped in
  * `Filter(col = runDate)` — the reference's universal incremental
  * pattern (`WHERE fecha = run_date`, dq_sql_notes.md:75) applied
  * engine-wide instead of per query, so an incremental model's scans are
  * automatically restricted to the run's partition and Catalyst pushes
  * the injected predicate into partition pruning / parquet row groups.
  * A no-op unless both confs are set; a tree tag keeps it idempotent
  * under the optimizer's fixed-point batches.
  */
case class DatePartitionInjection(spark: SparkSession) extends Rule[LogicalPlan] {
  import DatePartitionInjection.injectedTag

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val dateCol = spark.conf.get("spark.graft.inject.dateColumn", "")
    val runDate = spark.conf.get("spark.graft.inject.runDate", "")
    if (dateCol.isEmpty || runDate.isEmpty) plan
    else plan.transformUp {
      case r: LogicalRelation
          if r.getTagValue(injectedTag).isEmpty &&
            r.output.exists(_.name == dateCol) =>
        r.setTagValue(injectedTag, true)
        val attr = r.output.find(_.name == dateCol).get
        Filter(EqualTo(attr, Cast(Literal(runDate), attr.dataType)), r)
    }
  }
}

object DatePartitionInjection {
  private val injectedTag = TreeNodeTag[Boolean]("graft.dateInjected")
}
