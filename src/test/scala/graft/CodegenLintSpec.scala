package graft

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, GlobalLimitExec, LocalLimitExec, ProjectExec, SparkPlan}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}

/** PLAN-SHAPE REGRESSION GUARD for the CodegenFallback failure class —
  * the dominant perf bug of rounds 3, 4, 7 and 9 (higher-order-function
  * lambdas are CodegenFallback, so a Project/Filter hosting one drops
  * out of whole-stage codegen and pays interpreted eval per row; over a
  * scan-sized relation that is a multi-x slowdown the correctness gate
  * cannot see). The seven native expressions purged it; this spec makes
  * the purge permanent: every registry query's physical plan is walked
  * and any CodegenFallback expression inside a Project/Filter that
  * reaches a parquet scan without an intervening cardinality cut
  * (aggregate/limit) fails the build, naming the query, the node and
  * the expression class.
  *
  * Plans are built under `graft.lazyPlans` (the [[graft.Explain]]
  * switch) so construction runs no jobs and the audited plan is the
  * real one, not a checkpoint stub. */
class CodegenLintSpec extends SparkSpec {

  /** Does this subtree read a scan-sized relation — i.e. reach a file
    * scan without crossing a node that cuts cardinality (aggregates,
    * limits)? Per-row fallback cost above such a node scales with the
    * corpus; above a cut it scales with the (bounded) group/limit
    * count. */
  private def scanSized(p: SparkPlan): Boolean = p match {
    case _: FileSourceScanExec => true
    case _: HashAggregateExec | _: ObjectHashAggregateExec |
         _: SortAggregateExec | _: GlobalLimitExec | _: LocalLimitExec =>
      false
    case other => other.children.exists(scanSized)
  }

  /** (node kind, expression class) for every CodegenFallback expression
    * hosted by a Project/Filter over a scan-sized input. */
  private def findings(plan: SparkPlan): Seq[(String, String)] =
    plan.collect {
      case p: ProjectExec if p.children.exists(scanSized) =>
        p.projectList
          .flatMap(_.collect { case c: CodegenFallback => c })
          .map(c => ("Project", c.asInstanceOf[Object].getClass.getSimpleName))
      case f: FilterExec if f.children.exists(scanSized) =>
        f.condition.collect { case c: CodegenFallback => c }
          .map(c => ("Filter", c.asInstanceOf[Object].getClass.getSimpleName))
    }.flatten

  test("no registry query hosts a CodegenFallback over a scan-sized Project/Filter") {
    System.setProperty("graft.lazyPlans", "true")
    try {
      val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          val plan = fn(spark, "/root/testdata/sf0.001")
            .queryExecution.sparkPlan
          findings(plan).map { case (node, cls) => s"$name: $cls in $node" }
      }
      assert(bad.isEmpty,
        s"CodegenFallback over scan-sized relations:\n${bad.mkString("\n")}")
    } finally System.clearProperty("graft.lazyPlans")
  }
}
