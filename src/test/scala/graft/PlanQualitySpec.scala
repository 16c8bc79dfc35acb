package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Structural scale guard: builds (without executing) the physical plan
  * of every registered query and rejects accidental cartesian products —
  * the plan shape that silently works at sf0.01 and melts at 100 TB.
  * Intentional 1-row summary crosses and broadcast probe-set crosses are
  * whitelisted BY NAME so a new quadratic join cannot sneak in unseen. */
class PlanQualitySpec extends SparkSuite {

  /** Queries that intentionally cross-join single-row aggregates (their
    * inputs are 1-row summaries, so the product is 1×1×…) — anything
    * NOT in this set must plan without CartesianProductExec. */
  private val oneRowCrossWhitelist = Set(
    "chain_zip_vs_join", "chain_dedup_idempotent", "chain_ref_integrity",
    "dedup_split_leakage",
    // funnel audit: seven 1-row stage aggregates crossed into one row
    // (plans as BNLJ or CartesianProduct depending on size estimates —
    // both are 1×1 at runtime)
    "pipeline_refinery",
    // funnel summary: three 1-row aggregates crossed into one row
    "q42_funnel",
    // per-domain rows × the broadcast 1-row corpus-total aggregate
    "filter_domain_mix")

  private def collectPlans(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => collectPlans(a.initialPlan)
      case _ => Seq.empty
    }
    (p +: p.children.flatMap(collectPlans)) ++ inner
  }

  test("no registered query plans a cartesian product (except 1-row summaries)") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(oneRowCrossWhitelist)
      .filterNot(_ == "chain_ingest_1k") // executes a write on plan build
      .flatMap { name =>
        val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan
        if (collectPlans(plan).exists(_.isInstanceOf[CartesianProductExec]))
          Some(name)
        else None
      }
    assert(offenders.isEmpty, s"cartesian product in: $offenders")
  }
}
