package graft.ops

import graft.SparkSpec

/** Automated plan audit over EVERY declared query — the .explain review
  * encoded as a gate, so a plan regression (an accidental unbounded
  * cartesian product) fails CI instead of surfacing as a 100 TB incident.
  *
  * CartesianProductExec materializes |L|×|R| with no key — only
  * acceptable when one side is a bounded constant. Queries whose plans
  * legitimately contain one are allowlisted HERE with the boundedness
  * argument; everything else must plan joins with keys or broadcasts
  * (crossJoin against a broadcast side plans BroadcastNestedLoopJoin,
  * which is fine and not flagged).
  */
class PlanLintSpec extends SparkSpec {

  /** query → why a cartesian there is bounded. */
  private val cartesianAllowlist: Map[String, String] = Map(
    "q18_cross_join" -> "the declared operator IS a cross join: region(5) × nation(25)"
  )

  test("no query plans an unlisted cartesian product (sf0.001)") {
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf()).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct") && !cartesianAllowlist.contains(name))
          Some(name)
        else None
    }
    spark.catalog.clearCache() // q57/q75/q79/q81/q95 persist subplans
    assert(offenders.isEmpty,
      s"unlisted CartesianProduct in: ${offenders.mkString(", ")}")
  }
}
