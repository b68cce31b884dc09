package graft

import org.scalatest.funsuite.AnyFunSuite

/** Keeps the sf1 sanity tier's query list in lockstep with the budget
  * table: a pipeline important enough to carry a shuffle budget is
  * important enough to get the 10× growth check, and vice versa. */
class Sf1TierSpec extends AnyFunSuite {
  test("Sf1Tier.budgetedQueries == PlanBudgets.shuffleBudgets keys") {
    assert(graft.tools.Sf1Tier.budgetedQueries.toSet ==
      PlanBudgets.shuffleBudgets.keySet)
  }

  test("Sf1Tier.rewiredQueries are real catalog queries, disjoint from " +
    "the budgeted tier (no double-run, no typo'd silent no-op)") {
    val r = graft.tools.Sf1Tier.rewiredQueries
    assert(r.distinct == r)
    val unknown = r.toSet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"unknown: $unknown")
    val overlap = r.toSet.intersect(graft.tools.Sf1Tier.budgetedQueries.toSet)
    assert(overlap.isEmpty, s"already budgeted: $overlap")
  }

  test("Sf1Tier.roundAdditions are real catalog queries, disjoint from " +
    "both earlier tiers") {
    val a = graft.tools.Sf1Tier.roundAdditions
    assert(a.distinct == a)
    val unknown = a.toSet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"unknown: $unknown")
    val earlier = graft.tools.Sf1Tier.budgetedQueries.toSet ++
      graft.tools.Sf1Tier.rewiredQueries.toSet
    val overlap = a.toSet.intersect(earlier)
    assert(overlap.isEmpty, s"already covered: $overlap")
  }
}
