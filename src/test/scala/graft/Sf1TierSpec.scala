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
}
