package graft

import graft.events.Basket

/** Market-basket goldens on a hand-checkable fixture: distinct
  * incidence (duplicate item in a basket counts once), support over
  * ALL guarded baskets (singletons included in N), both rule
  * directions, and the maxBasket guard dropping an oversized basket
  * loudly rather than exploding. The mb1/mb2 catalog queries pin the
  * same operators against a DuckDB self-join at sf0.01. */
class BasketSpec extends SparkSpec {
  import spark.implicits._

  // baskets: 1={a,b,c}, 2={a,b}, 3={a}, 4={b,c} (c duplicated in 4)
  private lazy val items = Seq(
    (1L, "a"), (1L, "b"), (1L, "c"),
    (2L, "a"), (2L, "b"),
    (3L, "a"),
    (4L, "b"), (4L, "c"), (4L, "c"))
    .toDF("basket", "item")

  test("frequentPairs: distinct incidence, exact counts, support over " +
    "all guarded baskets") {
    val p = Basket.frequentPairs(items, "basket", "item", minCount = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(p == Map(("a", "b") -> ((2L, 0.5)), ("b", "c") -> ((2L, 0.5))))
    // minCount=1 also surfaces the (a,c) singleton pair
    val all = Basket.frequentPairs(items, "basket", "item", minCount = 1)
    assert(all.count() == 3)
  }

  test("associationRules: both directions, confidence n/n_ante, " +
    "lift n·N/(n_ante·n_cons)") {
    val r = Basket.associationRules(items, "basket", "item", minCount = 2)
      .collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getLong(3), x.getLong(4),
          x.getDouble(5), x.getDouble(6))).toMap
    // counts: a=3, b=3, c=2 baskets; N=4
    assert(r(("a", "b")) == ((2L, 3L, 3L, 0.666667, 0.888889)))
    assert(r(("b", "a")) == ((2L, 3L, 3L, 0.666667, 0.888889)))
    assert(r(("b", "c")) == ((2L, 3L, 2L, 0.666667, 1.333333)))
    assert(r(("c", "b")) == ((2L, 2L, 3L, 1.0, 1.333333)))
    assert(r.size == 4)
  }

  test("maxBasket guard: an oversized basket is dropped from pairs AND " +
    "from N; ParameterError on degenerate inputs") {
    val p = Basket.frequentPairs(items, "basket", "item",
      minCount = 1, maxBasket = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // basket 1 (3 items) dropped: pairs only from 2 and 4; N=3
    assert(p == Map(("a", "b") -> ((1L, 0.333333)),
      ("b", "c") -> ((1L, 0.333333))))
    intercept[ParameterError] {
      Basket.frequentPairs(items, "basket", "item", minCount = 0)
    }
    intercept[ParameterError] {
      Basket.frequentPairs(items, "basket", "item", 1, maxBasket = 1)
    }
  }
}
