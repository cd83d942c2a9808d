package graft

import org.scalatest.funsuite.AnyFunSuite
import TestSpark._

/** End-to-end scenario on FIXTURES.md's ecommerce shape — the analogue of
  * the reference's documentation-examples/fixture suites: nested structs,
  * arrays of structs, a cross-collection $lookup, and the README flagship
  * composite, all in one pipeline run. */
class ScenarioSpec extends AnyFunSuite {

  private val orders = fromJsonl(
    """{"orderId": "o1", "customerId": 1, "status": "delivered",
        "items": [{"name": "kb", "price": 50.0, "quantity": 2, "category": "tech"},
                   {"name": "mug", "price": 10.0, "quantity": 1, "category": "home"}],
        "shippingAddress": {"city": "SF", "country": "US"}}""",
    """{"orderId": "o2", "customerId": 2, "status": "delivered",
        "items": [{"name": "gpu", "price": 900.0, "quantity": 1, "category": "tech"}],
        "shippingAddress": {"city": "NYC", "country": "US"}}""",
    """{"orderId": "o3", "customerId": 1, "status": "cancelled",
        "items": [{"name": "lamp", "price": 40.0, "quantity": 3, "category": "home"}],
        "shippingAddress": {"city": "SF", "country": "US"}}""")

  private val customers = fromJsonl(
    """{"customerId": 1, "name": "Ada", "tier": "gold"}""",
    """{"customerId": 2, "name": "Bo", "tier": "bronze"}""")

  test("ecommerce: unwind items, revenue by category, enrich with customer tier") {
    val rows = agg(orders,
      """[
        {"$match": {"status": "delivered"}},
        {"$unwind": "$items"},
        {"$addFields": {"revenue": {"$multiply": ["$items.price", "$items.quantity"]}}},
        {"$group": {"_id": {"cat": "$items.category", "cust": "$customerId"},
                    "rev": {"$sum": "$revenue"}, "n": {"$sum": 1}}},
        {"$lookup": {"from": "customers", "localField": "_id.cust",
                      "foreignField": "customerId", "as": "c"}},
        {"$unwind": "$c"},
        {"$project": {"category": "$_id.cat", "customer": "$c.name",
                      "tier": "$c.tier", "rev": 1, "n": 1, "_id": 0}},
        {"$sort": {"rev": -1}}
      ]""",
      Map("customers" -> customers))
    assert(rows.map(r => (r("category"), r("customer"), r("tier"), r("rev"))) == Seq(
      ("tech", "Bo", "bronze", 900.0),
      ("tech", "Ada", "gold", 100.0),
      ("home", "Ada", "gold", 10.0)))
  }

  test("nested address rollup with $sortByCount") {
    val rows = agg(orders, """[{"$sortByCount": "$shippingAddress.city"}]""")
    assert(rows.map(r => (r("_id"), r("count"))) == Seq(("SF", 2L), ("NYC", 1L)))
  }
}
