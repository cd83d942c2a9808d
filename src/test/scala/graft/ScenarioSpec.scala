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

  test("IoT monitoring: alerts, location keys, $switch status (reference doc example)") {
    // reference documentation-examples.spec.js:811-884 — environmental
    // monitoring with alert thresholds, a composed location key, group
    // roll-up, and a $switch status over the alert percentage.
    val readings = fromJsonl(
      """{"deviceId": "d1", "timestamp": "2024-03-01T10:15:00Z", "temperature": 20.0, "humidity": 40.0,
          "location": {"building": "A", "floor": 1, "room": "r1"}}""",
      """{"deviceId": "d1", "timestamp": "2024-03-01T11:15:00Z", "temperature": 30.0, "humidity": 40.0,
          "location": {"building": "A", "floor": 1, "room": "r1"}}""",
      """{"deviceId": "d2", "timestamp": "2024-03-01T10:30:00Z", "temperature": 17.0, "humidity": 20.0,
          "location": {"building": "B", "floor": 2, "room": "r2"}}""",
      """{"deviceId": "d2", "timestamp": "2024-03-01T11:30:00Z", "temperature": 16.0, "humidity": 70.0,
          "location": {"building": "B", "floor": 2, "room": "r2"}}""",
      """{"deviceId": "d3", "timestamp": "2024-03-01T12:00:00Z", "temperature": 22.0, "humidity": 50.0,
          "location": {"building": "C", "floor": 3, "room": "r3"}}""")
    val rows = agg(readings,
      """[
        {"$addFields": {
          "hour": {"$hour": {"$toDate": "$timestamp"}},
          "tempAlert": {"$or": [{"$lt": ["$temperature", 18]}, {"$gt": ["$temperature", 26]}]},
          "humidityAlert": {"$or": [{"$lt": ["$humidity", 30]}, {"$gt": ["$humidity", 60]}]},
          "locationKey": {"$concat": ["$location.building", "-",
            {"$toString": "$location.floor"}, "-", "$location.room"]}}},
        {"$group": {"_id": "$locationKey",
          "deviceId": {"$first": "$deviceId"},
          "avgTemperature": {"$avg": "$temperature"},
          "minTemp": {"$min": "$temperature"}, "maxTemp": {"$max": "$temperature"},
          "tempAlertCount": {"$sum": {"$cond": ["$tempAlert", 1, 0]}},
          "humidityAlertCount": {"$sum": {"$cond": ["$humidityAlert", 1, 0]}},
          "totalReadings": {"$sum": 1}}},
        {"$addFields": {
          "tempRange": {"$subtract": ["$maxTemp", "$minTemp"]},
          "alertPercentage": {"$multiply": [{"$divide": [
            {"$add": ["$tempAlertCount", "$humidityAlertCount"]}, "$totalReadings"]}, 100]}}},
        {"$addFields": {
          "status": {"$switch": {"branches": [
            {"case": {"$gt": ["$alertPercentage", 50]}, "then": "Critical"},
            {"case": {"$gt": ["$alertPercentage", 20]}, "then": "Warning"},
            {"case": {"$lte": ["$alertPercentage", 20]}, "then": "Normal"}],
            "default": "Unknown"}}}},
        {"$sort": {"alertPercentage": -1}}
      ]""")
    assert(rows.map(_("_id")) == Seq("B-2-r2", "A-1-r1", "C-3-r3"))
    val byKey = rows.map(r => r("_id") -> r).toMap
    val b = byKey("B-2-r2")
    assert(b("status") == "Critical" && b("alertPercentage") == 200.0)
    assert(b("tempAlertCount") == 2L && b("humidityAlertCount") == 2L)
    assert(b("avgTemperature") == 16.5 && b("tempRange") == 1.0)
    val a = byKey("A-1-r1")
    assert(a("status") == "Warning" && a("alertPercentage") == 50.0)
    assert(a("deviceId") == "d1" && a("tempRange") == 10.0)
    val c = byKey("C-3-r3")
    assert(c("status") == "Normal" && c("alertPercentage") == 0.0)
  }

  test("ecommerce: customer tiers and regional sales (reference doc examples)") {
    // reference documentation-examples.spec.js:441-530 — double $lookup +
    // double $unwind, $in on a tag array, $cond premium counting, and the
    // regional rollup, with exact expectations from the fixture data.
    val products = fromJsonl(
      """{"_id": 1, "name": "MacBook Pro 16", "category": "laptops", "price": 2499, "stock": 15, "tags": ["premium", "professional"]}""",
      """{"_id": 2, "name": "ThinkPad X1 Carbon", "category": "laptops", "price": 1899, "stock": 8, "tags": ["business", "lightweight"]}""",
      """{"_id": 3, "name": "iPad Pro 12.9", "category": "tablets", "price": 1099, "stock": 25, "tags": ["premium", "creative"]}""",
      """{"_id": 4, "name": "Surface Pro 9", "category": "tablets", "price": 999, "stock": 12, "tags": ["business", "2-in-1"]}""",
      """{"_id": 5, "name": "iPhone 15 Pro", "category": "phones", "price": 999, "stock": 30, "tags": ["premium", "flagship"]}""")
    val customers = fromJsonl(
      """{"_id": 201, "name": "Alice Johnson", "tier": "premium"}""",
      """{"_id": 202, "name": "Bob Smith", "tier": "gold"}""",
      """{"_id": 203, "name": "Charlie Brown", "tier": "silver"}""")
    val orders = fromJsonl(
      """{"_id": 1001, "customerId": 201, "productId": 1, "quantity": 1, "status": "shipped",   "shippingAddress": {"city": "San Francisco", "state": "CA"}}""",
      """{"_id": 1002, "customerId": 202, "productId": 3, "quantity": 2, "status": "delivered", "shippingAddress": {"city": "New York", "state": "NY"}}""",
      """{"_id": 1003, "customerId": 201, "productId": 5, "quantity": 1, "status": "processing", "shippingAddress": {"city": "San Francisco", "state": "CA"}}""",
      """{"_id": 1004, "customerId": 203, "productId": 2, "quantity": 1, "status": "shipped",   "shippingAddress": {"city": "Austin", "state": "TX"}}""",
      """{"_id": 1005, "customerId": 202, "productId": 4, "quantity": 1, "status": "delivered", "shippingAddress": {"city": "New York", "state": "NY"}}""")
    val colls = Map("customers" -> customers, "products" -> products)

    val tiers = agg(orders,
      """[
        {"$lookup": {"from": "customers", "localField": "customerId", "foreignField": "_id", "as": "customer"}},
        {"$lookup": {"from": "products", "localField": "productId", "foreignField": "_id", "as": "product"}},
        {"$unwind": "$customer"}, {"$unwind": "$product"},
        {"$addFields": {
          "orderValue": {"$multiply": ["$quantity", "$product.price"]},
          "customerName": "$customer.name", "customerTier": "$customer.tier",
          "isPremiumProduct": {"$in": ["premium", "$product.tags"]}}},
        {"$group": {"_id": "$customerId",
          "customerName": {"$first": "$customerName"},
          "customerTier": {"$first": "$customerTier"},
          "totalOrders": {"$sum": 1},
          "totalSpent": {"$sum": "$orderValue"},
          "avgOrderValue": {"$avg": "$orderValue"},
          "premiumProductsPurchased": {"$sum": {"$cond": ["$isPremiumProduct", 1, 0]}}}},
        {"$sort": {"totalSpent": -1}}
      ]""", colls)
    assert(tiers.map(r => (r("_id"), r("customerName"), r("totalSpent"),
      r("avgOrderValue"), r("premiumProductsPurchased"))) == Seq(
      (201L, "Alice Johnson", 3498L, 1749.0, 2L),
      (202L, "Bob Smith", 3197L, 1598.5, 1L),
      (203L, "Charlie Brown", 1899L, 1899.0, 0L)))
    assert(tiers.head("customerTier") == "premium" && tiers.head("totalOrders") == 2L)

    val regional = agg(orders,
      """[
        {"$match": {"status": {"$in": ["shipped", "delivered"]}}},
        {"$lookup": {"from": "products", "localField": "productId", "foreignField": "_id", "as": "product"}},
        {"$unwind": "$product"},
        {"$group": {"_id": "$shippingAddress.state",
          "orderCount": {"$sum": 1},
          "totalRevenue": {"$sum": {"$multiply": ["$quantity", "$product.price"]}},
          "avgOrderValue": {"$avg": {"$multiply": ["$quantity", "$product.price"]}},
          "topCategories": {"$addToSet": "$product.category"}}},
        {"$sort": {"totalRevenue": -1}}
      ]""", colls)
    assert(regional.map(r => (r("_id"), r("orderCount"), r("totalRevenue"), r("avgOrderValue"))) ==
      Seq(("NY", 2L, 3197L, 1598.5), ("CA", 1L, 2499L, 2499.0), ("TX", 1L, 1899L, 1899.0)))
    assert(regional.head("topCategories").asInstanceOf[scala.collection.Seq[String]].toSeq ==
      Seq("tablets")) // both NY orders were tablets; set dedups
  }

  test("ecommerce: top-selling products with inventory alerts (reference doc example)") {
    // reference documentation-examples.spec.js:398-440 — lookup+unwind
    // enrichment, revenue rollup, low-stock flag via $first.
    val products = fromJsonl(
      """{"_id": 1, "name": "MacBook Pro 16", "category": "laptops", "price": 2499, "stock": 15}""",
      """{"_id": 2, "name": "ThinkPad X1 Carbon", "category": "laptops", "price": 1899, "stock": 8}""",
      """{"_id": 3, "name": "iPad Pro 12.9", "category": "tablets", "price": 1099, "stock": 25}""",
      """{"_id": 4, "name": "Surface Pro 9", "category": "tablets", "price": 999, "stock": 12}""",
      """{"_id": 5, "name": "iPhone 15 Pro", "category": "phones", "price": 999, "stock": 30}""")
    val orders = fromJsonl(
      """{"_id": 1001, "productId": 1, "quantity": 1}""",
      """{"_id": 1002, "productId": 3, "quantity": 2}""",
      """{"_id": 1003, "productId": 5, "quantity": 1}""",
      """{"_id": 1004, "productId": 2, "quantity": 1}""",
      """{"_id": 1005, "productId": 4, "quantity": 1}""")
    val rows = agg(orders,
      """[
        {"$lookup": {"from": "products", "localField": "productId", "foreignField": "_id", "as": "product"}},
        {"$unwind": "$product"},
        {"$addFields": {"revenue": {"$multiply": ["$quantity", "$product.price"]},
                        "lowStock": {"$lt": ["$product.stock", 10]}}},
        {"$group": {"_id": "$product.name",
          "totalRevenue": {"$sum": "$revenue"},
          "totalQuantitySold": {"$sum": "$quantity"},
          "averageOrderSize": {"$avg": "$quantity"},
          "lowStockAlert": {"$first": "$lowStock"},
          "category": {"$first": "$product.category"}}},
        {"$sort": {"totalRevenue": -1}},
        {"$limit": 5}
      ]""", Map("products" -> products))
    // iPhone and Surface tie at 999 — the reference's sort is stable on its
    // in-memory order, ours is tie-unspecified, so the tail is a set
    assert(rows.take(3).map(r => (r("_id"), r("totalRevenue"), r("lowStockAlert"))) == Seq(
      ("MacBook Pro 16", 2499L, false),
      ("iPad Pro 12.9", 2198L, false),
      ("ThinkPad X1 Carbon", 1899L, true)))
    assert(rows.drop(3).map(_("_id")).toSet == Set("iPhone 15 Pro", "Surface Pro 9"))
    assert(rows.find(_("_id") == "iPad Pro 12.9").get("totalQuantitySold") == 2L)
    assert(rows.find(_("_id") == "iPad Pro 12.9").get("averageOrderSize") == 2.0)
  }

  test("content: engagement scoring and tag trends (reference doc examples)") {
    // reference documentation-examples.spec.js:531-621 — $size-weighted
    // engagement formula, post-lookup $match, and per-tag rollups.
    val authors = fromJsonl(
      """{"_id": 401, "name": "Sarah Wilson"}""",
      """{"_id": 402, "name": "Mike Chen"}""",
      """{"_id": 403, "name": "Emma Davis"}""")
    val posts = fromJsonl(
      """{"_id": 301, "title": "Getting Started with MongoDB Aggregation", "authorId": 401, "publishedDate": "2024-01-10", "tags": ["mongodb", "database", "tutorial"], "views": 1250, "likes": 89, "comments": ["Great tutorial!", "Very helpful", "Thanks for sharing"]}""",
      """{"_id": 302, "title": "Advanced JavaScript Patterns", "authorId": 402, "publishedDate": "2024-01-12", "tags": ["javascript", "patterns", "advanced"], "views": 2100, "likes": 156, "comments": ["Mind blown!", "Excellent examples"]}""",
      """{"_id": 303, "title": "TypeScript Best Practices", "authorId": 401, "publishedDate": "2024-01-15", "tags": ["typescript", "best-practices"], "views": 1875, "likes": 134, "comments": ["Very useful", "Bookmarked!", "Great insights"]}""",
      """{"_id": 304, "title": "Node.js Performance Optimization", "authorId": 403, "publishedDate": "2024-01-18", "tags": ["nodejs", "performance"], "views": 1650, "likes": 112, "comments": ["Impressive results"]}""")
    val rows = agg(posts,
      """[
        {"$lookup": {"from": "authors", "localField": "authorId", "foreignField": "_id", "as": "author"}},
        {"$unwind": "$author"},
        {"$addFields": {
          "engagementScore": {"$add": [
            {"$multiply": ["$views", 0.1]},
            {"$multiply": ["$likes", 2]},
            {"$multiply": [{"$size": "$comments"}, 5]}]},
          "commentsCount": {"$size": "$comments"},
          "authorName": "$author.name"}},
        {"$match": {"views": {"$gte": 1000}}},
        {"$sort": {"engagementScore": -1}},
        {"$project": {"title": 1, "authorName": 1, "views": 1, "likes": 1,
          "commentsCount": 1, "engagementScore": {"$round": ["$engagementScore", 2]}, "tags": 1}},
        {"$limit": 10}
      ]""", Map("authors" -> authors))
    assert(rows.map(r => (r("authorName"), r("engagementScore"), r("commentsCount"))) == Seq(
      ("Mike Chen", 532.0, 2),
      ("Sarah Wilson", 470.5, 3),
      ("Emma Davis", 394.0, 1),
      ("Sarah Wilson", 318.0, 3)))

    val trends = agg(posts,
      """[
        {"$unwind": "$tags"},
        {"$group": {"_id": "$tags",
          "postCount": {"$sum": 1}, "totalViews": {"$sum": "$views"},
          "avgEngagement": {"$avg": {"$add": ["$views", {"$multiply": ["$likes", 10]}]}},
          "latestPost": {"$max": "$publishedDate"},
          "authors": {"$addToSet": "$authorId"}}},
        {"$addFields": {"authorCount": {"$size": "$authors"},
          "avgViewsPerPost": {"$divide": ["$totalViews", "$postCount"]}}},
        {"$project": {"tag": "$_id", "postCount": 1, "totalViews": 1,
          "avgViewsPerPost": {"$round": ["$avgViewsPerPost", 0]}, "authorCount": 1, "latestPost": 1}}
      ]""")
    assert(trends.length == 10) // every tag in the fixtures is unique to one post
    val byTag = trends.map(r => r("tag") -> r).toMap
    assert(byTag("mongodb")("totalViews") == 1250L && byTag("mongodb")("avgViewsPerPost") == 1250L)
    assert(byTag("javascript")("authorCount") == 1 && byTag("javascript")("latestPost") == "2024-01-12")
  }

  test("HR: salary rollup with array $avg and $$NOW service years (reference doc example)") {
    // reference documentation-examples.spec.js:623-670 — $avg over the
    // per-employee performance ARRAY in $addFields, years-of-service from
    // current time, scalar {$max: '$avgPerformance'} (= the value itself,
    // so the $cond is always true and $first picks the encounter-first name).
    val employees = fromJsonl(
      """{"_id": 501, "name": "John Doe", "department": "engineering", "salary": 95000, "startDate": "2022-03-01", "performance": [8.5, 9.0, 8.8]}""",
      """{"_id": 502, "name": "Jane Smith", "department": "engineering", "salary": 110000, "startDate": "2021-06-15", "performance": [9.2, 9.1, 9.3]}""",
      """{"_id": 503, "name": "Bob Johnson", "department": "design", "salary": 75000, "startDate": "2023-01-20", "performance": [8.0, 8.5, 8.3]}""",
      """{"_id": 504, "name": "Alice Brown", "department": "marketing", "salary": 85000, "startDate": "2022-08-10", "performance": [8.8, 9.0, 8.9]}""")
    val rows = agg(employees,
      """[
        {"$addFields": {
          "avgPerformance": {"$avg": "$performance"},
          "yearsOfService": {"$divide": [
            {"$subtract": ["$$NOW", {"$toDate": "$startDate"}]},
            31557600000]}}},
        {"$group": {"_id": "$department",
          "employeeCount": {"$sum": 1},
          "avgSalary": {"$avg": "$salary"},
          "minSalary": {"$min": "$salary"}, "maxSalary": {"$max": "$salary"},
          "avgPerformance": {"$avg": "$avgPerformance"},
          "totalPayroll": {"$sum": "$salary"},
          "minYears": {"$min": "$yearsOfService"},
          "topPerformer": {"$first": {"$cond": [
            {"$eq": ["$avgPerformance", {"$max": "$avgPerformance"}]}, "$name", null]}}}},
        {"$addFields": {
          "avgSalaryFormatted": {"$round": ["$avgSalary", 0]},
          "salaryRange": {"$subtract": ["$maxSalary", "$minSalary"]}}},
        {"$sort": {"avgSalary": -1}}
      ]""")
    assert(rows.map(_("_id")) == Seq("engineering", "marketing", "design"))
    val eng = rows.head
    assert(eng("employeeCount") == 2L && eng("totalPayroll") == 205000L)
    assert(eng("avgSalary") == 102500.0 && eng("salaryRange") == 15000L)
    assert(eng("avgSalaryFormatted") == 102500.0)
    val john = (8.5 + 9.0 + 8.8) / 3; val jane = (9.2 + 9.1 + 9.3) / 3
    assert(eng("avgPerformance") == (john + jane) / 2)
    assert(eng("topPerformer") == "John Doe") // encounter-first (cond always true)
    // service years measured from $$NOW: all hires are 2021-2023, so the
    // department minimum sits in a sane live range rather than a fixed value
    val minYears = eng("minYears").asInstanceOf[Double]
    assert(minYears > 2.0 && minYears < 30.0)
    assert(rows(2)("_id") == "design" && rows(2)("avgSalary") == 75000.0)
  }

  test("finance: account activity summary with $switch tiers (reference doc example)") {
    // reference documentation-examples.spec.js:712-763 — conditional sums
    // over deposit/withdrawal signs, $addToSet categories, $max dates, and
    // an activity-level $switch, with exact expectations.
    val tx = fromJsonl(
      """{"_id": 601, "accountId": "ACC001", "type": "deposit",    "amount": 5000,  "date": "2024-01-15", "category": "salary"}""",
      """{"_id": 602, "accountId": "ACC001", "type": "withdrawal", "amount": -1200, "date": "2024-01-16", "category": "rent"}""",
      """{"_id": 603, "accountId": "ACC002", "type": "deposit",    "amount": 2500,  "date": "2024-01-17", "category": "freelance"}""",
      """{"_id": 604, "accountId": "ACC001", "type": "withdrawal", "amount": -350,  "date": "2024-01-18", "category": "groceries"}""",
      """{"_id": 605, "accountId": "ACC002", "type": "withdrawal", "amount": -800,  "date": "2024-01-19", "category": "utilities"}""")
    val rows = agg(tx,
      """[
        {"$addFields": {"d": {"$toDate": "$date"},
          "month": {"$month": {"$toDate": "$date"}},
          "isDeposit": {"$eq": ["$type", "deposit"]},
          "absAmount": {"$abs": "$amount"}}},
        {"$group": {"_id": "$accountId",
          "totalTransactions": {"$sum": 1},
          "totalDeposits": {"$sum": {"$cond": ["$isDeposit", "$amount", 0]}},
          "totalWithdrawals": {"$sum": {"$cond": ["$isDeposit", 0, {"$abs": "$amount"}]}},
          "netBalance": {"$sum": "$amount"},
          "avgTransactionSize": {"$avg": "$absAmount"},
          "largestTransaction": {"$max": "$absAmount"},
          "categories": {"$addToSet": "$category"},
          "lastActivity": {"$max": "$d"}}},
        {"$addFields": {
          "categoryCount": {"$size": "$categories"},
          "isPositiveBalance": {"$gt": ["$netBalance", 0]},
          "activityLevel": {"$switch": {"branches": [
            {"case": {"$gte": ["$totalTransactions", 4]}, "then": "High"},
            {"case": {"$gte": ["$totalTransactions", 2]}, "then": "Medium"},
            {"case": {"$lt": ["$totalTransactions", 2]}, "then": "Low"}],
            "default": "Unknown"}}}},
        {"$sort": {"netBalance": -1}}
      ]""")
    assert(rows.map(_("_id")) == Seq("ACC001", "ACC002"))
    val a1 = rows.head
    assert(a1("totalTransactions") == 3L && a1("totalDeposits") == 5000L)
    assert(a1("totalWithdrawals") == 1550L && a1("netBalance") == 3450L)
    assert(a1("avgTransactionSize") == 6550.0 / 3)
    assert(a1("largestTransaction") == 5000L && a1("categoryCount") == 3)
    assert(a1("categories").asInstanceOf[scala.collection.Seq[String]].toSeq ==
      Seq("groceries", "rent", "salary")) // engine returns sorted sets
    assert(a1("lastActivity").toString.startsWith("2024-01-18"))
    assert(a1("isPositiveBalance") == true && a1("activityLevel") == "Medium")
    val a2 = rows(1)
    assert(a2("totalTransactions") == 2L && a2("netBalance") == 1700L)
    assert(a2("avgTransactionSize") == 1650.0 && a2("activityLevel") == "Medium")
  }

  test("finance: spending anomalies by category (reference doc example)") {
    // reference documentation-examples.spec.js:764-808 — negative-amount
    // match, $abs spend, per-category stats and a derived consistency ratio.
    val tx = fromJsonl(
      """{"_id": 602, "accountId": "ACC001", "type": "withdrawal", "amount": -1200, "date": "2024-01-16", "category": "rent"}""",
      """{"_id": 601, "accountId": "ACC001", "type": "deposit",    "amount": 5000,  "date": "2024-01-15", "category": "salary"}""",
      """{"_id": 604, "accountId": "ACC001", "type": "withdrawal", "amount": -350,  "date": "2024-01-18", "category": "groceries"}""",
      """{"_id": 605, "accountId": "ACC002", "type": "withdrawal", "amount": -800,  "date": "2024-01-19", "category": "utilities"}""")
    val rows = agg(tx,
      """[
        {"$match": {"type": "withdrawal", "amount": {"$lt": 0}}},
        {"$addFields": {"spendAmount": {"$abs": "$amount"},
                        "dayOfWeek": {"$dayOfWeek": {"$toDate": "$date"}}}},
        {"$group": {"_id": "$category",
          "transactionCount": {"$sum": 1},
          "totalSpent": {"$sum": "$spendAmount"},
          "avgSpend": {"$avg": "$spendAmount"},
          "maxSpend": {"$max": "$spendAmount"},
          "minSpend": {"$min": "$spendAmount"},
          "accounts": {"$addToSet": "$accountId"}}},
        {"$addFields": {
          "spendRange": {"$subtract": ["$maxSpend", "$minSpend"]},
          "accountCount": {"$size": "$accounts"},
          "isHighSpend": {"$gt": ["$totalSpent", 1000]},
          "consistency": {"$divide": ["$avgSpend", {"$add": ["$spendRange", 1]}]}}},
        {"$addFields": {
          "consistency2": {"$divide": ["$avgSpend", {"$add": ["$spendRange", 1]}]}}},
        {"$sort": {"totalSpent": -1}}
      ]""")
    assert(rows.map(_("_id")) == Seq("rent", "utilities", "groceries"))
    val rent = rows.head
    assert(rent("transactionCount") == 1L && rent("totalSpent") == 1200L)
    assert(rent("spendRange") == 0L && rent("isHighSpend") == true)
    // the reference doc example reads $spendRange from the SAME $addFields
    // stage; like MongoDB, its engine evaluates each field against the
    // pre-stage document (aggregation.ts:743-748), so consistency is
    // null/NaN there too — replayed faithfully here
    assert(rent("consistency") == null)
    // computed in a following stage, the ratio is real
    assert(rent("consistency2") == 1200.0)
    assert(rows(1)("isHighSpend") == false && rows(1)("consistency2") == 800.0)
    assert(rows(2)("totalSpent") == 350L && rows(2)("accountCount") == 1)
  }

  test("social media: virality scoring over lookup + chained unwinds (reference doc example)") {
    // reference documentation-examples.spec.js:887-956 — $lookup + struct
    // unwind + hashtag unwind, $addToSet of a nested field, $push of a
    // computed struct, and a $sqrt/$log10 scoring formula with $switch.
    val users = fromJsonl(
      """{"_id": 1, "username": "ada"}""", """{"_id": 2, "username": "bo"}""")
    val posts = fromJsonl(
      """{"postId": 1, "userId": 1, "hashtags": ["ai", "ml"], "likes": 100, "shares": 30,
          "content": "deep dive into large-scale model training pipelines and what we learned",
          "timestamp": "2024-03-01"}""",
      """{"postId": 2, "userId": 2, "hashtags": ["ai"], "likes": 200, "shares": 50,
          "content": "short take", "timestamp": "2024-03-02"}""",
      """{"postId": 3, "userId": 1, "hashtags": ["ml"], "likes": 30, "shares": 5,
          "content": "notebook tricks", "timestamp": "2024-03-03"}""")
    val rows = agg(posts,
      """[
        {"$lookup": {"from": "users", "localField": "userId", "foreignField": "_id", "as": "user"}},
        {"$unwind": "$user"},
        {"$unwind": "$hashtags"},
        {"$group": {"_id": "$hashtags",
          "postCount": {"$sum": 1},
          "totalLikes": {"$sum": "$likes"},
          "avgEngagement": {"$avg": {"$add": ["$likes", {"$multiply": ["$shares", 3]}]}},
          "uniqueUsers": {"$addToSet": "$user.username"},
          "recentPosts": {"$push": {"title": {"$substr": ["$content", 0, 50]}, "timestamp": "$timestamp"}}}},
        {"$addFields": {"userCount": {"$size": "$uniqueUsers"}}},
        {"$addFields": {
          "viralityScore": {"$multiply": ["$avgEngagement", {"$sqrt": "$userCount"},
            {"$log10": {"$add": ["$postCount", 1]}}]}}},
        {"$addFields": {
          "trendingLevel": {"$switch": {"branches": [
            {"case": {"$gt": ["$viralityScore", 100]}, "then": "Viral"},
            {"case": {"$gt": ["$viralityScore", 50]}, "then": "Trending"},
            {"case": {"$gt": ["$viralityScore", 20]}, "then": "Popular"}],
            "default": "Normal"}}}},
        {"$sort": {"viralityScore": -1}},
        {"$project": {"hashtag": "$_id", "postCount": 1, "userCount": 1,
          "avgEngagement": {"$round": ["$avgEngagement", 1]},
          "viralityScore": {"$round": ["$viralityScore", 2]},
          "trendingLevel": 1, "recentPosts": 1}}
      ]""", Map("users" -> users))
    def bitRound(x: Double, p: Int): Double = { val f = math.pow(10, p); math.floor(x * f + 0.5) / f }
    val ai = rows.find(_("hashtag") == "ai").get
    // ai: engagements 190, 350 → avg 270; users {ada, bo}; 2 posts
    val aiV = 270.0 * math.sqrt(2.0) * math.log10(3.0)
    assert(ai("postCount") == 2L && ai("userCount") == 2)
    assert(ai("avgEngagement") == 270.0 && ai("viralityScore") == bitRound(aiV, 2))
    assert(ai("trendingLevel") == "Viral")
    val ml = rows.find(_("hashtag") == "ml").get
    // ml: engagements 190, 45 → avg 117.5; users {ada}; 2 posts
    val mlV = 117.5 * 1.0 * math.log10(3.0)
    assert(ml("avgEngagement") == 117.5 && ml("viralityScore") == bitRound(mlV, 2))
    assert(ml("trendingLevel") == "Trending")
    assert(rows.map(_("hashtag")) == Seq("ai", "ml")) // sorted by virality desc
    // push preserved encounter order through lookup + two unwinds
    val titles = ai("recentPosts").asInstanceOf[scala.collection.Seq[org.apache.spark.sql.Row]]
      .map(_.getAs[String]("title"))
    assert(titles == Seq("deep dive into large-scale model training pipeline", "short take"))
  }

  test("CLI stdout path streams partition-at-a-time without collecting") {
    import org.apache.spark.sql.functions._
    // multi-partition result: jsonLines must yield every row lazily via
    // toLocalIterator (bounded driver memory), in partition order
    val df = spark.range(0, 1000).repartition(8).select(col("id"))
    val lines = Cli.jsonLines(Aggo.aggregate(df, """[{"$match": {"id": {"$gte": 0}}}]"""))
    assert(lines.map(l => org.json4s.jackson.JsonMethods.parse(l) \ "id")
      .map { case org.json4s.JInt(v) => v.toLong; case other => sys.error(s"bad line: $other") }
      .toSet == (0L until 1000L).toSet)
    val prettyLines = Cli.jsonLines(df.limit(3), pretty = true)
    assert(prettyLines.next().contains("\"id\""))
  }
}
