package graft.cypher

import graft.SparkSpec
import graft.graph.{EdgeType, PropertyGraph}

/** Reference real-world scenarios and edge cases run verbatim
  * (test/scenarios.test.ts — Social Network :27-58, Edge Cases
  * :391-460), built from an empty graph exactly like the reference's
  * fresh test client.
  */
class ScenarioSpec extends SparkSpec {

  private def empty = {
    spark // force session init: an all-empty graph has no frame to get it from
    PropertyGraph(Map.empty, Map.empty)
  }

  test("social network: friend edges, counts, property filters (:27)") {
    var g = empty
    for ((n, e, j) <- Seq(("Alice", "alice@example.com", 2020L),
        ("Bob", "bob@example.com", 2021L), ("Charlie", "charlie@example.com", 2021L),
        ("Diana", "diana@example.com", 2022L), ("Eve", "eve@example.com", 2022L)))
      g = g.cypherWrite(s"CREATE (u:User {name: '$n', email: '$e', joined: $j})")._1
    for ((a, b, s) <- Seq(("Alice", "Bob", 2021), ("Bob", "Charlie", 2021),
        ("Charlie", "Diana", 2022), ("Alice", "Eve", 2022)))
      g = g.cypherWrite(
        s"MATCH (a:User {name: '$a'}), (b:User {name: '$b'}) CREATE (a)-[:FRIENDS {since: $s}]->(b)")._1

    val aliceFriends = g.cypher(
      "MATCH (a:User {name: 'Alice'})-[:FRIENDS]->(friend:User) RETURN friend.name")
      .collect().map(_.getString(0)).toSet
    assert(aliceFriends == Set("Bob", "Eve"))
    val cnt = g.cypher("MATCH (a:User)-[:FRIENDS]->(b:User) RETURN COUNT(a)").collect()
    assert(cnt(0).getLong(0) == 4L)
    assert(g.cypher("MATCH (u:User) WHERE u.joined = 2021 RETURN u.name").count() == 2)
  }

  test("e-commerce: categories, purchases, order history (:83)") {
    var g = empty
    for (n <- Seq("Electronics", "Books", "Clothing"))
      g = g.cypherWrite(s"CREATE (c:Category {name: '$n'})")._1
    for ((n, pr, st) <- Seq(("Laptop", 999.99, 50L), ("Headphones", 149.99, 200L),
        ("TypeScript Handbook", 39.99, 100L), ("T-Shirt", 24.99, 500L)))
      g = g.cypherWrite(s"CREATE (p:Product {name: '$n', price: $pr, stock: $st})")._1
    for ((p, c) <- Seq("Laptop" -> "Electronics", "Headphones" -> "Electronics",
        "TypeScript Handbook" -> "Books", "T-Shirt" -> "Clothing"))
      g = g.cypherWrite(
        s"MATCH (p:Product {name: '$p'}), (c:Category {name: '$c'}) CREATE (p)-[:IN_CATEGORY]->(c)")._1

    assert(g.cypher(
      """MATCH (p:Product)-[:IN_CATEGORY]->(c:Category {name: 'Electronics'})
         RETURN p.name, p.price""").count() == 2)
    assert(g.cypher(
      "MATCH (p:Product) WHERE p.price > 100 RETURN p.name, p.price").count() == 2)
    val low = g.cypher(
      "MATCH (p:Product) WHERE p.stock < 100 RETURN p.name, p.stock").collect()
    assert(low.length == 1 && low(0).getString(0) == "Laptop")

    // order history (":122")
    var h = empty
    h = h.cypherWrite("CREATE (c:Customer {name: 'Jane', customerId: 'CUST-001'})")._1
    for ((oid, st, tot) <- Seq(("ORD-001", "delivered", 59.97),
        ("ORD-002", "shipped", 19.99), ("ORD-003", "pending", 39.98)))
      h = h.cypherWrite(
        s"CREATE (o:Order {orderId: '$oid', status: '$st', total: $tot})")._1
    for (oid <- Seq("ORD-001", "ORD-002", "ORD-003"))
      h = h.cypherWrite(
        s"MATCH (c:Customer {customerId: 'CUST-001'}), (o:Order {orderId: '$oid'}) CREATE (c)-[:PLACED]->(o)")._1
    assert(h.cypher(
      """MATCH (c:Customer {customerId: 'CUST-001'})-[:PLACED]->(o:Order)
         RETURN COUNT(o)""").collect()(0).getLong(0) == 3L)
    val pend = h.cypher(
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
         WHERE o.status = 'pending' RETURN o.orderId, o.total""").collect()
    assert(pend.length == 1 && pend(0).getString(0) == "ORD-003")
  }

  test("knowledge graph: untyped rel matches across all edge types (:155)") {
    var g = empty
    for (q <- Seq(
        "CREATE (e:Entity {name: 'Albert Einstein', type: 'Person', born: 1879})",
        "CREATE (e:Entity {name: 'Theory of Relativity', type: 'Theory', year: 1905})",
        "CREATE (e:Entity {name: 'Germany', type: 'Country'})",
        "CREATE (e:Entity {name: 'Switzerland', type: 'Country'})",
        "CREATE (e:Entity {name: 'Princeton University', type: 'Institution'})",
        "CREATE (e:Entity {name: 'Nobel Prize in Physics', type: 'Award', year: 1921})"))
      g = g.cypherWrite(q)._1
    for ((rel, tgt) <- Seq("DEVELOPED" -> "Theory of Relativity",
        "BORN_IN" -> "Germany", "WORKED_AT" -> "Princeton University",
        "RECEIVED" -> "Nobel Prize in Physics", "LIVED_IN" -> "Switzerland"))
      g = g.cypherWrite(
        s"MATCH (e:Entity {name: 'Albert Einstein'}), (t:Entity {name: '$tgt'}) CREATE (e)-[:$rel]->(t)")._1

    val dev = g.cypher(
      """MATCH (e:Entity {name: 'Albert Einstein'})-[:DEVELOPED]->(t:Entity)
         RETURN t.name, t.type""").collect()
    assert(dev(0).getString(0) == "Theory of Relativity")
    assert(g.cypher(
      "MATCH (e:Entity) WHERE e.type = 'Person' RETURN e.name").count() == 1)
    // untyped [r] spans all five relationship types
    assert(g.cypher(
      """MATCH (e:Entity {name: 'Albert Einstein'})-[r]->(target:Entity)
         RETURN COUNT(r)""").collect()(0).getLong(0) == 5L)
  }

  test("task management: all-pairs edge CREATE, multi-assignment (:192)") {
    var g = empty
    g = g.cypherWrite("CREATE (p:Project {name: 'Website Redesign', status: 'active'})")._1
    for ((n, r) <- Seq("Alice" -> "designer", "Bob" -> "developer", "Charlie" -> "developer"))
      g = g.cypherWrite(s"CREATE (u:TeamMember {name: '$n', role: '$r'})")._1
    for ((t, st, pr) <- Seq(("Design mockups", "completed", "high"),
        ("Implement frontend", "in_progress", "high"), ("Setup CI/CD", "pending", "medium"),
        ("Write tests", "pending", "medium"), ("Documentation", "pending", "low")))
      g = g.cypherWrite(s"CREATE (t:Task {title: '$t', status: '$st', priority: '$pr'})")._1
    // all-pairs (5 tasks × 1 project) per-row edge creation
    g = g.cypherWrite("MATCH (t:Task), (p:Project) CREATE (t)-[:BELONGS_TO]->(p)")._1
    for ((t, m) <- Seq("Design mockups" -> "Alice", "Implement frontend" -> "Bob",
        "Setup CI/CD" -> "Charlie", "Write tests" -> "Bob", "Write tests" -> "Charlie"))
      g = g.cypherWrite(
        s"MATCH (t:Task {title: '$t'}), (m:TeamMember {name: '$m'}) CREATE (t)-[:ASSIGNED_TO]->(m)")._1

    assert(g.cypher(
      """MATCH (t:Task)-[:BELONGS_TO]->(p:Project) RETURN COUNT(t)""")
      .collect()(0).getLong(0) == 5L)
    assert(g.cypher(
      """MATCH (t:Task)-[:ASSIGNED_TO]->(m:TeamMember {name: 'Bob'})
         RETURN t.title, t.status""").count() == 2)
    assert(g.cypher(
      "MATCH (t:Task) WHERE t.priority = 'high' RETURN t.title").count() == 2)
    assert(g.cypher(
      "MATCH (t:Task) WHERE t.status = 'pending' RETURN COUNT(t)")
      .collect()(0).getLong(0) == 3L)
    // unassigned tasks via the anti-join pattern predicate (the reference
    // notes it had NOT implemented this — we have)
    val unassigned = g.cypher(
      """MATCH (t:Task) WHERE NOT (t)-[:ASSIGNED_TO]->(:TeamMember)
         RETURN t.title""").collect().map(_.getString(0)).toSet
    assert(unassigned == Set("Documentation"))
  }

  test("edge cases: empty results, unicode, escapes, nulls, booleans, lists (:391)") {
    // unknown label errors in our typed model — the loaded graph simply
    // has no such frame; empty RESULT from an existing label:
    assert(graph.cypher(
      "MATCH (n:Nation) WHERE n.n_nationkey < 0 RETURN n").count() == 0)

    val (g1, _) = empty.cypherWrite(
      "CREATE (u:User {name: '日本語', emoji: '🎉', arabic: 'مرحبا'})")
    val u = g1.cypher("MATCH (u:User) RETURN u.name, u.emoji, u.arabic").collect()(0)
    assert(u.getString(0) == "日本語" && u.getString(1) == "🎉" && u.getString(2) == "مرحبا")

    var g2 = empty
    g2 = g2.cypherWrite("CREATE (n:Note {content: 'Line 1\\nLine 2\\tTabbed'})")._1
    g2 = g2.cypherWrite("CREATE (n:Note {content: 'Quote: \\\"Hello\\\"'})")._1
    g2 = g2.cypherWrite("CREATE (n:Note {content: \"Single quote: 'test'\"})")._1
    assert(g2.cypher("MATCH (n:Note) RETURN n.content").count() == 3)

    val (g3, _) = empty.cypherWrite(
      "CREATE (u:User {name: 'Test', middleName: null, age: 25})")
    val t = g3.cypher("MATCH (u:User) RETURN u.name, u.middleName, u.age").collect()(0)
    assert(t.getString(0) == "Test" && t.isNullAt(1) && t.getLong(2) == 25L)

    val (g4, _) = empty.cypherWrite(
      "CREATE (u:User {name: 'Active', isActive: true, isAdmin: false})")
    val b = g4.cypher("MATCH (u:User) RETURN u.isActive, u.isAdmin").collect()(0)
    assert(b.getBoolean(0) && !b.getBoolean(1))

    val (g5, _) = empty.cypherWrite(
      "CREATE (u:User {name: 'Tagged', tags: ['admin', 'user', 'verified']})")
    val tags = g5.cypher("MATCH (u:User) RETURN u.tags").collect()(0).getSeq[String](0)
    assert(tags == Seq("admin", "user", "verified"))

    val (g6, _) = empty.cypherWrite(
      "CREATE (n:Number {int: 0, negative: -42, float: 3.14159, large: 9999999999})")
    val n = g6.cypher(
      "MATCH (n:Number) RETURN n.int, n.negative, n.float, n.large").collect()(0)
    assert(n.getLong(0) == 0L && n.getLong(1) == -42L &&
      math.abs(n.getDouble(2) - 3.14159) < 1e-9 && n.getLong(3) == 9999999999L)
  }

  test("content management: articles, tags, authors (:238)") {
    var g = empty
    for ((nm, bio) <- Seq("Jane Writer" -> "Tech blogger", "John Coder" -> "Developer advocate"))
      g = g.cypherWrite(
        s"CREATE (a:Author {name: '$nm', bio: '$bio', verified: true})")._1
    for (t <- Seq("javascript", "typescript", "tutorial"))
      g = g.cypherWrite(s"CREATE (t:Tag {name: '$t', slug: '$t', postCount: 0})")._1
    for ((ti, sl, st, v) <- Seq(
        ("Getting Started with TypeScript", "getting-started-typescript", "published", 1500L),
        ("Advanced JavaScript Patterns", "advanced-js-patterns", "published", 2300L),
        ("Draft Article", "draft-article", "draft", 0L)))
      g = g.cypherWrite(
        s"CREATE (a:Article {title: '$ti', slug: '$sl', status: '$st', views: $v})")._1
    for ((a, sl) <- Seq("Jane Writer" -> "getting-started-typescript",
        "John Coder" -> "advanced-js-patterns", "Jane Writer" -> "draft-article"))
      g = g.cypherWrite(
        s"MATCH (a:Author {name: '$a'}), (ar:Article {slug: '$sl'}) CREATE (a)-[:WROTE]->(ar)")._1
    assert(g.cypher(
      "MATCH (a:Article) WHERE a.status = 'published' RETURN a.title").count() == 2)
    assert(g.cypher(
      """MATCH (author:Author {name: 'Jane Writer'})-[:WROTE]->(article:Article)
         RETURN article.title""").count() == 2)
    assert(g.cypher(
      "MATCH (a:Article) WHERE a.views > 1000 RETURN a.title, a.views").count() == 2)
    val cnt = g.cypher(
      "MATCH (a:Article) WHERE a.status = 'published' RETURN COUNT(a)").collect()
    assert(cnt(0).getLong(0) == 2L)
  }

  test("stress shapes: bulk create via UNWIND, complex WHERE, string ops (:304)") {
    // the reference loops 50 single CREATEs; the batch-native form is one
    // UNWIND CREATE (same rows, one plan)
    val (g, _) = empty.cypherWrite(
      """UNWIND range(0, 49) AS i
         CREATE (p:Product {name: 'Product ' + toString(i), price: 10 + i * 5,
                            stock: i % 10 * 10, active: i % 2 = 0})""")
    assert(g.cypher("MATCH (p:Product) RETURN p.name").count() == 50)
    val filtered = g.cypher(
      """MATCH (p:Product)
         WHERE p.price > 50 AND p.price < 200 AND p.stock > 30
         RETURN p.name, p.price, p.stock LIMIT 10""").collect()
    assert(filtered.length <= 10 && filtered.nonEmpty)
    assert(filtered.forall(r => r.getLong(1) > 50 && r.getLong(1) < 200 && r.getLong(2) > 30))
  }

  test("conrad: CREATE full path with param in prop map (:373)") {
    val (g, _) = empty.cypherWrite(
      """CREATE (a:Man {name: $name})-[:IS_MARRIED_TO]->(b:Woman {name: "Maëva"})""",
      Map("name" -> "Conrad"))
    val conrad = g.cypher("MATCH (a:Man) RETURN a.name AS name").collect()
    assert(conrad.length == 1 && conrad(0).getString(0) == "Conrad")
    assert(g.cypher(
      "MATCH (:Man)-[:IS_MARRIED_TO]->(w:Woman) RETURN w.name").collect()(0)
      .getString(0) == "Maëva")
  }
}
