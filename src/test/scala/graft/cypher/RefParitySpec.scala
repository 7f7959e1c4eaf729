package graft.cypher

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The reference's own benchmark queries (benchmark/src/queries.ts),
  * run through the string front-end with their original shapes —
  * $param property maps, bare `RETURN u`, unaliased projections,
  * uppercase COUNT, LIMIT — adapted only in label/property names to
  * this repo's test graph (§3 mapping: User/Event as in the reference;
  * Part plays Item with RELATED_TO; Customer-PLACED->Order plays
  * User-OWNS->Item).
  */
class RefParitySpec extends SparkSpec {

  private def raw(name: String) = graft.graph.GraphLoader.table(spark, sfDir, name)

  // Category A: point lookups
  test("lookup_user_by_id: MATCH (u:User {id: $id}) RETURN u") {
    val got = graph.cypher(
      "MATCH (u:User {user_id: $id}) RETURN u", Map("id" -> 5L))
    assert(got.count() == 1)
    assert(got.schema.head.name == "u")
  }

  test("lookup_item_by_id via WHERE i.id = $id") {
    val got = graph.cypher(
      "MATCH (i:Part) WHERE i.p_partkey = $id RETURN i", Map("id" -> 3L))
    assert(got.count() == 1)
  }

  // Category B: pattern matching
  test("user_items: (u {id:$id})-[:PLACED]->(o) RETURN o") {
    val got = graph.cypher(
      "MATCH (u:Customer {c_custkey: $id})-[:PLACED]->(o:Order) RETURN o",
      Map("id" -> 1L))
    val want = raw("orders").filter(col("o_custkey") === 1L).count()
    assert(got.count() == want)
  }

  test("items_by_category shape: unaliased projections + LIMIT") {
    val got = graph.cypher(
      """MATCH (c:Customer)-[:PLACED]->(o:Order {o_orderstatus: $st})
         RETURN c.c_custkey, o.o_orderkey LIMIT 100""", Map("st" -> "F"))
    assert(got.columns.toSeq == Seq("c.c_custkey", "o.o_orderkey"))
    assert(got.count() <= 100 && got.count() > 0)
  }

  test("items_owned_by_multiple: two-sided pattern with WHERE u1.id < u2.id") {
    val got = graph.cypher(
      """MATCH (o1:Order)-[:CONTAINS]->(i:Part)<-[:CONTAINS]-(o2:Order)
         WHERE o1.o_orderkey < o2.o_orderkey
         RETURN i.p_partkey, o1.o_orderkey, o2.o_orderkey LIMIT 50""")
    assert(got.count() == 50)
  }

  // Category C: aggregations (uppercase COUNT/AVG, unaliased group keys)
  test("user_item_counts: COUNT + ORDER BY DESC LIMIT") {
    val got = graph.cypher(
      """MATCH (u:User)-[:TRIGGERED]->(e:Event)
         RETURN u.user_id, COUNT(e) AS cnt ORDER BY cnt DESC, u.user_id LIMIT 10""")
    assert(got.columns.toSeq == Seq("u.user_id", "cnt"))
    assert(got.count() == 10)
  }

  test("category_stats: AVG + COUNT(*) over a label scan") {
    val got = graph.cypher(
      """MATCH (i:Part) RETURN i.p_brand, AVG(i.p_retailprice) AS avg_price,
         COUNT(*) AS cnt ORDER BY i.p_brand""")
    val want = raw("part").groupBy(col("p_brand"))
      .agg(avg("p_retailprice"), count(lit(1))).count()
    assert(got.count() == want)
  }

  test("user_event_summary: param + grouped counts") {
    val got = graph.cypher(
      """MATCH (u:User {user_id: $id})-[:TRIGGERED]->(e:Event)
         RETURN e.event_type, COUNT(*) AS cnt""", Map("id" -> 3L))
    val want = graft.graph.GraphLoader.eventsTable(spark, sfDir)
      .filter(col("user_id") === 3L).select("event_type").distinct().count()
    assert(got.count() == want)
  }

  // Category D: traversals
  test("related_items_depth1/2: RETURN DISTINCT r LIMIT 50") {
    val d1 = graph.cypher(
      """MATCH (o:Order {o_orderkey: $id})-[:CONTAINS]->(i:Part)-[:RELATED_TO]->(r:Part)
         RETURN DISTINCT r LIMIT 50""", Map("id" -> 1L))
    assert(d1.count() > 0)
    val d2 = graph.cypher(
      """MATCH (o:Order {o_orderkey: $id})-[:CONTAINS]->(i:Part)-[:RELATED_TO*1..2]->(r:Part)
         RETURN DISTINCT r LIMIT 50""", Map("id" -> 1L))
    assert(d2.count() > 0 && d2.count() <= 50)
  }

  // CC application flow (reference test/cypherqueries.test.ts:880-935,
  // 743-768, 912-935): CRUD sequences with string ids as regular
  // properties, run verbatim modulo the content-hashed _id model.
  test("CC flow: create, match-by-prop, edge to new node, SET via rel, DETACH DELETE") {
    // creates a sequence and increments it (":880")
    val (g1, _) = graph.cypherWrite(
      "CREATE (s:CC_InvoiceSequence {id: $sequenceId, prefix: $prefix, lastNumber: $lastNumber})",
      Map("sequenceId" -> "seq-1", "prefix" -> "INV", "lastNumber" -> 5L))
    val cur = g1.cypher(
      "MATCH (s:CC_InvoiceSequence {id: $sequenceId}) RETURN s.lastNumber AS lastNumber",
      Map("sequenceId" -> "seq-1"))
    assert(cur.collect()(0).getAs[Long]("lastNumber") == 5L)
    val (g2, _) = g1.cypherWrite(
      "MATCH (s:CC_InvoiceSequence {id: $sequenceId}) SET s.lastNumber = $newNumber",
      Map("sequenceId" -> "seq-1", "newNumber" -> 6L))
    assert(g2.cypher(
      "MATCH (s:CC_InvoiceSequence {id: 'seq-1'}) RETURN s.lastNumber AS n")
      .collect()(0).getAs[Long]("n") == 6L)

    // user → invoice via CREATE from a matched endpoint, SET through the
    // relationship, then DETACH DELETE through a 2-hop match (":743",":912")
    val (g3, _) = g2.cypherWrite(
      "CREATE (u:CC_User {id: $id})", Map("id" -> "user-1"))
    val (g4, _) = g3.cypherWrite(
      """MATCH (u:CC_User {id: $userId})
         CREATE (u)-[:HAS_INVOICE]->(i:CC_Invoice {id: $invoiceId, status: $status})""",
      Map("userId" -> "user-1", "invoiceId" -> "inv-1", "status" -> "draft"))
    val (g5, _) = g4.cypherWrite(
      """MATCH (u:CC_User {id: $userId})-[:HAS_INVOICE]->(i:CC_Invoice {id: $invoiceId})
         SET i.status = $status""",
      Map("userId" -> "user-1", "invoiceId" -> "inv-1", "status" -> "sent"))
    val st = g5.cypher(
      """MATCH (u:CC_User {id: 'user-1'})-[:HAS_INVOICE]->(i:CC_Invoice {id: 'inv-1'})
         RETURN i.status AS status""")
    assert(st.collect()(0).getAs[String]("status") == "sent")
    val (g6, _) = g5.cypherWrite(
      """MATCH (u:CC_User {id: $userId})-[:HAS_INVOICE]->(i:CC_Invoice {id: $invoiceId})
         DETACH DELETE i""",
      Map("userId" -> "user-1", "invoiceId" -> "inv-1"))
    assert(g6.cypher("MATCH (i:CC_Invoice {id: 'inv-1'}) RETURN i").count() == 0)
    assert(g6.nodeFrame("CC_User").count() == 1)
  }

  // Misc patterns (reference cypherqueries.test.ts:1010-1113)
  test("node identity <>, collect(map), rel-prop param filter") {
    // duplicates via (i),(i2) WHERE i <> i2 (":1010")
    val (ga, _) = graph.cypherWrite("CREATE (i:Image {image_id: 'img-001', name: 'First'})")
    val (gb, _) = ga.cypherWrite("CREATE (i:Image {image_id: 'img-001', name: 'Second'})")
    val (gc, _) = gb.cypherWrite("CREATE (i:Image {image_id: 'img-002', name: 'Third'})")
    val dups = gc.cypher(
      """MATCH (i:Image), (i2:Image)
         WHERE i <> i2 AND i.image_id = i2.image_id
         RETURN DISTINCT i.image_id AS image_id""")
    assert(dups.collect().map(_.getString(0)).toSeq == Seq("img-001"))

    // collect({...}) object construction over a per-row created edge (":1030")
    val (gd, _) = gc.cypherWrite(
      "CREATE (u:AdminUser {user_id: 'u1', first_name: 'Alice'})")
    val (ge, _) = gd.cypherWrite(
      "CREATE (u:AdminUser {user_id: 'u2', first_name: 'Bob'})")
    val (gf, _) = ge.cypherWrite("CREATE (c:Company {company_id: 'c1', name: 'Acme'})")
    val (gg, _) = gf.cypherWrite(
      "MATCH (u:AdminUser), (c:Company) CREATE (u)-[:IS_ADMIN]->(c)")
    val admins = gg.cypher(
      """MATCH (u:AdminUser)-[:IS_ADMIN]->(c:Company)
         RETURN c.company_id AS company_id,
                collect({intellinaut_id: u.user_id, first_name: u.first_name}) AS intellinauts""")
      .collect()
    assert(admins.length == 1 && admins(0).getAs[String]("company_id") == "c1")
    val names = admins(0).getSeq[org.apache.spark.sql.Row](1)
      .map(_.getAs[String]("first_name")).toSet
    assert(names == Set("Alice", "Bob"))

    // relationship property filter with $param in the pattern (":1088")
    val (gh, _) = gg.cypherWrite("CREATE (p:Product {product_id: 'p1'})")
    val (gi, _) = gh.cypherWrite("CREATE (pi:ProductInfo {title: 'US Product', price: 99.99})")
    val (gj, _) = gi.cypherWrite("CREATE (pi:ProductInfo {title: 'EU Product', price: 89.99})")
    val (gk, _) = gj.cypherWrite(
      """MATCH (p:Product {product_id: 'p1'}), (pi:ProductInfo {title: 'US Product'})
         CREATE (p)-[:PRODUCT_INFO {market_place: 'us'}]->(pi)""")
    val (gl, _) = gk.cypherWrite(
      """MATCH (p:Product {product_id: 'p1'}), (pi:ProductInfo {title: 'EU Product'})
         CREATE (p)-[:PRODUCT_INFO {market_place: 'eu'}]->(pi)""")
    val us = gl.cypher(
      """MATCH (p:Product {product_id: $product_id})-[r:PRODUCT_INFO {market_place: $market_place}]->(pi:ProductInfo)
         RETURN pi.title AS title, pi.price AS price""",
      Map("product_id" -> "p1", "market_place" -> "us")).collect()
    assert(us.length == 1 && us(0).getAs[String]("title") == "US Product")
  }

  // Category E: writes
  test("create_user / update_user_name / create_item shapes with params") {
    val (g2, _) = graph.cypherWrite(
      "CREATE (u:BenchUser {_id: $id, name: $name, email: $email, created_at: $ts})",
      Map("id" -> 777L, "name" -> "Test User", "email" -> "t@example.com",
        "ts" -> 1700000000000L))
    assert(g2.nodeFrame("BenchUser").count() == 1)
    val (g3, _) = g2.cypherWrite(
      "MATCH (u:BenchUser {_id: $id}) SET u.name = $name",
      Map("id" -> 777L, "name" -> "Renamed"))
    assert(g3.nodeFrame("BenchUser").filter(col("name") === "Renamed").count() == 1)
  }
}
