package graft.cypher

import graft.SparkSpec
import graft.graph.{EdgeType, PropertyGraph}
import org.apache.spark.sql.{DataFrame, Row}
import scala.util.chaining._

/** Multi-label shim: secondary labels as a `_labels` array property on the
  * primary label's frame (reference stores label ARRAYS — db.ts:47-69,
  * SET-labels translator.ts:921-933, REMOVE-labels translator.ts:1149-1156).
  *
  * Scenarios ported from the reference's "Multiple Labels" suite
  * (test/cypherqueries.test.ts:1805-1920) plus its SET-label translator
  * tests (test/translator.test.ts:463-486).
  */
class MultiLabelSpec extends SparkSpec {

  private def empty: PropertyGraph = {
    spark.sparkContext // force the lazy shared session (SparkSession.active)
    PropertyGraph(Map.empty[String, DataFrame], Map.empty[EdgeType, DataFrame])
  }

  private def run(g: PropertyGraph, q: String): PropertyGraph = g.cypherWrite(q)._1

  private def strings(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(r => String.valueOf(r.get(0))).sorted

  /** Array column as an immutable Seq (Row.getAs[Seq] can't cast Spark's
    * mutable ArraySeq).
    */
  private def seqOf(r: Row, field: String): Seq[String] =
    r.getSeq[String](r.fieldIndex(field)).toSeq

  test("CREATE (n:A:B:C) returns all labels, primary first (ref cypherqueries:1807)") {
    val (_, ret) = empty.cypherWrite(
      "CREATE (n:Person:Employee:Manager {name: 'Alice', level: 5}) " +
        "RETURN n.name AS name, labels(n) AS nodeLabels")
    val row = ret.get.collect().head
    assert(row.getAs[String]("name") == "Alice")
    assert(seqOf(row, "nodeLabels") == Seq("Person", "Employee", "Manager"))
  }

  test("MATCH by any single label finds a multi-label node (ref cypherqueries:1825)") {
    val g = run(empty, "CREATE (n:A:B:C {id: 'test-1'})")
    for (l <- Seq("A", "B", "C"))
      assert(g.cypher(s"MATCH (n:$l) RETURN n.id AS id").count() == 1, s"label $l")
  }

  test("MATCH by multiple labels requires all of them (ref cypherqueries:1840,1854)") {
    var g = run(empty, "CREATE (n:A:B {id: 'ab'})")
    g = run(g, "CREATE (n:A:B:C {id: 'abc'})")
    g = run(g, "CREATE (n:A {id: 'a'})")
    g = run(g, "CREATE (n:B:C {id: 'bc'})")
    assert(strings(g.cypher("MATCH (n:A:B) RETURN n.id AS id")) == Seq("ab", "abc"))
    assert(strings(g.cypher("MATCH (n:A:B:C) RETURN n.id AS id")) == Seq("abc"))
    assert(strings(g.cypher("MATCH (n:B) RETURN n.id AS id")) == Seq("ab", "abc", "bc"))
    assert(g.cypher("MATCH (n:A) RETURN n.id AS id").count() == 3)
  }

  test("relationships between multi-label endpoints (ref cypherqueries:1866)") {
    var g = run(empty, "CREATE (a:Person:Employee {name: 'Alice'})")
    g = run(g, "CREATE (b:Person:Manager {name: 'Bob'})")
    g = run(g,
      """MATCH (a:Person:Employee {name: 'Alice'})
         MATCH (b:Person:Manager {name: 'Bob'})
         CREATE (a)-[:REPORTS_TO]->(b)""")
    val got = g.cypher(
      """MATCH (a:Employee)-[:REPORTS_TO]->(b:Manager)
         RETURN a.name AS employee, b.name AS manager""").collect()
    assert(got.length == 1)
    assert(got.head.getAs[String]("employee") == "Alice")
    assert(got.head.getAs[String]("manager") == "Bob")
  }

  test("SET property through a multi-label match (ref cypherqueries:1889)") {
    var g = run(empty, "CREATE (n:A:B:C {id: 'test-1', value: 10})")
    g = run(g, "MATCH (n:A:B:C {id: 'test-1'}) SET n.value = 20")
    val got = g.cypher("MATCH (n:A:B:C {id: 'test-1'}) RETURN n.value AS value").collect()
    assert(got.length == 1 && got.head.getAs[Long]("value") == 20L)
  }

  test("DELETE through a multi-label match removes it from every label (ref cypherqueries:1900)") {
    var g = run(empty, "CREATE (n:A:B:C {id: 'test-1'})")
    g = run(g, "MATCH (n:A:B:C {id: 'test-1'}) DELETE n")
    for (l <- Seq("A", "B", "C"))
      assert(g.cypher(s"MATCH (n:$l) RETURN n").count() == 0, s"label $l")
  }

  test("SET n:Foo / SET n:Foo:Bar append to the label set (ref translator:463,476)") {
    var g = run(empty, "CREATE (n:A {id: 'x'})")
    g = run(g, "MATCH (n:A) SET n:Foo")
    g = run(g, "MATCH (n:A) SET n:Foo:Bar") // Foo again: no duplicate
    val labels = g.cypher("MATCH (n:A) RETURN labels(n) AS ls")
      .collect().head.pipe(r => seqOf(r, "ls"))
    assert(labels == Seq("A", "Foo", "Bar"))
    assert(g.cypher("MATCH (n:Foo) RETURN n.id AS id").count() == 1)
    assert(g.cypher("MATCH (n:Bar) RETURN n.id AS id").count() == 1)
  }

  test("REMOVE of a secondary label is non-detaching (ref translator:1149 semantics)") {
    var g = run(empty, "CREATE (a:A:B:C {id: 'x'})-[:R]->(b:D {id: 'y'})")
    g = run(g, "MATCH (n:A) REMOVE n:B")
    val labels = g.cypher("MATCH (n:A) RETURN labels(n) AS ls")
      .collect().head.pipe(r => seqOf(r, "ls"))
    assert(labels == Seq("A", "C"), "B gone, node survives")
    assert(g.cypher("MATCH (n:B) RETURN n").count() == 0)
    // the edge survives too: the node was never detached
    assert(g.cypher("MATCH (:A)-[:R]->(m:D) RETURN m.id AS id").count() == 1)
    // removing a label the node does not carry is a no-op
    val g2 = run(g, "MATCH (n:A) REMOVE n:Nope")
    assert(g2.cypher("MATCH (n:A) RETURN n").count() == 1)
  }

  test("REMOVE of the PRIMARY label demotes, never detaches (ref db:47-69 semantics)") {
    var g = run(empty, "CREATE (a:A:B:C {id: 'x'})-[:R]->(b:D {id: 'y'})")
    g = run(g, "MATCH (n:A) REMOVE n:A")
    // the node survives under its first remaining label, which becomes
    // the new primary; the rest stay secondary
    val labels = g.cypher("MATCH (n:B) RETURN labels(n) AS ls")
      .collect().head.pipe(r => seqOf(r, "ls"))
    assert(labels == Seq("B", "C"), "A gone, node survives as B:C")
    assert(g.cypher("MATCH (n:A) RETURN n").count() == 0)
    // the incident edge survives the demotion (retyped, not detached)
    assert(g.cypher("MATCH (:B)-[:R]->(m:D) RETURN m.id AS id").count() == 1)
    // removing the LAST label keeps a label-less node (matchable by (n))
    var g2 = run(empty, "CREATE (a:OnlyOne {id: 'z'})")
    g2 = run(g2, "MATCH (n:OnlyOne) REMOVE n:OnlyOne")
    assert(g2.cypher("MATCH (n:OnlyOne) RETURN n").count() == 0)
    assert(strings(g2.cypher("MATCH (n) RETURN n.id AS id")) == Seq("z"))
  }

  test("primary-label REMOVE retypes edges whose BOTH endpoints demote") {
    // a:A:B -[:R]-> c:A:C — removing :A demotes a→B and c→C; the edge
    // must survive the two-step retype (src pass creates (R,B,A), dst
    // pass must find it and finish at (R,B,C))
    var g = run(empty, "CREATE (a:A:B {id: 'x'})-[:R]->(c:A:C {id: 'y'})")
    g = run(g, "MATCH (n:A) REMOVE n:A")
    assert(g.cypher("MATCH (n:A) RETURN n").count() == 0)
    assert(strings(g.cypher("MATCH (b:B)-[:R]->(c:C) RETURN c.id AS id")) == Seq("y"))
  }

  test("demotePrimaryLabel refuses an id collision in the destination frame") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array, lit}
    // the moved row's content-hashed id already exists under B — merging
    // would silently build a duplicate-id frame; the guard must throw
    val a = Seq((1L, "x")).toDF("_id", "p").withColumn("_labels", array(lit("B")))
    val b = Seq((1L, "resident")).toDF("_id", "p")
    val g = PropertyGraph(Map("A" -> a, "B" -> b), Map.empty)
      .registerSecondaryLabels("A", Set("B"))
    val err = intercept[RuntimeException](
      g.demotePrimaryLabel("A", a.select("_id")))
    assert(err.getMessage.contains("collision"))
  }

  test("demotePrimaryLabel moves rows whose target label is NOT in the registry") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array, lit}
    // registry gap: the row's first remaining label was never registered
    // as a secondary of A — the node must still move there, not vanish
    val a = Seq((1L, "x")).toDF("_id", "p").withColumn("_labels", array(lit("Ghost")))
    val g = PropertyGraph(Map("A" -> a), Map.empty)
    val g2 = g.demotePrimaryLabel("A", a.select("_id"))
    assert(g2.hasLabel("Ghost"), "unregistered target label must be minted")
    assert(g2.nodeFrame("Ghost").count() == 1)
    assert(g2.nodeFrame("A").count() == 0)
  }

  test("WHERE n:Label consults secondary labels") {
    var g = run(empty, "CREATE (n:A:B {id: 'ab'})")
    g = run(g, "CREATE (n:A {id: 'a'})")
    assert(strings(g.cypher("MATCH (n:A) WHERE n:B RETURN n.id AS id")) == Seq("ab"))
    assert(strings(g.cypher("MATCH (n:A) WHERE NOT n:B RETURN n.id AS id")) == Seq("a"))
  }

  test("db.labels() lists secondary labels (ref integration:2589)") {
    val g = run(empty, "CREATE (n:Person:Employee {id: 'x'})")
    assert(strings(g.cypher("CALL db.labels()")) == Seq("Employee", "Person"))
  }

  test("snapshot save/load preserves the secondary-label registry") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-mlabel").toString
    var g = run(empty, "CREATE (n:A:B {id: 'ab'})")
    g.save(tmp)
    val g2 = PropertyGraph.load(spark, tmp)
    assert(strings(g2.cypher("MATCH (n:B) RETURN n.id AS id")) == Seq("ab"))
    assert(g2.cypher("MATCH (n:A) RETURN labels(n) AS ls")
      .collect().head.pipe(r => seqOf(r, "ls")) == Seq("A", "B"))
  }

  test("labels(n) stays 1-element and properties() unchanged on plain graphs") {
    val got = graph.cypher(
      "MATCH (r:Region {r_regionkey: 0}) RETURN labels(r) AS ls, keys(r) AS ks").collect().head
    assert(seqOf(got, "ls") == Seq("Region"))
    assert(!seqOf(got, "ks").contains("_labels"))
  }
}
