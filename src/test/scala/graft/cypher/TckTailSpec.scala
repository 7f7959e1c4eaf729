package graft.cypher

import graft.SparkSpec

/** openCypher TCK long-tail semantics: the next ~100 scenario shapes
  * beyond [[TckSemanticsSpec]], covering the expression / literal /
  * aggregation / clause families the public TCK exercises
  * (tck/features/{expressions,clauses}; the reference vendors the same
  * suite, /root/reference/test/tck/README.md, and claims 100% of it).
  *
  * Each test pins several scenarios of one family. Assertions are the
  * openCypher-specified values; where graft deliberately diverges the
  * test says so inline and the divergence is listed in
  * [[TckSemanticsSpec]]'s Scaladoc.
  */
class TckTailSpec extends SparkSpec {

  private def scalar(expr: String): Any = {
    val r = graph.cypher(s"RETURN $expr AS x").collect()(0)
    if (r.isNullAt(0)) null else r.get(0)
  }

  private def rows(q: String): Seq[Seq[Any]] =
    graph.cypher(q).collect().toSeq.map(_.toSeq)

  private def col(q: String): Seq[Any] = rows(q).map(_.head)

  // ---- Literals (TCK: expressions/literals) ----

  test("integer literals: decimal, hex, exponent floats") {
    assert(scalar("13") == 13L)
    assert(scalar("0x10") == 16L)
    assert(scalar("0xFF") == 255L)
    assert(scalar("0xab") == 171L)
    assert(scalar("1e3") == 1000.0)
    assert(scalar("1.5e-2") == 0.015)
    assert(scalar("2E2") == 200.0)
    assert(scalar(".5") == 0.5) // leading-dot float form
  }

  test("string literals: quotes and escapes") {
    assert(scalar("'it\\'s'") == "it's")
    assert(scalar("\"dq\"") == "dq")
    assert(scalar("'a\\nb'") == "a\nb")
    assert(scalar("'a\\tb'") == "a\tb")
    assert(scalar("'a\\\\b'") == "a\\b")
    assert(scalar("'\\u0041'") == "A")
    assert(scalar("''") == "")
  }

  test("nested list and map literals") {
    assert(scalar("[[1, 2], [3]]") == Seq(Seq(1L, 2L), Seq(3L)))
    assert(scalar("[]") == Seq.empty)
    // divergence: heterogeneous list literals ([1, 'a', true]) are
    // unsupported — Spark arrays are homogeneous typed columns
    assert(scalar("{a: 1}.a") == 1L)
    assert(scalar("{a: {b: 2}}.a.b") == 2L)
    assert(scalar("{a: 1}.missing") == null)
  }

  // ---- Arithmetic (TCK: expressions/mathematical) ----

  test("operator precedence and associativity") {
    assert(scalar("2 + 3 * 4") == 14L)
    assert(scalar("(2 + 3) * 4") == 20L)
    assert(scalar("2 - 3 - 4") == -5L)          // left-assoc
    assert(scalar("2 ^ 3 ^ 2") == 512.0)        // ^ right-assoc
    assert(scalar("-2 ^ 2") == -4.0)            // unary minus binds looser than ^
    assert(scalar("2 * 3 % 4") == 2L)
    assert(scalar("10 - 2 ^ 2") == 6.0)
  }

  test("unary minus and float edges") {
    assert(scalar("-(-3)") == 3L)
    assert(scalar("- 3 + 5") == 2L)
    assert(scalar("0.0 = -0.0") == true)
    // divergence from Neo4j (Infinity): float division by zero is null,
    // matching the reference's SQL backend (SQLite NULL on div-by-zero)
    assert(scalar("1.0 / 0.0") == null)
    assert(scalar("-1.0 / 0.0") == null)
  }

  // ---- Comparison (TCK: expressions/comparison) ----

  test("chained comparisons AND pairwise") {
    assert(scalar("1 < 2 < 3") == true)
    assert(scalar("1 < 2 > 3") == false)
    assert(scalar("1 <= 1 <= 1") == true)
    assert(scalar("3 > 2 > 1") == true)
    assert(scalar("1 < 2 < null") == null)
  }

  test("list equality is element-wise") {
    assert(scalar("[1, 2] = [1, 2]") == true)
    assert(scalar("[1, 2] = [1, 3]") == false)
    assert(scalar("[1, 2] = [1]") == false)
    assert(scalar("[] = []") == true)
    assert(scalar("[[1]] = [[1]]") == true)
  }

  test("map equality") {
    assert(scalar("{a: 1} = {a: 1}") == true)
    assert(scalar("{a: 1} = {a: 2}") == false)
    assert(scalar("{a: 1} = {b: 1}") == false)
    assert(scalar("{a: 1, b: 2} = {b: 2, a: 1}") == true) // key order irrelevant
  }

  // ---- Boolean (TCK: expressions/boolean) ----

  test("XOR full truth table") {
    assert(scalar("true XOR true") == false)
    assert(scalar("true XOR false") == true)
    assert(scalar("false XOR true") == true)
    assert(scalar("false XOR false") == false)
    assert(scalar("false XOR null") == null)
    assert(scalar("null XOR null") == null)
  }

  test("NOT and implication shapes") {
    assert(scalar("NOT true") == false)
    assert(scalar("NOT (1 = 2)") == true)
    assert(scalar("NOT NOT true") == true)
    assert(scalar("(NOT true) OR true") == true)
  }

  // ---- Lists (TCK: expressions/list) ----

  test("list concatenation with + (list and element)") {
    assert(scalar("[1, 2] + [3]") == Seq(1L, 2L, 3L))
    assert(scalar("[1, 2] + []") == Seq(1L, 2L))
    assert(scalar("[] + [1]") == Seq(1L))
    assert(scalar("[1, 2] + 3") == Seq(1L, 2L, 3L)) // element append
  }

  test("IN over null list / null element semantics") {
    assert(scalar("1 IN null") == null)
    assert(scalar("null IN [1, 2]") == null)
    assert(scalar("null IN [1, null]") == null)
    assert(scalar("[1, 2] IN [[1, 2], [3]]") == true) // list element of list-of-lists
  }

  test("range with steps, descending, and degenerate bounds") {
    assert(scalar("range(0, 10, 3)") == Seq(0L, 3L, 6L, 9L))
    assert(scalar("range(0, -3, -1)") == Seq(0L, -1L, -2L, -3L))
    assert(scalar("range(3, 1)") == Seq.empty)
    assert(scalar("range(1, 1)") == Seq(1L))
    assert(scalar("range(5, 1, -2)") == Seq(5L, 3L, 1L))
  }

  test("tail/reverse/size edge cases") {
    assert(scalar("tail([1])") == Seq.empty)
    assert(scalar("tail([])") == Seq.empty)
    assert(scalar("reverse([1, 2, 3])") == Seq(3L, 2L, 1L))
    assert(scalar("reverse([])") == Seq.empty)
    assert(scalar("size([[1, 2], [3]])") == 2)
    assert(scalar("[1, 2, 3][null]") == null)
    assert(scalar("[1, 2, 3][null..1]") == null)
  }

  test("comprehension forms: WHERE-only, map-only, nested source") {
    assert(scalar("[x IN [1, 2, 3] WHERE x > 1]") == Seq(2L, 3L))
    assert(scalar("[x IN [1, 2] | x * 2]") == Seq(2L, 4L))
    assert(scalar("[x IN range(1, 4) WHERE x % 2 = 0 | x * x]") == Seq(4L, 16L))
    assert(scalar("[x IN [] | x]") == Seq.empty)
    assert(scalar("size([x IN [[1], [2, 3]] | size(x)])") == 2)
  }

  test("quantifiers over empty lists (vacuous truth)") {
    assert(scalar("all(x IN [] WHERE x > 0)") == true)
    assert(scalar("any(x IN [] WHERE x > 0)") == false)
    assert(scalar("none(x IN [] WHERE x > 0)") == true)
    assert(scalar("single(x IN [] WHERE x > 0)") == false)
    assert(scalar("single(x IN [1, 1] WHERE x = 1)") == false)
  }

  test("reduce over strings and empty lists") {
    assert(scalar("reduce(s = '', x IN ['a', 'b', 'c'] | s + x)") == "abc")
    assert(scalar("reduce(acc = 42, x IN [] | acc + x)") == 42L)
    assert(scalar("reduce(acc = 1, x IN [2, 3, 4] | acc * x)") == 24L)
  }

  // ---- Maps (TCK: expressions/map) ----

  test("map keys() and dynamic access") {
    assert(scalar("keys({a: 1, b: 2})").asInstanceOf[scala.collection.Seq[String]].toSeq.sorted == Seq("a", "b"))
    assert(scalar("{a: 1}['a']") == 1L)
    assert(scalar("{a: 1}['zz']") == null)
    assert(scalar("[1, 2, 3][1 + 1]") == 3L) // dynamic index expression
  }

  // ---- Type conversion (TCK: expressions/typeConversion) ----

  test("toBoolean surface") {
    assert(scalar("toBoolean('true')") == true)
    assert(scalar("toBoolean('false')") == false)
    assert(scalar("toBoolean('TRUE')") == true)
    assert(scalar("toBoolean('nope')") == null)
    assert(scalar("toBoolean(true)") == true)
  }

  test("toInteger / toFloat numeric arguments truncate, never round") {
    assert(scalar("toInteger(4.9)") == 4L)
    assert(scalar("toInteger(-4.9)") == -4L)
    assert(scalar("toInteger(4)") == 4L)
    assert(scalar("toFloat(4)") == 4.0)
    assert(scalar("toFloat('4')") == 4.0)
    assert(scalar("toString(3.0)") == "3.0")
  }

  // ---- Aggregation (TCK: expressions/aggregation) ----

  test("count(*) counts rows, count(x) skips nulls") {
    val q = "UNWIND [1, null, 2, null, 3] AS x RETURN count(*) AS c, count(x) AS cx"
    assert(rows(q) == Seq(Seq(5L, 3L)))
  }

  test("sum/avg/min/max null handling and empty groups") {
    val q = "UNWIND [1, null, 2] AS x RETURN sum(x) AS s, avg(x) AS a, min(x) AS mn, max(x) AS mx"
    assert(rows(q) == Seq(Seq(3L, 1.5, 1L, 2L)))
    // aggregates over all-null input: sum is 0, min is null
    val q2 = "UNWIND [null, null] AS x RETURN sum(x) AS s, min(x) AS mn, count(x) AS c"
    val r2 = graph.cypher(q2).collect()(0)
    assert(r2.get(0) == 0L || r2.get(0) == 0)
    assert(r2.isNullAt(1) && r2.getLong(2) == 0L)
  }

  test("collect skips nulls; DISTINCT dedupes") {
    assert(scalar("null").asInstanceOf[AnyRef] == null)
    val q = "UNWIND [1, null, 2, 1] AS x RETURN collect(x) AS c"
    assert(col(q) == Seq(Seq(1L, 2L, 1L)))
    val qd = "UNWIND [1, null, 2, 1] AS x RETURN count(DISTINCT x) AS c"
    assert(col(qd) == Seq(2L))
  }

  test("min/max over strings; sum promotes int+float") {
    val q = "UNWIND ['pear', 'apple', 'fig'] AS x RETURN min(x) AS mn, max(x) AS mx"
    assert(rows(q) == Seq(Seq("apple", "pear")))
    val q2 = "UNWIND [1, 2.5] AS x RETURN sum(x) AS s"
    assert(col(q2) == Seq(3.5))
  }

  test("stDev of singleton is 0; stDevP population formula") {
    val q = "UNWIND [10] AS x RETURN stDev(x) AS s, stDevP(x) AS p"
    assert(rows(q) == Seq(Seq(0.0, 0.0)))
    val q2 = "UNWIND [2, 4] AS x RETURN stDevP(x) AS p"
    assert(col(q2) == Seq(1.0))
  }

  test("percentile boundary ranks") {
    val q = "UNWIND [10, 20, 30, 40] AS x RETURN percentileDisc(x, 0.0) AS lo, percentileDisc(x, 0.25) AS q1"
    assert(rows(q) == Seq(Seq(10L, 10L)))
  }

  test("aggregation with implicit grouping key") {
    val q = """UNWIND [['a', 1], ['b', 2], ['a', 3]] AS p
              |RETURN p[0] AS k, sum(p[1]) AS s ORDER BY k""".stripMargin
    assert(rows(q) == Seq(Seq("a", 4L), Seq("b", 2L)))
  }

  // ---- UNWIND (TCK: clauses/unwind) ----

  test("UNWIND of empty list and null removes the row") {
    assert(rows("UNWIND [] AS x RETURN x").isEmpty)
    assert(rows("UNWIND null AS x RETURN x").isEmpty)
  }

  test("double UNWIND is a cross product; nested lists unwind one level") {
    val q = "UNWIND [1, 2] AS x UNWIND ['a', 'b'] AS y RETURN x, y ORDER BY x, y"
    assert(rows(q) == Seq(Seq(1L, "a"), Seq(1L, "b"), Seq(2L, "a"), Seq(2L, "b")))
    val q2 = "UNWIND [[1, 2], [3]] AS l RETURN size(l) AS s ORDER BY s"
    assert(col(q2) == Seq(1, 2))
    val q3 = "UNWIND [[1, 2], [3]] AS l UNWIND l AS x RETURN x ORDER BY x"
    assert(col(q3) == Seq(1L, 2L, 3L))
  }

  test("UNWIND a collected aggregate re-expands") {
    val q = """UNWIND [3, 1, 2] AS x WITH collect(x) AS xs
              |UNWIND xs AS y RETURN y ORDER BY y""".stripMargin
    assert(col(q) == Seq(1L, 2L, 3L))
  }

  // ---- WITH / ORDER / SKIP / LIMIT (TCK: clauses/with, return-orderby) ----

  test("LIMIT 0 returns nothing; SKIP past end returns nothing") {
    assert(rows("UNWIND [1, 2, 3] AS x RETURN x LIMIT 0").isEmpty)
    assert(rows("UNWIND [1, 2, 3] AS x RETURN x ORDER BY x SKIP 5").isEmpty)
    assert(col("UNWIND [1, 2, 3] AS x RETURN x ORDER BY x SKIP 1 LIMIT 1") == Seq(2L))
  }

  test("WITH DISTINCT dedupes mid-query") {
    val q = "UNWIND [1, 1, 2, 2, 3] AS x WITH DISTINCT x RETURN count(*) AS c"
    assert(col(q) == Seq(3L))
  }

  test("ORDER BY an aggregate alias") {
    val q = """UNWIND ['a', 'b', 'a', 'a'] AS x
              |RETURN x, count(*) AS c ORDER BY c DESC, x""".stripMargin
    assert(rows(q) == Seq(Seq("a", 3L), Seq("b", 1L)))
  }

  test("WITH ORDER BY + LIMIT then further processing") {
    val q = """UNWIND [5, 3, 1, 4, 2] AS x
              |WITH x ORDER BY x LIMIT 3
              |RETURN sum(x) AS s""".stripMargin
    assert(col(q) == Seq(6L))
  }

  test("RETURN DISTINCT treats nulls as equal (grouping semantics)") {
    val q = "UNWIND [null, null, 1] AS x RETURN DISTINCT x ORDER BY x"
    assert(rows(q).length == 2)
    val q2 = "UNWIND [[1, 2], [1, 2], [3]] AS l RETURN DISTINCT l"
    assert(rows(q2).length == 2) // lists compare by value for DISTINCT
  }

  // ---- UNION (TCK: clauses/union) ----

  test("UNION dedupes; UNION ALL keeps duplicates") {
    val q = "RETURN 1 AS x UNION RETURN 1 AS x UNION RETURN 2 AS x"
    assert(col(q).toSet == Set(1L, 2L) && rows(q).length == 2)
    val q2 = "RETURN 1 AS x UNION ALL RETURN 1 AS x"
    assert(rows(q2).length == 2)
  }

  // ---- Graph functions on real entities (TCK: expressions/graph) ----

  test("labels/keys/properties/exists on a matched node") {
    val q = """MATCH (n:Region) WHERE n.r_regionkey = 0
              |RETURN labels(n) AS ls, 'r_name' IN keys(n) AS hasName,
              |       properties(n).r_name AS nm, exists(n.no_such_prop) AS hasMissing""".stripMargin
    val r = graph.cypher(q).collect()(0)
    assert(r.getSeq[String](0) == Seq("Region"))
    assert(r.getBoolean(1))
    assert(r.getString(2) == "AFRICA")
    assert(!r.getBoolean(3))
  }

  test("id() is unique per label and stable within a query") {
    val q = """MATCH (n:Region) WITH id(n) AS i, n.r_regionkey AS k
              |RETURN count(DISTINCT i) AS distinctIds, count(*) AS total""".stripMargin
    val r = graph.cypher(q).collect()(0)
    assert(r.getLong(0) == r.getLong(1))
  }

  test("type() of a matched relationship") {
    val q = """MATCH (n:Nation)-[r:IN_REGION]->(:Region)
              |RETURN DISTINCT type(r) AS t""".stripMargin
    assert(col(q) == Seq("IN_REGION"))
  }

  test("count(n) over OPTIONAL MATCH skips null rows") {
    val q = """OPTIONAL MATCH (n:Region) WHERE n.r_regionkey > 999
              |RETURN count(n) AS c""".stripMargin
    assert(col(q) == Seq(0L))
  }

  test("missing property access yields null, and IS NULL filters on it") {
    val q = """MATCH (n:Region) WHERE n.no_such_prop IS NULL
              |RETURN count(*) AS c""".stripMargin
    assert(col(q) == Seq(5L))
  }

  // ---- CASE tail (TCK: expressions/conditional) ----

  test("CASE with expression operands and nesting") {
    assert(scalar("CASE 1 + 1 WHEN 2 THEN 'two' ELSE 'other' END") == "two")
    assert(scalar(
      "CASE WHEN 1 > 0 THEN CASE WHEN 2 > 1 THEN 'inner' END ELSE 'outer' END") == "inner")
    assert(scalar("CASE WHEN size([1, 2]) = 2 THEN 'yes' END") == "yes")
  }

  // ---- Temporal tail (TCK: expressions/temporal) ----

  test("date/datetime ordering and equality") {
    assert(scalar("date('2020-01-01') < date('2020-01-02')") == true)
    assert(scalar("date('2020-01-01') = date('2020-01-01')") == true)
    assert(scalar("datetime('2020-01-01 00:00:01') > datetime('2020-01-01 00:00:00')") == true)
  }

  test("string building with toString over mixed types") {
    assert(scalar("'n=' + toString(1 + 2)") == "n=3")
    assert(scalar("toString(1.5) + ''") == "1.5")
  }

  // ---- numeric function semantics (TCK: expressions/mathematical) ----

  test("round follows reference Math.round: half toward +inf") {
    assert(scalar("round(2.5)") == 3.0)
    assert(scalar("round(-2.5)") == -2.0) // NOT -3 (away-from-zero)
    assert(scalar("round(2.4)") == 2.0)
    assert(scalar("round(-2.6)") == -3.0)
    assert(scalar("ceil(2.1)") == 3.0)
    assert(scalar("floor(-2.1)") == -3.0)
    assert(scalar("sign(-5)") == -1L)
    assert(scalar("abs(-2.5)") == 2.5)
    assert(scalar("round(null)") == null)
  }

  // ---- MATCH clause tail (TCK: clauses/match) ----

  test("comma-separated patterns without shared vars are a cartesian product") {
    val q = "MATCH (r:Region), (n:Nation) RETURN count(*) AS c"
    assert(col(q) == Seq(125L))
  }

  test("comma-separated patterns with a shared var join on it") {
    // rel uniqueness applies across patterns WITHIN one MATCH: the two
    // anonymous rels cannot bind the same edge, so n <> m (5 x 5x4)
    val q = """MATCH (n:Nation)-[:IN_REGION]->(r:Region),
              |      (m:Nation)-[:IN_REGION]->(r)
              |RETURN count(*) AS c""".stripMargin
    assert(col(q) == Seq(100L))
    // separate MATCH clauses each get their own uniqueness scope: n = m
    // rows come back (5 x 5x5)
    val q2 = """MATCH (n:Nation)-[:IN_REGION]->(r:Region)
               |MATCH (m:Nation)-[:IN_REGION]->(r)
               |RETURN count(*) AS c""".stripMargin
    assert(col(q2) == Seq(125L))
  }

  test("relationship uniqueness (trail semantics) within one pattern") {
    // r1 and r2 must bind DIFFERENT edges, so a <> b always
    val q = """MATCH (a:Nation)-[r1:IN_REGION]->(x:Region)<-[r2:IN_REGION]-(b:Nation)
              |RETURN count(*) AS c""".stripMargin
    assert(col(q) == Seq(100L)) // 5 regions x 5x4 ordered distinct pairs
  }

  test("aggregation over zero matches returns a single row") {
    val q = """MATCH (n:Nation) WHERE n.n_nationkey < 0
              |RETURN count(*) AS c, count(n) AS cn, sum(n.n_nationkey) AS s""".stripMargin
    val r = graph.cypher(q).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 0L && r(0).getLong(1) == 0L)
    assert(r(0).get(2) == 0L) // Cypher: sum of no values = 0
  }

  test("WITH narrows scope: unprojected variables are gone") {
    intercept[Exception] {
      graph.cypher(
        "MATCH (n:Nation) WITH n.n_name AS x RETURN n.n_nationkey AS k").collect()
    }
  }

  test("grouping treats null keys as one group") {
    val q = """UNWIND [1, 1, null, null, 2] AS x
              |RETURN x, count(*) AS c ORDER BY x""".stripMargin
    val r = rows(q)
    assert(r.length == 3)
    assert(r.map(_(1)).toSet == Set(2L, 1L)) // (1->2), (2->1), (null->2)
  }

  test("DISTINCT on whole node variables") {
    val q = """MATCH (n:Nation)-[:IN_REGION]->(:Region)
              |RETURN DISTINCT n.n_regionkey AS rk ORDER BY rk""".stripMargin
    assert(col(q) == Seq(0L, 1L, 2L, 3L, 4L))
  }

  // ---- batch 3: rel properties, null-propagating HOFs, ordering ----

  test("properties()/keys()/exists() on a bound relationship") {
    val q = """MATCH (:Order)-[r:CONTAINS]->(:Part)
              |RETURN properties(r).l_quantity AS qty, 'l_quantity' IN keys(r) AS hasQ,
              |       exists(r.l_quantity) AS e LIMIT 1""".stripMargin
    val r = graph.cypher(q).collect()(0)
    assert(!r.isNullAt(0) && r.getBoolean(1) && r.getBoolean(2))
  }

  test("comprehensions and quantifiers over a null list are null") {
    assert(scalar("[x IN null | x]") == null)
    assert(scalar("[x IN null WHERE x > 0]") == null)
    assert(scalar("any(x IN null WHERE x > 0)") == null)
    assert(scalar("all(x IN null WHERE x > 0)") == null)
    assert(scalar("reduce(acc = 0, x IN null | acc + x)") == null)
  }

  test("quantifiers with null predicates follow three-valued logic") {
    // all: false dominates null; any: true dominates null
    assert(scalar("any(x IN [1, 2] WHERE x > 1)") == true)
    assert(scalar("all(x IN [1, 2] WHERE null)") == null)
    assert(scalar("any(x IN [1] WHERE null)") == null)
    assert(scalar("all(x IN [1, 2] WHERE x > 1)") == false) // a false decides
  }

  test("string slicing functions edge cases") {
    assert(scalar("substring('hello', 2)") == "llo")
    assert(scalar("left('abc', null)") == null)
    assert(scalar("right('abc', null)") == null)
    assert(scalar("split('a', 'x')") == Seq("a"))
    assert(scalar("toString(null)") == null)
  }

  test("indexing chains through lists of maps and ranges") {
    assert(scalar("[{a: 1}, {a: 2}][1].a") == 2L)
    assert(scalar("range(0, 10)[2..4]") == Seq(2L, 3L))
    assert(scalar("range(0, 10)[-2]") == 9L)
  }

  test("ORDER BY an expression not in the projection") {
    val q = """MATCH (n:Nation) WHERE n.n_nationkey < 5
              |RETURN n.n_name AS name ORDER BY n.n_nationkey DESC""".stripMargin
    val names = col(q)
    val want = graph.cypher(
      """MATCH (n:Nation) WHERE n.n_nationkey < 5
        |RETURN n.n_name AS name, n.n_nationkey AS k ORDER BY k DESC""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(names == want)
  }

  test("WITH * passes all variables through (plus additional items)") {
    val q = """MATCH (n:Nation)-[:IN_REGION]->(r:Region)
              |WITH * RETURN count(*) AS c""".stripMargin
    assert(col(q) == Seq(25L))
    val q2 = """MATCH (n:Nation) WITH *, n.n_name AS nm
               |WHERE nm STARTS WITH 'NATION_2' RETURN n.n_nationkey AS k, nm ORDER BY k""".stripMargin
    assert(rows(q2).length == 6) // NATION_2, NATION_20..24
  }

  test("duplicate projection names are rejected; no-arg temporal constructors work") {
    intercept[Exception] { graph.cypher("RETURN 1 AS x, 2 AS x").collect() }
    intercept[Exception] {
      graph.cypher("MATCH (n:Nation) RETURN n.n_name, n.n_name").collect()
    }
    // same alias in DIFFERENT clauses is fine
    assert(col("UNWIND [1] AS i WITH i AS x WITH x AS x RETURN x") == Seq(1L))
    // current date/time constructors return sane values
    val r = graph.cypher(
      "RETURN date() AS d, timestamp() AS ms").collect()(0)
    assert(!r.isNullAt(0) && r.getLong(1) > 1600000000000L)
  }

  test("count(DISTINCT expr) over graph entities") {
    val q = """MATCH (c:Customer)-[:PLACED]->(:Order)
              |RETURN count(DISTINCT c.c_mktsegment) AS segs""".stripMargin
    assert(col(q) == Seq(5L))
  }

  // ---- Batch 4 (r9): ordering nulls, zero-length paths, null
  // propagation, identifier quoting, arithmetic edges ----

  test("ORDER BY: null sorts last ASC, first DESC (null is largest)") {
    assert(col("UNWIND [3, null, 1] AS x RETURN x ORDER BY x") ==
      Seq(1L, 3L, null))
    assert(col("UNWIND [3, null, 1] AS x RETURN x ORDER BY x DESC") ==
      Seq(null, 3L, 1L))
  }

  test("var-length *0..: zero-length path binds both vars to the start node") {
    // *0..1 from Part 1: the zero-hop row has q = p itself
    val q = """MATCH (p:Part {p_partkey: 1})-[:RELATED_TO*0..1]->(q:Part)
              |RETURN q.p_partkey AS k ORDER BY k""".stripMargin
    val ks = col(q)
    assert(ks.contains(1L), "zero-length path must include the start node")
    // *1..1 must NOT include it (unless a self-loop or cycle-back exists,
    // which the canonical p1<p2 derivation precludes)
    val strict = col(
      """MATCH (p:Part {p_partkey: 1})-[:RELATED_TO*1..1]->(q:Part)
        |RETURN q.p_partkey AS k ORDER BY k""".stripMargin)
    assert(!strict.contains(1L))
    assert(ks.toSet == strict.toSet + 1L)
  }

  test("OPTIONAL MATCH WHERE filters during matching, not after") {
    // WHERE belongs to the OPTIONAL MATCH: non-qualifying regions keep
    // their row with n null — a post-filter would drop them entirely
    val q = """MATCH (r:Region)
              |OPTIONAL MATCH (r)<-[:IN_REGION]-(n:Nation)
              |WHERE n.n_nationkey < 2
              |RETURN r.r_regionkey AS rk, n.n_nationkey AS nk
              |ORDER BY rk, nk""".stripMargin
    val rs = rows(q)
    assert(rs.map(_.head).distinct.size == 5, "every region keeps >=1 row")
    assert(rs.count(_(1) != null) == 2, "only nations 0 and 1 qualify")
  }

  test("null entity: property access, labels, id, type all null-propagate") {
    val q = """MATCH (r:Region {r_regionkey: 0})
              |OPTIONAL MATCH (r)<-[:IN_REGION]-(n:Nation {n_nationkey: -1})
              |RETURN n.n_name AS p, id(n) AS i, labels(n) AS l""".stripMargin
    val row = graph.cypher(q).collect()(0)
    assert(row.isNullAt(0) && row.isNullAt(1) && row.isNullAt(2))
  }

  test("string predicates with null operands are null (row filtered)") {
    assert(col("UNWIND ['a'] AS x RETURN x STARTS WITH null AS r") == Seq(null))
    assert(col("UNWIND ['a'] AS x RETURN null CONTAINS x AS r") == Seq(null))
    assert(col("WITH 'abc' AS s WHERE s STARTS WITH null RETURN s").isEmpty)
  }

  test("string functions null-propagate") {
    assert(scalar("toUpper(null)") == null)
    assert(scalar("replace('ab', null, 'x')") == null)
    assert(scalar("split(null, ',')") == null)
    assert(scalar("substring(null, 1)") == null)
    assert(scalar("'a' + null") == null)
  }

  test("simple CASE with null subject matches no branch (falls to ELSE)") {
    assert(scalar("CASE null WHEN null THEN 'hit' ELSE 'else' END") == "else")
    assert(scalar("CASE null WHEN 1 THEN 'one' END") == null)
  }

  test("nested lists compare element-wise inside IN") {
    assert(scalar("[1, 2] IN [[1, 2], [3]]") == true)
    assert(scalar("[1] IN [[1, 2]]") == false)
  }

  test("size over strings, lists, and null") {
    assert(scalar("size('hello')") == 5)
    assert(scalar("size([1, 2, 3])") == 3)
    assert(scalar("size(null)") == null)
  }

  test("coalesce returns the first non-null and tolerates all-null") {
    assert(scalar("coalesce(null, 2, 3)") == 2L)
    assert(scalar("coalesce(null, null)") == null)
  }

  test("backtick-quoted identifiers: aliases and property access") {
    val r = graph.cypher("RETURN 1 AS `weird name`").collect()(0)
    assert(r.schema.fieldNames.toSeq == Seq("weird name") && r.getLong(0) == 1L)
    assert(col("MATCH (`n`:Nation {n_nationkey: 0}) RETURN `n`.`n_name` AS x")
      .head != null)
  }

  test("modulo keeps the dividend sign; ^ always returns float") {
    assert(scalar("-5 % 3") == -2L)
    assert(scalar("5 % -3") == 2L)
    assert(scalar("2 ^ -1") == 0.5)
    assert(scalar("0 ^ 0") == 1.0)
    assert(scalar("2 ^ 10") == 1024.0)
  }

  test("substring/left/right edge cases") {
    assert(scalar("substring('hello', 10)") == "")
    assert(scalar("left('hello', 99)") == "hello")
    assert(scalar("right('hello', 2)") == "lo")
    assert(scalar("split('a--b--c', '--')") == Seq("a", "b", "c"))
  }

  test("head/last/tail of the empty list") {
    assert(scalar("head([])") == null)
    assert(scalar("last([])") == null)
    assert(scalar("tail([])") == Seq.empty)
    assert(scalar("tail([1])") == Seq.empty)
  }

  test("pattern comprehension size as a degree expression") {
    val got = rows(
      """MATCH (r:Region)
        |RETURN r.r_name AS name, size([(r)<-[:IN_REGION]-(n) | 1]) AS deg
        |ORDER BY name""".stripMargin)
    assert(got.size == 5 && got.map(_(1).asInstanceOf[Int].toLong).sum == 25L)
  }

  test("WITH LIMIT mid-pipeline bounds downstream processing") {
    val got = rows(
      """MATCH (n:Nation) WITH n ORDER BY n.n_nationkey LIMIT 3
        |MATCH (n)-[:IN_REGION]->(r:Region)
        |RETURN n.n_nationkey AS k, r.r_name AS rn ORDER BY k""".stripMargin)
    assert(got.map(_.head) == Seq(0L, 1L, 2L))
  }

  test("string predicates are case-sensitive") {
    assert(scalar("'ABC' CONTAINS 'b'") == false)
    assert(scalar("'ABC' CONTAINS 'B'") == true)
    assert(scalar("'Apple' STARTS WITH 'a'") == false)
    assert(scalar("'Apple' ENDS WITH 'e'") == true)
  }

  // ---- Batch 7 (r9): function-value pins ----

  test("nullIf, exists-on-property, and round with precision") {
    assert(scalar("nullIf(1, 1)") == null)
    assert(scalar("nullIf(1, 2)") == 1L)
    assert(scalar("exists(null)") == false)
    assert(scalar("exists(5)") == true)
    assert(scalar("round(3.14159, 2)") == 3.14)
    assert(scalar("round(2.5)") == 3.0)
  }

  test("range with negative steps and bounds") {
    assert(scalar("range(5, 1, -2)") == Seq(5L, 3L, 1L))
    assert(scalar("range(-2, 2)") == Seq(-2L, -1L, 0L, 1L, 2L))
    assert(scalar("range(3, 1)") == Seq.empty)
  }

  test("toString over temporal and list-containing expressions") {
    assert(scalar("toString(date('2024-03-15'))") == "2024-03-15")
    assert(scalar("toString(42)") == "42")
    assert(scalar("ltrim('  x')") == "x")
    assert(scalar("rtrim('x  ')") == "x")
    assert(scalar("trim('  x  ')") == "x")
  }

  test("pi/e constants and log family") {
    assert(math.abs(scalar("pi()").asInstanceOf[Double] - math.Pi) < 1e-12)
    assert(math.abs(scalar("e()").asInstanceOf[Double] - math.E) < 1e-12)
    assert(scalar("log(e())").asInstanceOf[Double] > 0.999)
    assert(scalar("log10(1000)") == 3.0)
    assert(scalar("exp(0)") == 1.0)
  }

  test("repeated node variables join on identity (cycles, shared middles)") {
    // the canonical p1<p2 RELATED_TO derivation is acyclic, so a closed
    // directed 2-cycle MUST be empty — nonzero would mean the second `a`
    // was treated as a fresh variable instead of an identity join
    assert(rows(
      """MATCH (a:Part)-[:RELATED_TO]->(b:Part)-[:RELATED_TO]->(a)
        |RETURN a.p_partkey AS x""".stripMargin).isEmpty)
    assert(rows(
      """MATCH (a:Part {p_partkey: 1})-[:RELATED_TO*2..2]->(a)
        |RETURN a.p_partkey AS x""".stripMargin).isEmpty)
    // a variable shared between two comma-separated paths joins them
    val shared = rows(
      """MATCH (a:Part)-[:RELATED_TO]->(b:Part), (c:Part)-[:RELATED_TO]->(b)
        |WHERE a.p_partkey < c.p_partkey RETURN count(*) AS n""".stripMargin)
    assert(shared.head.head.asInstanceOf[Long] > 0L)
  }

  // ---- Batch 6 (r9): aggregation interactions, entity ordering ----

  test("conditional aggregation with CASE inside sum/count") {
    val q = """MATCH (c:Customer)
              |RETURN sum(CASE WHEN c.c_acctbal > 5000 THEN 1 ELSE 0 END) AS rich,
              |       count(CASE WHEN c.c_acctbal < 0 THEN 1 END) AS neg""".stripMargin
    val r = graph.cypher(q).collect()(0)
    val rich = graph.cypher(
      "MATCH (c:Customer) WHERE c.c_acctbal > 5000 RETURN count(*) AS n")
      .collect()(0).getLong(0)
    val neg = graph.cypher(
      "MATCH (c:Customer) WHERE c.c_acctbal < 0 RETURN count(*) AS n")
      .collect()(0).getLong(0)
    assert(r.getLong(0) == rich, "CASE-sum counts qualifying rows")
    assert(r.getLong(1) == neg, "count skips the null CASE branch")
  }

  test("min/max over dates and ORDER BY booleans") {
    val r = graph.cypher(
      """MATCH (:Customer)-[o:PLACED]->(:Order)
        |RETURN min(o.o_orderdate) AS lo, max(o.o_orderdate) AS hi""".stripMargin)
      .collect()(0)
    assert(r.getAs[java.time.LocalDateTime](0).isBefore(
      r.getAs[java.time.LocalDateTime](1)))
    // booleans order false < true, nulls still last ASC
    assert(col("UNWIND [true, null, false] AS b RETURN b ORDER BY b") ==
      Seq(false, true, null))
  }

  test("collect of whole nodes yields entity structs") {
    val r = graph.cypher(
      """MATCH (n:Nation) WHERE n.n_nationkey < 3
        |RETURN size(collect(n)) AS sz""".stripMargin).collect()(0)
    assert(r.getInt(0) == 3)
    val arr = graph.cypher(
      """MATCH (n:Nation) WHERE n.n_nationkey < 2 WITH n ORDER BY n.n_nationkey
        |RETURN collect(n) AS ns""".stripMargin).collect()(0)
      .getSeq[org.apache.spark.sql.Row](0)
    assert(arr.size == 2 && arr.head.getAs[String]("n_name") != null)
  }

  test("RETURN whole nodes with ORDER BY on their property") {
    val rows0 = graph.cypher(
      """MATCH (n:Nation) RETURN n ORDER BY n.n_nationkey DESC LIMIT 2""")
      .collect()
    assert(rows0.length == 2)
    assert(rows0(0).getStruct(0).getAs[Long]("_id") >
      rows0(1).getStruct(0).getAs[Long]("_id"))
  }

  test("MATCH after WITH: aggregate carry-over, filtered rebind, shared-var join") {
    // post-aggregation MATCH is a cartesian carry-over of the aggregate
    assert(rows(
      """MATCH (n:Nation) WITH count(n) AS nations
        |MATCH (r:Region) RETURN nations, count(r) AS regions""".stripMargin)
      == Seq(Seq(25L, 5L)))
    // a variable carried through WITH joins the next MATCH on identity
    val joined = rows(
      """MATCH (n:Nation) WITH n WHERE n.n_nationkey < 3
        |MATCH (n)-[:IN_REGION]->(r:Region)
        |RETURN n.n_name AS nn, r.r_name AS rn ORDER BY nn""".stripMargin)
    assert(joined.size == 3 && joined.map(_.head) ==
      Seq("NATION_0", "NATION_1", "NATION_2"))
    // two sequential MATCH clauses join on their shared variable
    assert(rows(
      """MATCH (c:Customer {c_custkey: 1})-[:IN_NATION]->(n:Nation)
        |MATCH (n)-[:IN_REGION]->(r:Region)
        |RETURN c.c_custkey AS c, r.r_name AS r""".stripMargin).size == 1)
  }

  test("invalid queries error: agg in WHERE, nested agg, bare RETURN *") {
    intercept[Exception] {
      graph.cypher("MATCH (n:Nation) WHERE count(n) > 1 RETURN n.n_name AS x").collect()
    }
    intercept[Exception] {
      graph.cypher("MATCH (n:Nation) RETURN sum(count(n)) AS x").collect()
    }
    intercept[Exception] { graph.cypher("RETURN *").collect() }
    intercept[Exception] {
      graph.cypher("MATCH (n:Nation) RETURN m.name AS x").collect()
    }
  }

  test("property-map key absent from the label matches nothing, not error") {
    // reference scenario shape: {sku: ...} on a label without that column
    assert(rows("MATCH (n:Nation {no_such_prop: 1}) RETURN n.n_name AS x").isEmpty)
    assert(rows(
      "MATCH (:Nation)-[r:IN_REGION {no_such_prop: 1}]->(:Region) RETURN r AS x").isEmpty)
    assert(rows(
      """MATCH (p:Part {p_partkey: 1})-[:RELATED_TO*1..2 {no_such_prop: 1}]->(q:Part)
        |RETURN q.p_partkey AS k""".stripMargin).isEmpty)
  }

  // ---- Batch 5 (r9): temporal accessors, conversions, numeric edges ----

  test("temporal accessors on a fixed date") {
    val r = graph.cypher(
      """WITH date('2024-03-15') AS d
        |RETURN d.year AS y, d.month AS m, d.day AS dd, d.week AS w,
        |       d.quarter AS q, d.ordinalDay AS od, d.dayOfWeek AS dow""".stripMargin)
      .collect()(0)
    assert(r.getAs[Long]("y") == 2024L && r.getAs[Long]("m") == 3L &&
      r.getAs[Long]("dd") == 15L)
    assert(r.getAs[Long]("w") == 11L)       // ISO week
    assert(r.getAs[Long]("q") == 1L)
    assert(r.getAs[Long]("od") == 75L)      // 31 + 29 + 15 (leap year)
    assert(r.getAs[Long]("dow") == 5L)      // Friday, ISO numbering
  }

  test("date/datetime from component maps (calendar, week, ordinal, quarter)") {
    assert(scalar("toString(date({year: 2024, month: 3, day: 15}))") == "2024-03-15")
    assert(scalar("toString(date({year: 2024}))") == "2024-01-01")
    // ISO week date: 2024-W11-5 is 2024-03-15
    assert(scalar("toString(date({year: 2024, week: 11, dayOfWeek: 5}))") == "2024-03-15")
    assert(scalar("toString(date({year: 2024, ordinalDay: 75}))") == "2024-03-15")
    assert(scalar("toString(date({year: 2024, quarter: 1, dayOfQuarter: 75}))") == "2024-03-15")
    assert(scalar("toString(date({date: date('2024-03-15')}))") == "2024-03-15")
    assert(scalar("date({year: 2024, month: 3, day: 15}).week") == 11L)
    val ts = scalar(
      "toString(datetime({year: 2024, month: 3, day: 15, hour: 7, minute: 30, second: 5}))")
    assert(ts.toString.startsWith("2024-03-15 07:30:05"))
  }

  test("temporal truncation, time maps, and clock variants") {
    assert(scalar("toString(date.truncate('month', date('2024-03-15')))") == "2024-03-01")
    assert(scalar("toString(date.truncate('year', date('2024-03-15')))") == "2024-01-01")
    // ISO week truncation: Monday of that week
    assert(scalar("toString(date.truncate('week', date('2024-03-15')))") == "2024-03-11")
    assert(scalar("toString(datetime.truncate('day', datetime('2024-03-15 07:30:05')))")
      .toString.startsWith("2024-03-15 00:00:00"))
    assert(scalar("time({hour: 7, minute: 5, second: 9})") == "07:05:09")
    assert(scalar("localtime({hour: 23})") == "23:00:00")
    assert(scalar("date.transaction()") != null)
    assert(scalar("datetime.statement()") != null)
  }

  test("leap-year date arithmetic and comparisons") {
    assert(scalar("toString(date('2024-02-28') + duration({days: 1}))") == "2024-02-29")
    assert(scalar("toString(date('2023-02-28') + duration({days: 1}))") == "2023-03-01")
    assert(scalar("date('2024-01-01') < date('2024-01-02')") == true)
    assert(scalar("date('2024-01-01') = date('2024-01-01')") == true)
  }

  test("type conversions: bad input is null, not an error") {
    assert(scalar("toInteger('abc')") == null)
    assert(scalar("toInteger('42')") == 42L)
    assert(scalar("toFloat('3.5')") == 3.5)
    assert(scalar("toFloat('x')") == null)
    assert(scalar("toBoolean('true')") == true)
    assert(scalar("toBoolean('nope')") == null)
    assert(scalar("toString(1.5)") == "1.5")
    assert(scalar("toString(true)") == "true")
  }

  test("trig and numeric function values") {
    assert(scalar("sin(0)") == 0.0)
    assert(scalar("cos(0)") == 1.0)
    assert(math.abs(scalar("atan2(1, 1)").asInstanceOf[Double] - math.Pi / 4) < 1e-12)
    assert(scalar("sqrt(16)") == 4.0)
    assert(scalar("abs(-7)") == 7L)
    assert(scalar("sign(-3)") == -1)
    assert(scalar("ceil(1.1)") == 2.0)
    assert(scalar("floor(-1.1)") == -2.0)
  }

  test("reverse over strings and lists") {
    assert(scalar("reverse('abc')") == "cba")
    assert(scalar("reverse([1, 2, 3])") == Seq(3L, 2L, 1L))
    assert(scalar("reverse([])") == Seq.empty)
  }

  test("percentileDisc boundary fractions select min and max") {
    val q = """UNWIND [10, 20, 30, 40] AS x
              |RETURN percentileDisc(x, 0) AS lo, percentileDisc(x, 1) AS hi""".stripMargin
    assert(rows(q) == Seq(Seq(10L, 40L)))
  }

  test("MERGE of a relationship between matched endpoints is idempotent") {
    var (g2, _) = graph.cypherWrite(
      """MATCH (n:Nation {n_nationkey: 0}), (r:Region {r_regionkey: 2})
        |MERGE (n)-[:IN_REGION]->(r)""".stripMargin)
    val after1 = g2.cypher(
      "MATCH (n:Nation {n_nationkey: 0})-[:IN_REGION]->(r:Region) RETURN r.r_regionkey AS k")
      .collect().length
    val (g3, _) = g2.cypherWrite(
      """MATCH (n:Nation {n_nationkey: 0}), (r:Region {r_regionkey: 2})
        |MERGE (n)-[:IN_REGION]->(r)""".stripMargin)
    val after2 = g3.cypher(
      "MATCH (n:Nation {n_nationkey: 0})-[:IN_REGION]->(r:Region) RETURN r.r_regionkey AS k")
      .collect().length
    assert(after1 == 2 && after2 == 2, "second MERGE must not add an edge")
  }

  test("split of empty and delimiter-free strings") {
    assert(scalar("split('', ',')") == Seq(""))
    assert(scalar("split('abc', ',')") == Seq("abc"))
  }

  test("missing property feeds UNWIND and list functions as null") {
    // UNWIND of a VOID null (missing property) removes the row
    assert(rows(
      "MATCH (n:Nation {n_nationkey: 0}) UNWIND n.no_such AS s RETURN s").isEmpty)
    val r = graph.cypher(
      """MATCH (n:Nation {n_nationkey: 0})
        |RETURN head(n.no_such) AS h, last(n.no_such) AS l, tail(n.no_such) AS t""".stripMargin)
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }
}
