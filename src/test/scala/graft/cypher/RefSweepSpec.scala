package graft.cypher

import graft.SparkSpec
import graft.graph.{EdgeType, PropertyGraph}
import org.apache.spark.sql.DataFrame

/** Standing regression sweep over the reference's OWN test queries.
  *
  * `src/test/resources/ref_queries.txt` is harvested from the reference's
  * behavioral suites (cypherqueries/scenarios/integration/leangraph/db
  * .test.ts) by `tools/harvest_ref_queries.py` — every string there was
  * written to EXECUTE against the reference engine. The strongest parity
  * claim this repo makes is "every well-formed reference test query runs";
  * this spec makes that claim re-checkable on every `sbt test` instead of
  * a one-off prose result (r9).
  *
  * Each query runs in ISOLATION against a corpus-derived seed graph (one
  * zero-or-one-row frame per label, zero-row edge frames for every
  * (srcLabel, relType, dstLabel) triple the corpus mentions) — results
  * are NOT asserted (the reference tests build per-test data we don't
  * replay); the bar is "parses, compiles, executes without throwing".
  * `expectedFailures` pins the KNOWN divergences; the assert is exact, so
  * both a new failure and a silently-fixed one turn the suite red.
  */
class RefSweepSpec extends SparkSpec {

  private lazy val corpus: Vector[String] = {
    val in = getClass.getResourceAsStream("/ref_queries.txt")
    require(in != null, "ref_queries.txt missing — run tools/harvest_ref_queries.py")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).toVector
    finally in.close()
  }

  private val labelRe = """\(\s*[a-zA-Z_0-9]*\s*:\s*([A-Za-z_][A-Za-z0-9_]*)""".r
  // destination label captured via lookahead so chained hops
  // (a:A)->(b:B)->(c:C) yield BOTH (A,t1,B) and (B,t2,C)
  private val tripleRe =
    ("""\(\s*[a-zA-Z_0-9]*\s*:\s*([A-Za-z_][A-Za-z0-9_]*)[^()\[\]]*\)\s*-\s*\[\s*[a-zA-Z_0-9]*\s*:\s*""" +
      """([A-Za-z_][A-Za-z0-9_]*)[^\[\]]*\]\s*->\s*(?=\(\s*[a-zA-Z_0-9]*\s*:\s*([A-Za-z_][A-Za-z0-9_]*))""").r
  private val paramRe = """\$([A-Za-z_][A-Za-z0-9_]*)""".r
  private val writeRe = """(?i)\b(CREATE|MERGE|SET|REMOVE|DELETE|DETACH)\b""".r

  /** Seed graph: every label the corpus mentions as a 1-row frame (so
    * SET/DELETE targets resolve statically), every directed
    * label-type-label triple as a zero-row edge class (so rel variables
    * pin to an edge class). Built once — queries run isolated against it.
    */
  private lazy val seed: PropertyGraph = {
    import spark.implicits._
    val labels = corpus.flatMap(q => labelRe.findAllMatchIn(q).map(_.group(1))).distinct.sorted
    val triples = corpus.flatMap(q =>
      tripleRe.findAllMatchIn(q).map(m => (m.group(1), m.group(2), m.group(3)))).distinct
    val nodeFrame = Seq((1L, "seed", "seed")).toDF("_id", "id", "name")
    val edgeFrame = Seq.empty[(Long, Long, Long)].toDF("_src", "_dst", "_eid")
    PropertyGraph(
      labels.map(_ -> nodeFrame).toMap,
      triples.collect { case (s, t, d) if labels.contains(s) && labels.contains(d) =>
        EdgeType(t, s, d) -> edgeFrame
      }.toMap)
  }

  /** Heuristic bindings for `$param` queries: the reference binds strings
    * for ids/names, numbers for quantities, booleans for flags.
    */
  private def paramsFor(q: String): Map[String, Any] = {
    val numericHints = Seq("age", "amount", "price", "stock", "year", "month",
      "limit", "skip", "count", "lastnumber", "proficiency", "createdat",
      "num", "value", "threshold", "level", "total", "quantity", "salary")
    val listHints = Set("ids", "items", "names", "tags", "values", "keywords", "list")
    paramRe.findAllMatchIn(q).map(_.group(1)).toSeq.distinct.map { n =>
      val l = n.toLowerCase
      val v: Any =
        if (listHints(l)) Seq("x1", "x2")
        else if (l.contains("active") || l.startsWith("is") || l.startsWith("has")) true
        else if (numericHints.exists(l.contains)) 1L
        else s"x_$n"
      n -> v
    }.toMap
  }

  private def runOne(q: String): Option[(String, String)] =
    try {
      val ps = paramsFor(q)
      if (writeRe.findFirstIn(q).isDefined) {
        val (_, ret) = if (ps.isEmpty) seed.cypherWrite(q) else seed.cypherWrite(q, ps)
        ret.foreach(_.collect())
      } else {
        val df = if (ps.isEmpty) seed.cypher(q) else seed.cypher(q, ps)
        df.collect()
      }
      None
    } catch {
      case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
        Some(q -> msg.linesIterator.take(1).mkString.take(160))
    }

  /** Documented divergences — each entry is a query expected to fail with
    * a reason (kept in sync by the exact-equality assert below).
    */
  private lazy val expectedFailures: Set[String] =
    RefSweepSpec.expectedFailureList.toSet

  test("every harvested reference query executes (pinned divergences excepted)") {
    assert(corpus.size > 900, s"harvest shrank to ${corpus.size} queries")
    val failures = corpus.flatMap(runOne)
    val failedQueries = failures.map(_._1).toSet
    val unexpected = failures.filterNot(f => expectedFailures(f._1))
    val fixed = expectedFailures -- failedQueries
    assert(unexpected.isEmpty,
      s"${unexpected.size} NEW sweep failures:\n" +
        unexpected.take(25).map { case (q, m) => s"  $q\n    -> $m" }.mkString("\n"))
    assert(fixed.isEmpty,
      "expected failures now PASS — remove them from expectedFailureList:\n" +
        fixed.take(25).mkString("\n"))
  }
}

object RefSweepSpec {
  /** See [[RefSweepSpec.expectedFailures]]. */
  val expectedFailureList: Seq[String] = Seq(
    // truncated string in the reference source itself (an error-path
    // fixture) — not a well-formed query
    "CREATE (n:Person",
    // documented divergence: heterogeneous list literals don't fit typed
    // array columns (SURVEY §6; reference executes over JS arrays)
    "UNWIND [1, 'two', true] AS x RETURN x",
  )
}
