package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.graph.GraphLoader

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) and §4
  * (oracle strategy). Every query entry compiles a Cypher-style graph
  * pattern over the TPC-H-ish graph (SURVEY §3) and has DuckDB oracle
  * SQL over the raw tables unless marked rows-only.
  */
object SparkEntry {

  /** Cypher/Spark divergence guard: run everything in non-ANSI mode so
    * out-of-range list access and malformed casts yield null (Cypher
    * semantics) instead of throwing (Spark 4 ANSI default).
    */
  private def lenient(s: SparkSession): SparkSession = {
    s.conf.set("spark.sql.ansi.enabled", "false")
    s
  }

  private def g(s: SparkSession, dir: String) = GraphLoader.load(lenient(s), dir)

  private val dec = DecimalType(18, 2)

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_region_revenue")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- point lookup (ref benchmark: lookup_user_by_id) ----
    "q_lookup" -> ((s, dir) => {
      g(s, dir).matchPattern("(c:Customer {c_custkey: 42})")
        .select(col("c.c_name").as("c_name"), col("c.c_acctbal").as("c_acctbal"))
    }),

    // ---- 1-hop pattern + aggregation (ref: user_item_counts) ----
    "q_placed_agg" -> ((s, dir) => {
      g(s, dir).matchPattern("(c:Customer)-[:PLACED]->(o:Order)")
        .groupBy(col("c._id").as("c_custkey"))
        .agg(count(lit(1)).as("order_cnt"),
          sum(col("o.o_totalprice").cast(dec)).cast("double").as("total_spend"))
        .orderBy("c_custkey")
    }),

    // ---- 3-hop chain + aggregation (flagship) ----
    "q_region_revenue" -> ((s, dir) => {
      g(s, dir).matchPattern(
        "(r:Region)<-[:IN_REGION]-(n:Nation)<-[:IN_NATION]-(c:Customer)-[:PLACED]->(o:Order)")
        .groupBy(col("r.r_name").as("r_name"))
        .agg(count(lit(1)).as("order_cnt"),
          sum(col("o.o_totalprice").cast(dec)).cast("double").as("revenue"))
        .orderBy("r_name")
    }),

    // ---- var-length traversal (ref: related_items_depth2) ----
    "q_varlength" -> ((s, dir) => {
      g(s, dir).matchPattern("(p:Part {p_partkey: 1})-[:RELATED_TO*1..2]->(q:Part)")
        .select(col("q._id").as("p_partkey")).distinct()
        .orderBy("p_partkey")
    }),

    // ---- OPTIONAL MATCH (left outer) ----
    "q_optional" -> ((s, dir) => {
      val gr = g(s, dir)
      val base = gr.matchPattern("(c:Customer)")
      gr.optionalMatch(base, "(c:Customer)-[:PLACED]->(o:Order)")
        .groupBy(col("c.c_mktsegment").as("c_mktsegment"))
        .agg(count(col("o._id")).as("order_cnt"),
          countDistinct(col("c._id")).as("customer_cnt"))
        .orderBy("c_mktsegment")
    }),

    // ---- pattern + groupBy on edge-typed events (ref: event_type_counts) ----
    "q_event_types" -> ((s, dir) => {
      g(s, dir).matchPattern("(u:User)-[:TRIGGERED]->(e:Event)")
        .groupBy(col("e.event_type").as("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("event_type"))
    })
  )

  /** DuckDB-equivalent SQL per query (driver correctness gate). */
  def oracleSql: Map[String, String] = Map(
    "q_lookup" ->
      "SELECT c_name, c_acctbal FROM customer WHERE c_custkey = 42",
    "q_placed_agg" ->
      """SELECT c_custkey, count(*) AS order_cnt,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
         FROM customer JOIN orders ON o_custkey = c_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",
    "q_region_revenue" ->
      """SELECT r_name, count(*) AS order_cnt,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM region
         JOIN nation ON n_regionkey = r_regionkey
         JOIN customer ON c_nationkey = n_nationkey
         JOIN orders ON o_custkey = c_custkey
         GROUP BY r_name ORDER BY r_name""",
    "q_varlength" ->
      """WITH related AS (
           SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
           FROM lineitem a JOIN lineitem b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         hop1 AS (SELECT p2 AS k FROM related WHERE p1 = 1),
         hop2 AS (SELECT r.p2 AS k FROM hop1 JOIN related r ON r.p1 = hop1.k)
         SELECT DISTINCT k AS p_partkey
         FROM (SELECT k FROM hop1 UNION ALL SELECT k FROM hop2)
         ORDER BY p_partkey""",
    "q_optional" ->
      """SELECT c_mktsegment, count(o_orderkey) AS order_cnt,
         count(DISTINCT c_custkey) AS customer_cnt
         FROM customer LEFT JOIN orders ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q_event_types" ->
      """SELECT event_type, count(*) AS cnt FROM events
         GROUP BY event_type ORDER BY cnt DESC, event_type"""
  )
}
