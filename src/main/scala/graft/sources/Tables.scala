package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph

/** Import/export + catalog surface (reference analog: the CLI
  * import/export/info commands, /root/reference/src/cli.ts, and the
  * backup tooling, src/backup.ts). Re-expressed as DataFrame readers/
  * writers so they inherit Spark's distributed IO (splittable reads,
  * partitioned writes, any Hadoop-compatible filesystem).
  */
object Tables {

  // ---- CSV ----

  def readCsv(spark: SparkSession, path: String,
      header: Boolean = true, inferSchema: Boolean = true): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("inferSchema", inferSchema.toString)
      .csv(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)

  // ---- JSON lines ----

  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  // ---- ORC (columnar interchange beyond parquet) ----

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  // ---- bucketed tables (co-located joins) ----

  /** Write a frame as a bucketed+sorted managed table. Two tables
    * bucketed by their join key into the SAME bucket count join with NO
    * shuffle on either side (SortMergeJoin reads buckets directly) —
    * the pre-partitioning story for repeated 100 TB fact-fact joins
    * where per-query exchanges would dominate. Verified by
    * SourcesSpec's no-Exchange plan assertion.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int = 32): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key (exchange-free when
    * bucket layouts match).
    */
  def joinBucketed(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  // ---- catalog report (cli `info` analog) ----

  /** One row per node label and edge class: kind, name, row count, and
    * the schema rendered as DDL. Forces every frame — a whole-catalog op
    * by definition. Counts run as CONCURRENT Spark jobs (scala Futures
    * over the shared scheduler): a serial per-frame loop would leave the
    * cluster idle between frames, turning an 18-frame catalog into 18
    * latency-bound round trips.
    */
  def catalogReport(g: PropertyGraph, spark: SparkSession): DataFrame = {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val tasks =
      g.labels.map { l => () =>
        val df = g.nodeFrame(l)
        ("node", l, df.count(), df.schema.toDDL)
      } ++ g.edgeClasses.map { et => () =>
        val df = g.edgeFrame(et)
        ("edge", s"${et.relType}(${et.srcLabel}->${et.dstLabel})", df.count(), df.schema.toDDL)
      }
    val rows = Await.result(Future.sequence(tasks.map(t => Future(t()))), Duration.Inf)
    rows.toDF("kind", "name", "rows", "schema")
      .orderBy("kind", "name")
  }
}
