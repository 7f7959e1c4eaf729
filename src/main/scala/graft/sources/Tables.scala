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

  // ---- catalog report (cli `info` analog) ----

  /** One row per node label and edge class: kind, name, row count, and
    * the schema rendered as DDL. Forces every frame — a whole-catalog op
    * by definition.
    */
  def catalogReport(g: PropertyGraph, spark: SparkSession): DataFrame = {
    import spark.implicits._
    val nodeRows = g.labels.map { l =>
      val df = g.nodeFrame(l)
      ("node", l, df.count(), df.schema.toDDL)
    }
    val edgeRows = g.edgeClasses.map { et =>
      val df = g.edgeFrame(et)
      ("edge", s"${et.relType}(${et.srcLabel}->${et.dstLabel})", df.count(), df.schema.toDDL)
    }
    (nodeRows ++ edgeRows).toDF("kind", "name", "rows", "schema")
      .orderBy("kind", "name")
  }
}
