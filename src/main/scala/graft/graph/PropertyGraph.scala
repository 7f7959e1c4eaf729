package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A relationship class: directed edges of one type between two node labels.
  *
  * Reference analog: rows of the generic `edges(id, type, source_id,
  * target_id, properties)` table (reference: src/db.ts:54-62). Spark-first
  * divergence: each (type, srcLabel, dstLabel) triple is its own typed
  * DataFrame so parquet scans prune columns and push down filters — a
  * generic JSON-properties table would defeat Catalyst at 100 TB.
  */
final case class EdgeType(relType: String, srcLabel: String, dstLabel: String)

object PropertyGraph {
  /** Reserved column names inside node / edge frames. */
  val ID = "_id"    // node identity (long), unique within its label
  val SRC = "_src"  // edge source node id
  val DST = "_dst"  // edge target node id
  val EID = "_eid"  // edge identity (long), unique within its EdgeType
  val LABEL = "_label" // injected into match structs: node label / rel type

  /** Load a graph snapshot previously written by [[PropertyGraph.save]]. */
  def load(spark: SparkSession, path: String): PropertyGraph = {
    import scala.jdk.CollectionConverters._
    val fs = java.nio.file.Paths.get(path)
    def list(sub: String): Seq[String] = {
      val d = fs.resolve(sub)
      if (!java.nio.file.Files.exists(d)) Seq.empty
      else java.nio.file.Files.list(d).iterator().asScala
        .filter(java.nio.file.Files.isDirectory(_))
        .map(_.getFileName.toString).toSeq.sorted
    }
    val nodes = list("nodes").map { label =>
      label -> spark.read.parquet(s"$path/nodes/$label")
    }.toMap
    val edges = list("edges").map { dirName =>
      val Array(t, s, d) = dirName.split("__", 3)
      EdgeType(t, s, d) -> spark.read.parquet(s"$path/edges/$dirName")
    }.toMap
    new PropertyGraph(nodes, edges)
  }
}

/** Immutable property graph over DataFrames.
  *
  * `nodes`: label -> frame with [[PropertyGraph.ID]] + typed property
  * columns. `edges`: [[EdgeType]] -> frame with SRC, DST, EID + typed
  * property columns. All mutation APIs (Cypher CREATE/MERGE/SET/REMOVE/
  * DELETE analogs) return a NEW graph — Spark-idiomatic snapshots, not
  * in-place writes.
  *
  * `smallLabels` / `smallTypes` mark frames that stay broadcast-joinable
  * at the target scale (dimension tables); the pattern compiler attaches
  * `broadcast()` hints to them.
  */
final class PropertyGraph(
    val nodes: Map[String, DataFrame],
    val edges: Map[EdgeType, DataFrame],
    val smallLabels: Set[String] = Set.empty,
    val smallTypes: Set[String] = Set.empty) {

  import PropertyGraph._

  // ---- catalog (reference: CALL db.labels() / db.relationshipTypes(),
  //      src/translator.ts:4398-4412) ----

  def labels: Seq[String] = nodes.keys.toSeq.sorted
  def relationshipTypes: Seq[String] = edges.keys.map(_.relType).toSeq.distinct.sorted

  def labelsDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    labels.toDF("label")
  }
  def relationshipTypesDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    relationshipTypes.toDF("relationshipType")
  }

  def nodeFrame(label: String): DataFrame =
    nodes.getOrElse(label, sys.error(s"Unknown node label: $label (have: ${labels.mkString(",")})"))

  /** Node frame with broadcast hint when the label is a known-small dim. */
  def nodeFrameHinted(label: String): DataFrame = {
    val df = nodeFrame(label)
    if (smallLabels(label)) broadcast(df) else df
  }

  def edgeFrame(et: EdgeType): DataFrame =
    edges.getOrElse(et, sys.error(s"Unknown edge type: $et"))

  def edgeFrameHinted(et: EdgeType): DataFrame = {
    val df = edgeFrame(et)
    if (smallTypes(et.relType)) broadcast(df) else df
  }

  /** All edge classes compatible with an optional type name and optional
    * endpoint labels (used by the pattern compiler for label inference —
    * unlabeled Cypher nodes match every consistent label).
    */
  def edgeTypesFor(relType: Option[String], srcLabel: Option[String],
      dstLabel: Option[String]): Seq[EdgeType] =
    edges.keys.toSeq.filter { et =>
      relType.forall(_ == et.relType) &&
      srcLabel.forall(_ == et.srcLabel) &&
      dstLabel.forall(_ == et.dstLabel)
    }.sortBy(et => (et.relType, et.srcLabel, et.dstLabel))

  // ---- pattern matching ----

  /** Compile a Cypher MATCH pattern (comma-separated paths) to a DataFrame
    * with one struct column per pattern variable. See [[PatternMatcher]].
    */
  def matchPattern(pattern: String, known: Map[String, String] = Map.empty): DataFrame =
    new PatternMatcher(this).compile(pattern, known)

  /** Cypher OPTIONAL MATCH: left-outer join a compiled pattern onto `base`
    * on the shared variables' node ids. Unmatched rows keep nulls for the
    * optional pattern's variables.
    */
  def optionalMatch(base: DataFrame, pattern: String,
      known: Map[String, String] = Map.empty): DataFrame =
    new PatternMatcher(this).optional(base, pattern, known)

  // ---- degrees (Cypher: size((n)-[]->()) etc.) ----

  /** (label, _id, outDegree, inDegree, degree) across all edge types. */
  def degrees(spark: SparkSession): DataFrame = {
    val outs = edges.toSeq.map { case (et, df) =>
      df.select(lit(et.srcLabel).as("label"), col(SRC).as(ID),
        lit(1L).as("out_d"), lit(0L).as("in_d"))
    }
    val ins = edges.toSeq.map { case (et, df) =>
      df.select(lit(et.dstLabel).as("label"), col(DST).as(ID),
        lit(0L).as("out_d"), lit(1L).as("in_d"))
    }
    (outs ++ ins).reduce(_ unionByName _)
      .groupBy("label", ID)
      .agg(sum("out_d").as("outDegree"), sum("in_d").as("inDegree"),
        (sum("out_d") + sum("in_d")).as("degree"))
  }

  // ---- writes: Cypher CREATE / MERGE / SET / REMOVE / DELETE analogs.
  //      (reference: translator.ts CREATE/MERGE/SET/DELETE/REMOVE clause
  //      translation; here immutable snapshot transforms.) ----

  private def copyWith(n: Map[String, DataFrame] = nodes,
      e: Map[EdgeType, DataFrame] = edges): PropertyGraph =
    new PropertyGraph(n, e, smallLabels, smallTypes)

  /** CREATE (:Label {...}) — append nodes; `df` must carry ID. */
  def addNodes(label: String, df: DataFrame): PropertyGraph = {
    require(df.columns.contains(ID), s"addNodes($label): frame must have $ID")
    val merged = nodes.get(label) match {
      case Some(old) => old.unionByName(df, allowMissingColumns = true)
      case None => df
    }
    copyWith(n = nodes + (label -> merged))
  }

  /** MERGE (:Label {id}) — insert rows whose ID is not already present. */
  def mergeNodes(label: String, df: DataFrame): PropertyGraph = {
    val merged = nodes.get(label) match {
      case Some(old) =>
        old.unionByName(df.join(old.select(ID), Seq(ID), "left_anti"),
          allowMissingColumns = true)
      case None => df
    }
    copyWith(n = nodes + (label -> merged))
  }

  /** SET n.prop = expr for rows matching `cond`. */
  def setNodeProps(label: String, cond: Column, assigns: Map[String, Column]): PropertyGraph = {
    val old = nodeFrame(label)
    val updated = assigns.foldLeft(old) { case (d, (k, v)) =>
      if (d.columns.contains(k)) d.withColumn(k, when(cond, v).otherwise(col(k)))
      else d.withColumn(k, when(cond, v))
    }
    copyWith(n = nodes + (label -> updated))
  }

  /** REMOVE n.prop — drop property columns from a label. */
  def removeNodeProps(label: String, props: Seq[String]): PropertyGraph = {
    require(!props.contains(ID), "cannot remove node identity")
    copyWith(n = nodes + (label -> nodeFrame(label).drop(props: _*)))
  }

  /** DETACH DELETE — remove matching nodes and all incident edges. */
  def detachDeleteNodes(label: String, cond: Column): PropertyGraph = {
    val old = nodeFrame(label)
    val deletedIds = old.filter(cond).select(ID)
    val newEdges = edges.map { case (et, df) =>
      var out = df
      if (et.srcLabel == label)
        out = out.join(deletedIds.withColumnRenamed(ID, SRC), Seq(SRC), "left_anti")
      if (et.dstLabel == label)
        out = out.join(deletedIds.withColumnRenamed(ID, DST), Seq(DST), "left_anti")
      et -> out
    }
    copyWith(n = nodes + (label -> old.filter(!coalesce(cond, lit(false)))), e = newEdges)
  }

  /** CREATE ()-[:T]->() — append edges; `df` must carry SRC and DST
    * (EID is derived if absent).
    */
  def addEdges(et: EdgeType, df: DataFrame): PropertyGraph = {
    require(df.columns.contains(SRC) && df.columns.contains(DST),
      s"addEdges($et): frame must have $SRC and $DST")
    val withEid =
      if (df.columns.contains(EID)) df
      else df.withColumn(EID, xxhash64(lit(et.relType), col(SRC), col(DST)))
    val merged = edges.get(et) match {
      case Some(old) => old.unionByName(withEid, allowMissingColumns = true)
      case None => withEid
    }
    copyWith(e = edges + (et -> merged))
  }

  /** MERGE ()-[:T]->() — insert (src,dst) pairs not already present. */
  def mergeEdges(et: EdgeType, df: DataFrame): PropertyGraph = {
    val withEid =
      if (df.columns.contains(EID)) df
      else df.withColumn(EID, xxhash64(lit(et.relType), col(SRC), col(DST)))
    val merged = edges.get(et) match {
      case Some(old) =>
        old.unionByName(withEid.join(old.select(SRC, DST), Seq(SRC, DST), "left_anti"),
          allowMissingColumns = true)
      case None => withEid
    }
    copyWith(e = edges + (et -> merged))
  }

  /** DELETE ()-[r]->() — remove matching edges of one class. */
  def deleteEdges(et: EdgeType, cond: Column): PropertyGraph =
    copyWith(e = edges + (et -> edgeFrame(et).filter(!coalesce(cond, lit(false)))))

  // ---- snapshot persistence (reference: backup.ts save/restore) ----

  def save(path: String): Unit = {
    nodes.foreach { case (label, df) =>
      df.write.mode("overwrite").parquet(s"$path/nodes/$label")
    }
    edges.foreach { case (et, df) =>
      df.write.mode("overwrite")
        .parquet(s"$path/edges/${et.relType}__${et.srcLabel}__${et.dstLabel}")
    }
  }
}
