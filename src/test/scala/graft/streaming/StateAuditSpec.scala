package graft.streaming

import graft.SparkSpec

/** Standing STREAMING-STATE audit — the r18 verdict's #7 ask, the
  * window-audit discipline applied to stateful streaming operators:
  * every `flatMapGroupsWithState` / `mapGroupsWithState` /
  * `dropDuplicates` / `dropDuplicatesWithinWatermark` call site in
  * main source must appear in the audited table below WITH its state
  * bound (rows per key, eviction path, documented trade), so a new
  * stateful operator cannot land without stating one. Keys are
  * `<file>:<api>:<enclosing def>` from a comment-stripped scan
  * (graft.AuditLex — string literals never hide a site).
  */
class StateAuditSpec extends SparkSpec {

  /** site -> (state bound, eviction path / trade). The bound is the
    * REVIEWED claim: change the operator, restate the bound. */
  private val auditedState: Seq[(String, String)] = Seq(
    "EventStreams.scala:flatMapGroupsWithState:sessionizeStream" ->
      "one open-session struct per user (constant fields, not events); EVICTS via event-time timeout at the inactivity gap — state = concurrently-open sessions",
    "EventStreams.scala:flatMapGroupsWithState:topKApproxSummaries" ->
      "space-saving summaries: <= capacity (key, count) entries per (group, hash bucket) FOREVER — bounded by construction on unbounded key spaces (the documented swap-in for exact streamingTopK)",
    "EventStreams.scala:flatMapGroupsWithState:streamingPrioritySample" ->
      "bounded heap: <= k+1 rows per bucket FOREVER plus one count — bounded by construction whatever the stream length",
    "EventStreams.scala:flatMapGroupsWithState:streamingFunnel" ->
      "per-user per-step event-time SETS = the user's funnel-event count; NO eviction — the EXACT variant (late step-1 re-qualification needs every time below the chain); streamingFunnelTtl is the bounded path",
    "EventStreams.scala:flatMapGroupsWithState:streamingFunnelTtl" ->
      "in-horizon step times per user (arrival rate x horizon); EVICTS below the watermark each update + whole-user removal via event-time timeout one horizon past the newest retained step; trade: chains inside the horizon exact, older chains re-derive from the retained suffix",
    "EventStreams.scala:flatMapGroupsWithState:nearDupCandidateStream" ->
      "per (band, bucket): the doc-id set of that LSH bucket — bounded by bucket occupancy (banding spreads docs over 2^60 keys); emits each pair once",
    "EventStreams.scala:dropDuplicates:streamingDedup" ->
      "one state row per distinct key — key cardinality, not stream length (digests-not-bodies discipline); streamingDedupTtl is the bounded-horizon swap-in",
    "EventStreams.scala:dropDuplicatesWithinWatermark:streamingDedupTtl" ->
      "one state row per key only until the watermark passes its horizon — arrival rate x horizon on unbounded keys; trade: at-least-once distinct per horizon (recurrence re-emits), spec-pinned",
    "EventStreams.scala:dropDuplicates:streamingActiveUsers" ->
      "exact path: |users x active days| pair rows forever — pair cardinality, not event count; the horizon branch below is the bounded swap-in",
    "EventStreams.scala:dropDuplicatesWithinWatermark:streamingActiveUsers" ->
      "horizon path: |users x days-in-horizon| pair rows — watermark evicts closed days; trade: at-least-once pair per horizon, deduped by the drain before the rollup, spec-pinned",
    "EventStreams.scala:dropDuplicates:streamingBloomBits" ->
      "the live bit set: <= m rows FOREVER regardless of stream length (m fixed before the stream starts; production rotates filters per window and ORs)",
    "EventStreams.scala:dropDuplicates:streamingBloomRotated" ->
      "<= m bit rows per live window generation; the watermark on the window column (a dedup key) evicts closed generations wholesale — the rotation IS the eviction path",
    "EventStreams.scala:dropDuplicates:streamingRetention" ->
      "distinct (user, activity-day) pair rows — |users| x active-days like activeUsers' exact path; the watermark-on-day eviction applies when the product bounds the horizon")

  test("state audit: every stateful streaming site in main source is in the audited-bounds table") {
    import java.nio.file.{Files, Path, Paths}
    import scala.jdk.CollectionConverters._
    val root = Paths.get("src/main/scala/graft")
    assert(Files.isDirectory(root), s"audit must run from the repo root, missing $root")
    val apis = Seq("flatMapGroupsWithState", "mapGroupsWithState",
      "dropDuplicatesWithinWatermark", "dropDuplicates")
    def sitesOf(p: Path): Seq[String] = {
      val raw = new String(Files.readAllBytes(p), "UTF-8")
      val stripped = graft.AuditLex.stripComments(raw)
      // enclosing def = the nearest preceding MEMBER-level def (2-space
      // indent in this repo's style) — a nested `def update` helper
      // would otherwise claim the site and collide across operators
      val memberDef = "(?m)^  (?:private(?:\\[\\w+\\])?\\s+)?(?:final\\s+)?def\\s+(\\w+)".r
      val out = Seq.newBuilder[String]
      // the alternation lists dropDuplicatesWithinWatermark before
      // dropDuplicates so the longer API wins the match
      val marker = ("\\.\\s*(" + apis.mkString("|") + ")\\s*\\(").r
      marker.findAllMatchIn(stripped).foreach { m =>
        val enclosing = memberDef.findAllMatchIn(stripped.substring(0, m.start))
          .map(_.group(1)).toSeq.lastOption.getOrElse("<top>")
        out += s"${p.getFileName}:${m.group(1)}:$enclosing"
      }
      out.result()
    }
    val found = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala") && !p.toString.contains("/tools/"))
      .flatMap(sitesOf).toVector.sorted
    val audited = auditedState.map(_._1).sorted
    val unaudited = graft.AuditLex.diffMultiset(found, audited)
    val stale = graft.AuditLex.diffMultiset(audited, found)
    assert(unaudited.isEmpty,
      s"NEW stateful streaming site(s) without a pinned state bound — add " +
        s"them to auditedState WITH the bound: $unaudited")
    assert(stale.isEmpty,
      s"audited stateful site(s) no longer exist — drop them: $stale")
  }
}
