package graft.procs

/** Semantic-version matcher replicating the reference's jq library
  * (`/root/reference/docker-image-src/common/semver.jq:1-22`), used to
  * resolve which plugin-pack version serves a given engine version
  * (behaviors pinned by TestSemVerPluginMatching.java:56-186).
  *
  * A SPEC like `5.26.0`, `5.26.x`, `5.x.x`, `*.*.*` matches a concrete
  * VERSION (which may carry a build suffix, e.g. `5.26.0-12345`).
  * Selection among multiple matching specs replicates jq's
  * `min_by(.neo4j)`: lexicographic minimum — digits sort before `x`,
  * so exact beats major.minor.x beats major.x.x beats x.x.x.
  */
object SemVer {

  private val VerRe = """([0-9x*]+)(?:\.([0-9x*]+))?(?:\.?([0-9x*]+))?""".r

  private def parse(v: String): Option[(String, Option[String], Option[String])] =
    VerRe.findFirstMatchIn(v).map(m =>
      (m.group(1), Option(m.group(2)), Option(m.group(3))))

  private def wild(s: String): Boolean = s == "x" || s == "*"

  /** Does `spec` semantically match requested `version`?
    * (jq `semver($req)` with `.` = spec, `$req` = version.) */
  def matches(spec: String, version: String): Boolean = {
    if (version == null || version.isEmpty) return false
    if (spec == version) return true
    // per-component jq semantics: equal, or spec-side wildcard with the
    // version component PRESENT; a component present on only one side
    // never matches (the jq null comparisons + rules 4-5).
    def cmp(s: Option[String], r: Option[String]): Boolean = (s, r) match {
      case (None, None)         => true
      case (Some(sv), Some(rv)) => sv == rv || wild(sv)
      case _                    => false
    }
    (parse(spec), parse(version)) match {
      case (Some((sM, sm, sp)), Some((rM, rm, rp))) =>
        cmp(Some(sM), Some(rM)) && cmp(sm, rm) && cmp(sp, rp)
      case _ => false
    }
  }

  /** Pick the best-matching spec for a version: filter by [[matches]],
    * then jq's `min_by` (lexicographic min prefers exact matches). */
  def selectBest(specs: Seq[String], version: String): Option[String] =
    specs.filter(matches(_, version)).minOption
}
