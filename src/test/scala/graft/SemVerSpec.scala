package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.procs.SemVer

/** Replays the reference's semver matrix
  * (TestSemVerPluginMatching.java:56-186; semantics from
  * docker-image-src/common/semver.jq:1-22) for engine version 5.26.0,
  * including the `-build` suffix variant the suite tests.
  */
class SemVerSpec extends AnyFunSuite {

  private val versions = Seq("5.26.0", "5.26.0-12345")

  private val matching = Seq(
    "5.26.0", "5.26.x", "5.26.*", "5.x.x", "5.*.*", "x.x.x", "*.*.*")

  private val nonMatching = Seq(
    "6.26.x", "4.26.x", "5.27.x", "5.25.x",
    "6.26.*", "4.26.*", "5.27.*", "5.25.*")

  test("matching specs match both release and build-suffixed versions") {
    for (v <- versions; spec <- matching)
      assert(SemVer.matches(spec, v), s"$spec should match $v")
  }

  test("non-matching specs match neither version variant") {
    for (v <- versions; spec <- nonMatching)
      assert(!SemVer.matches(spec, v), s"$spec should NOT match $v")
  }

  test("null/empty requested version never matches (semver.jq rule 1)") {
    assert(!SemVer.matches("5.26.0", ""))
    assert(!SemVer.matches("x.x.x", null))
  }

  test("component present on only one side does not match (jq null comparisons)") {
    assert(!SemVer.matches("5", "5.26.0"))
    assert(!SemVer.matches("5.26.0", "5.26"))
    assert(!SemVer.matches("5.x", "5"))
  }

  test("selection prefers exact > major.minor > major > wildcard (prefersExactMatch etc.)") {
    assert(SemVer.selectBest(Seq("x.x.x", "5.x.x", "5.26.x", "5.26.0"), "5.26.0")
      .contains("5.26.0"))
    assert(SemVer.selectBest(Seq("x.x.x", "5.x.x", "5.26.x"), "5.26.0")
      .contains("5.26.x"))
    assert(SemVer.selectBest(Seq("x.x.x", "5.x.x"), "5.26.0")
      .contains("5.x.x"))
    assert(SemVer.selectBest(Seq("x.x.x"), "5.26.0").contains("x.x.x"))
    assert(SemVer.selectBest(Seq("4.x.x"), "5.26.0").isEmpty)
  }
}
