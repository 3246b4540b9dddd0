package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.config.GraftConfig
import graft.config.GraftConfig._

/** Config-engine behaviors replayed from the reference's test suite
  * (TestConfSettings.java, TestDockerComposeSecrets.java,
  * TestExtendedConf.java) plus ScalaCheck laws for the env-name munge
  * (rule at docker-entrypoint.sh:605 / Configuration.java:93).
  */
class ConfigSpec extends AnyFunSuite {

  /** Deterministic property check without the scalatestplus bridge
    * (not in the offline dependency cache). */
  private def forAllSampled[A](gen: Gen[A], n: Int = 200)(check: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  // ---- env name munge ----

  test("munge: NEO4J_server_memory_pagecache_size -> server.memory.pagecache.size") {
    assert(mungeEnvName("NEO4J_server_memory_pagecache_size") == "server.memory.pagecache.size")
  }

  test("munge: double underscore -> literal underscore (ref docker-entrypoint.sh:551-555)") {
    assert(mungeEnvName("NEO4J_server_tx__log_rotation_retention__policy")
      == "server.tx_log.rotation.retention_policy")
    assert(mungeEnvName("NEO4J_db_tx__log_rotation_retention__policy")
      == "db.tx_log.rotation.retention_policy")
  }

  test("munge law: round-trips any setting name (ScalaCheck)") {
    val segment = Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaLowerChar, Gen.const('_')))
      .map(_.mkString).suchThat(s => !s.startsWith("_") && !s.endsWith("_") && !s.contains("__"))
    val setting = Gen.nonEmptyListOf(segment).map(_.mkString("."))
    forAllSampled(setting) { s =>
      val envName = "NEO4J_" + s.replace("_", "__").replace(".", "_")
      assert(mungeEnvName(envName) == s, s"setting: $s env: $envName")
    }
  }

  // ---- precedence: default < conf < env ----

  test("docker defaults do not overwrite conf-file values (TestConfSettings confs-over-defaults)") {
    val a = assemble(Map.empty, userConf = Some("server.memory.pagecache.size=100M"))
    assert(a.resolved()("server.memory.pagecache.size") == "100M")
  }

  test("docker defaults applied when absent (pagecache 512M, listen 0.0.0.0)") {
    val a = assemble(Map.empty)
    assert(a.resolved()("server.memory.pagecache.size") == "512M")
    assert(a.resolved()("server.default_listen_address") == "0.0.0.0")
  }

  test("env vars override both defaults and conf values (testEnvVarsOverrideDefaultConfigurations)") {
    val a = assemble(
      Map("NEO4J_server_memory_pagecache_size" -> "1000.00MiB"),
      userConf = Some("server.memory.pagecache.size=100M"))
    assert(a.resolved()("server.memory.pagecache.size") == "1000.00MiB")
  }

  test("conf file without trailing newline still gets appended settings (NoNewline.conf)") {
    val a = assemble(
      Map("NEO4J_server_memory_heap_max__size" -> "128.00MiB"),
      userConf = Some("server.memory.pagecache.size=1000.00MiB")) // no trailing newline
    assert(a.resolved()("server.memory.pagecache.size") == "1000.00MiB")
    assert(a.resolved()("server.memory.heap.max_size") == "128.00MiB")
  }

  // ---- append keys ----

  test("server.jvm.additional appends instead of replacing (docker-entrypoint.sh:273)") {
    val a = assemble(
      Map("NEO4J_server_jvm_additional" -> "-Dcustom.flag=2"),
      userConf = Some("server.jvm.additional=-Dcustom.flag=1"))
    assert(a.resolved()("server.jvm.additional") == "-Dcustom.flag=1,-Dcustom.flag=2")
    assert(a.files(Neo4jConf).count(_._1 == "server.jvm.additional") == 2)
  }

  // ---- apoc routing ----

  test("apoc.* env settings land in apoc.conf not neo4j.conf (testApocEnvVarsAreWrittenToApocConf)") {
    val a = assemble(Map("NEO4J_apoc_export_file_enabled" -> "true"))
    assert(a.resolved(ApocConf)("apoc.export.file.enabled") == "true")
    assert(!a.resolved(Neo4jConf).contains("apoc.export.file.enabled"))
    assert(a.setting("apoc.export.file.enabled").contains("true"))
  }

  // ---- numeric-leading reject ----

  test("settings starting with a number are rejected with a warning (testIgnoreNumericVars)") {
    val a = assemble(Map("NEO4J_1a" -> "1"))
    assert(!a.resolved().contains("1a"))
    assert(a.warnings.exists(_.contains(
      "1a not written to conf file. Settings that start with a number are not permitted")))
  }

  // ---- empty values skipped ----

  test("empty env values are not written") {
    val a = assemble(Map("NEO4J_server_memory_heap_max__size" -> ""))
    assert(!a.resolved().contains("server.memory.heap.max_size"))
  }

  // ---- secrets (_FILE) ----

  test("NEO4J_*_FILE overrides the base env var (TestDockerComposeSecrets.java:72-130)") {
    val a = assemble(
      Map("NEO4J_server_memory_pagecache_size" -> "100M",
        "NEO4J_server_memory_pagecache_size_FILE" -> "/run/secrets/pagecache"),
      readFile = p => if (p == "/run/secrets/pagecache") Some("512.00MiB\n") else None)
    assert(a.resolved()("server.memory.pagecache.size") == "512.00MiB")
  }

  test("unreadable secret file errors (TestDockerComposeSecrets.java:169-191)") {
    val e = intercept[SecretError] {
      assemble(Map("NEO4J_AUTH_FILE" -> "/missing/secret"), readFile = _ => None)
    }
    assert(e.message.contains("The secret file '/missing/secret' does not exist or is not readable"))
  }

  // ---- legacy aliases ----

  test("legacy 4.x env names alias to 5.x settings when 5.x unset (docker-entrypoint.sh:559-566)") {
    val a = assemble(Map("NEO4J_dbms_memory_pagecache_size" -> "200M"))
    assert(a.resolved()("server.memory.pagecache.size") == "200M")
  }

  test("legacy alias does not clobber an explicit 5.x env value") {
    val a = assemble(Map(
      "NEO4J_dbms_memory_pagecache_size" -> "200M",
      "NEO4J_server_memory_pagecache_size" -> "300M"))
    assert(a.resolved()("server.memory.pagecache.size") == "300M")
  }

  // ---- control envs are not settings ----

  test("docker control env vars (NEO4J_AUTH, NEO4J_PLUGINS, ...) are not written as settings") {
    val a = assemble(Map("NEO4J_AUTH" -> "neo4j/secretpassword", "NEO4J_DEBUG" -> "yes"))
    assert(!a.resolved().contains("AUTH"))
    assert(!a.resolved().contains("DEBUG"))
  }

  // ---- plugin default-config merge ----

  test("plugin defaults appended unless user already set them (TestPluginInstallation.java:115-130)") {
    val a = assemble(Map("NEO4J_PLUGINS" -> """["apoc"]"""))
    assert(a.resolved()("dbms.security.procedures.unrestricted") == "apoc.*")
  }

  test("user-set plugin property wins with a skip notice") {
    val a = assemble(Map("NEO4J_PLUGINS" -> """["apoc"]"""),
      userConf = Some("dbms.security.procedures.unrestricted=my.extensions.example"))
    assert(a.resolved()("dbms.security.procedures.unrestricted") == "my.extensions.example")
    assert(a.warnings.exists(_.contains("Skipping dbms.security.procedures.unrestricted")))
  }

  test("second plugin comma-appends to a property the first plugin added") {
    val a = assemble(Map("NEO4J_PLUGINS" -> """["apoc", "graph-data-science"]"""))
    assert(a.resolved()("dbms.security.procedures.unrestricted") == "gds.*,apoc.*")
  }

  test("unknown plugin errors listing options, hiding _testing (docker-entrypoint.sh:220-224)") {
    val e = intercept[IllegalArgumentException] {
      assemble(Map("NEO4J_PLUGINS" -> """["not-a-plugin"]"""))
    }
    assert(e.getMessage.contains("\"not-a-plugin\" is not a known Neo4j plugin"))
    assert(e.getMessage.contains("apoc"))
    assert(!e.getMessage.contains("_testing"))
  }

  // ---- EXTENDED_CONF ----

  test("EXTENDED_CONF expands $(expr ...) in conf values (ExtendedConf.conf fixture)") {
    val conf = Some("server.memory.pagecache.size=$(expr 2 * 10)M")
    val off = assemble(Map.empty, userConf = conf)
    assert(off.resolved()("server.memory.pagecache.size") == "$(expr 2 * 10)M")
    val on = assemble(Map("EXTENDED_CONF" -> "yes"), userConf = conf)
    assert(on.resolved()("server.memory.pagecache.size") == "20M")
  }

  // ---- dump-config sink ----

  test("dump-config writes the assembled conf files (docker-entrypoint.sh:646-655)") {
    val a = assemble(Map(
      "NEO4J_server_memory_heap_max__size" -> "128M",
      "NEO4J_apoc_export_file_enabled" -> "true"))
    val dir = java.nio.file.Files.createTempDirectory("graft-conf").toString
    a.dumpTo(dir)
    val neo4jConf = java.nio.file.Files.readString(java.nio.file.Paths.get(dir, Neo4jConf))
    assert(neo4jConf.contains("server.memory.heap.max_size=128M"))
    assert(neo4jConf.contains("server.memory.pagecache.size=512M"))
    val apocConf = java.nio.file.Files.readString(java.nio.file.Paths.get(dir, ApocConf))
    assert(apocConf.trim == "apoc.export.file.enabled=true")
    // round-trip: parsing the dump resolves to the same settings
    assert(parseConf(neo4jConf).toMap == a.resolved())
  }

  // ---- enterprise defaults ----

  test("enterprise cluster advertised-address defaults (docker-entrypoint.sh:578-584)") {
    val a = assemble(Map("NEO4J_EDITION" -> "enterprise"), edition = "enterprise", hostname = "myhost")
    assert(a.resolved()("server.cluster.advertised_address") == "myhost:6000")
    assert(a.resolved()("server.cluster.raft.advertised_address") == "myhost:7000")
    assert(a.resolved()("server.routing.advertised_address") == "myhost:7688")
  }
}
