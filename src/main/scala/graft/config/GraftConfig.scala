package graft.config

import scala.collection.mutable

/** Layered configuration engine with the reference image's exact
  * semantics (SURVEY.md §2.3). All behavior is re-expressed from
  * `/root/reference/docker-image-src/calver/coredb/docker-entrypoint.sh`:
  *
  *  - `_FILE` secret env vars override their base env var
  *    (docker-entrypoint.sh:549-573 secrets block, lines 400-426 in
  *    SURVEY numbering).
  *  - Legacy 4.x env names alias to 5.x names unless the 5.x name is
  *    already set (docker-entrypoint.sh:559-566).
  *  - Docker defaults never overwrite conf-file values
  *    (`add_docker_default_to_conf`, :254-265).
  *  - Env settings always overwrite conf + defaults
  *    (`add_env_setting_to_conf`, :267-297), except append-keys
  *    (`server.jvm.additional`) which accumulate (:273).
  *  - `apoc.*` settings route to apoc.conf, not neo4j.conf (:276-283).
  *  - Env name munge: strip `NEO4J_`, `_`→`.`, then `..`→`_`
  *    (:605; same rule as test Configuration.java:93).
  *  - Settings starting with a digit are rejected with a warning
  *    (:607-613; test TestConfSettings.java:99).
  *  - Plugin default properties merge: user-set (in the ORIGINAL conf)
  *    wins with a skip notice; already-present (added by an earlier
  *    plugin) comma-appends; otherwise append
  *    (`apply_plugin_default_configuration`, :182-212).
  *  - Unknown plugin names error, listing known plugins minus the
  *    first (sorted) key — which hides `_testing` (:220-224).
  *  - `EXTENDED_CONF` opt-in expands `$(expr a OP b)` command
  *    substitutions in conf-file values (:344-346, :664-666; fixture
  *    src/test/resources/confs/ExtendedConf.conf).
  */
object GraftConfig {

  /** Conf-file targets, mirroring the reference's per-prefix routing. */
  val Neo4jConf = "neo4j.conf"
  val ApocConf = "apoc.conf"

  /** Keys that append rather than replace (docker-entrypoint.sh:271). */
  val appendNotReplace: Set[String] = Set("server.jvm.additional")

  /** Docker control env vars that are not settings (:589-591). */
  val notConfigs: Set[String] = Set(
    "NEO4J_ACCEPT_LICENSE_AGREEMENT", "NEO4J_AUTH", "NEO4J_AUTH_PATH",
    "NEO4J_DEBUG", "NEO4J_EDITION", "NEO4J_HOME", "NEO4J_PLUGINS",
    "NEO4J_SHA256", "NEO4J_TARBALL", "NEO4J_DEPRECATION_WARNING")

  /** Plugin registry: name -> default properties, mirroring
    * neo4j-plugins.json (values re-expressed for this engine's packs;
    * the hidden `_testing` entry sorts first, exactly like the
    * reference's jq `keys`). */
  val pluginProperties: Map[String, Seq[(String, String)]] = Map(
    "_testing" -> Seq("dbms.security.procedures.unrestricted" -> "graft.testing.*"),
    "apoc" -> Seq("dbms.security.procedures.unrestricted" -> "apoc.*"),
    "apoc-extended" -> Seq("dbms.security.procedures.unrestricted" -> "apoc.*"),
    "bloom" -> Seq(
      "server.unmanaged_extension_classes" -> "com.neo4j.bloom.server=/browser/bloom",
      "dbms.security.procedures.unrestricted" -> "bloom.*",
      "dbms.bloom.license_file" -> "/licenses/bloom.license"),
    "fleet-management" -> Seq(
      "dbms.security.procedures.unrestricted" -> "fleetManagement.*",
      "dbms.security.procedures.allowlist" -> "fleetManagement.*"),
    "genai" -> Seq("dbms.security.procedures.unrestricted" -> "genai.*"),
    "graph-data-science" -> Seq("dbms.security.procedures.unrestricted" -> "gds.*"))

  /** Known plugin names, sorted (jq `keys` sorts; `_` < letters). */
  def knownPlugins: Seq[String] = pluginProperties.keys.toSeq.sorted

  /** Legacy 4.x -> 5.x env aliases (docker-entrypoint.sh:559-566).
    * Community-edition subset plus the enterprise cluster pair. */
  private val legacyEnvAliases: Seq[(String, String, Boolean)] = Seq(
    // (legacy, current, enterpriseOnly)
    ("NEO4J_dbms_tx__log_rotation_retention__policy",
      "NEO4J_db_tx__log_rotation_retention__policy", false),
    ("NEO4J_dbms_memory_pagecache_size",
      "NEO4J_server_memory_pagecache_size", false),
    ("NEO4J_dbms_default__listen__address",
      "NEO4J_server_default__listen__address", false),
    ("NEO4J_causal__clustering_transaction__advertised__address",
      "NEO4J_server_cluster_advertised__address", true),
    ("NEO4J_causal__clustering_raft__advertised__address",
      "NEO4J_server_cluster_raft_advertised__address", true))

  /** Env var name -> setting name: strip NEO4J_, `_`->`.`, `..`->`_`
    * (exactly the sed pipeline at docker-entrypoint.sh:605). */
  def mungeEnvName(envName: String): String =
    envName.stripPrefix("NEO4J_").replace("_", ".").replace("..", "_")

  /** Parse a properties-style conf file: `key=value` lines, `#`
    * comments; no trailing newline required (the reference's
    * NoNewline.conf fixture). Order preserved; repeated keys kept. */
  def parseConf(text: String): Vector[(String, String)] =
    text.linesIterator
      .map(_.takeWhile(_ != '#').trim)
      .filter(l => l.nonEmpty && l.contains('='))
      .map { l =>
        val i = l.indexOf('=')
        (l.take(i).trim, l.drop(i + 1).trim)
      }
      .toVector

  /** `$(expr A OP B)` command expansion for EXTENDED_CONF values —
    * a tiny safe arithmetic evaluator, NOT a shell. */
  private val ExprCmd = """\$\(\s*expr\s+(-?\d+)\s*([-+*/%])\s*(-?\d+)\s*\)""".r
  def expandCommands(value: String): String =
    ExprCmd.replaceAllIn(value, m => {
      val (a, b) = (m.group(1).toLong, m.group(3).toLong)
      val r = m.group(2) match {
        case "+" => a + b
        case "-" => a - b
        case "*" => a * b
        case "/" => a / b
        case "%" => a % b
      }
      r.toString
    })

  /** Result of config assembly: per-file ordered setting lines (append
    * keys may repeat), plus warnings in emission order. */
  final case class Assembled(
      files: Map[String, Vector[(String, String)]],
      warnings: Seq[String]) {

    /** Resolved view of one conf file: last writer wins, append keys
      * comma-join in line order (the shape `dbms.listConfig` lists). */
    def resolved(file: String = Neo4jConf): Map[String, String] = {
      val lines = files.getOrElse(file, Vector.empty)
      lines.groupBy(_._1).map { case (k, vs) =>
        if (appendNotReplace(k)) k -> vs.map(_._2).mkString(",")
        else k -> vs.last._2
      }
    }

    def setting(name: String): Option[String] =
      resolved(if (name.startsWith("apoc.")) ApocConf else Neo4jConf).get(name)

    /** Properties-file text of one conf file, line order preserved
      * (the `dump-config` sink — docker-entrypoint.sh:646-655). */
    def render(file: String = Neo4jConf): String =
      files.getOrElse(file, Vector.empty)
        .map { case (k, v) => s"$k=$v" }.mkString("", "\n", "\n")

    /** `dump-config`: write the assembled conf files to a directory. */
    def dumpTo(dir: String): Unit = {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      files.keys.foreach { f =>
        if (files(f).nonEmpty || f == Neo4jConf)
          java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, f), render(f))
      }
    }
  }

  final case class SecretError(message: String) extends RuntimeException(message)

  /** Full assembly pipeline in the reference's order: secrets ->
    * legacy aliases -> plugins -> docker defaults -> env overrides.
    *
    * @param env       process environment (NEO4J_* selected inside)
    * @param userConf  contents of a mounted neo4j.conf, if any
    * @param userApocConf contents of a mounted apoc.conf, if any
    * @param readFile  secret-file reader; None = unreadable (error)
    * @param hostname  for enterprise advertised-address defaults
    */
  def assemble(
      env: Map[String, String],
      userConf: Option[String] = None,
      userApocConf: Option[String] = None,
      readFile: String => Option[String] = _ => None,
      edition: String = "community",
      hostname: String = "localhost"): Assembled = {

    val warnings = mutable.ArrayBuffer.empty[String]

    // == extract secrets from files (overrides equivalent env var) ==
    var e = env
    env.keys.filter(k => k.startsWith("NEO4J_") && k.endsWith("_FILE")).foreach { k =>
      val base = k.stripSuffix("_FILE")
      val path = env(k)
      readFile(path) match {
        case Some(content) => e = e.updated(base, content.reverse.dropWhile(_ == '\n').reverse)
        case None => throw SecretError(
          s"The secret file '$path' does not exist or is not readable. " +
            "Make sure you have correctly configured docker secrets.")
      }
    }

    // == rename legacy environment conf variables ==
    // `: ${current:=${legacy:-}}` semantics: set the 5.x name only if
    // unset; the legacy var itself stays in the env (and is written
    // under its munged 4.x setting name, exactly like the reference —
    // "the other config renames will be taken care of inside Neo4j").
    legacyEnvAliases.foreach { case (legacy, current, entOnly) =>
      if ((!entOnly || edition == "enterprise") &&
          !e.get(current).exists(_.nonEmpty) && e.get(legacy).exists(_.nonEmpty))
        e = e.updated(current, e(legacy))
    }

    val extendedConf = e.contains("EXTENDED_CONF") || e.contains("NEO4J_EXTENDED_CONF")
    def expand(v: String): String = if (extendedConf) expandCommands(v) else v

    // conf files (command expansion applies to file-sourced values)
    val conf = mutable.Map[String, Vector[(String, String)]](
      Neo4jConf -> userConf.map(parseConf).getOrElse(Vector.empty)
        .map { case (k, v) => (k, expand(v)) },
      ApocConf -> userApocConf.map(parseConf).getOrElse(Vector.empty)
        .map { case (k, v) => (k, expand(v)) })

    // snapshot of the ORIGINAL user conf: plugin defaults never
    // override what the user set explicitly (docker-entrypoint.sh:231)
    val originalUserKeys = conf(Neo4jConf).map(_._1).toSet

    // == load plugins: validate names, merge default properties ==
    val plugins = e.get("NEO4J_PLUGINS").map(parsePluginList).getOrElse(Nil)
    plugins.foreach { p =>
      if (!pluginProperties.contains(p))
        throw new IllegalArgumentException(
          s""""$p" is not a known Neo4j plugin. Options are:
             |${knownPlugins.drop(1).mkString("\n")}""".stripMargin)
    }
    plugins.foreach { p =>
      pluginProperties(p).foreach { case (prop, value) =>
        if (originalUserKeys.contains(prop)) {
          warnings += s"Skipping $prop for plugin $p because it is already set."
        } else if (conf(Neo4jConf).exists(_._1 == prop)) {
          // added by an earlier plugin: comma-append to that line
          conf(Neo4jConf) = conf(Neo4jConf).map {
            case (`prop`, existing) => (prop, s"$value,$existing")
            case other => other
          }
        } else {
          conf(Neo4jConf) :+= (prop -> value)
        }
      }
    }

    // == docker-specific defaults: never overwrite conf values ==
    def addDefault(setting: String, value: String): Unit =
      if (!conf(Neo4jConf).exists(_._1 == setting))
        conf(Neo4jConf) :+= (setting -> value)
    addDefault("server.memory.pagecache.size", "512M")
    addDefault("server.default_listen_address", "0.0.0.0")
    if (edition == "enterprise") {
      addDefault("server.cluster.advertised_address", s"$hostname:6000")
      addDefault("server.cluster.raft.advertised_address", s"$hostname:7000")
      addDefault("server.routing.advertised_address", s"$hostname:7688")
    }

    // == env overrides: overwrite both defaults and conf values ==
    // (reverse-sorted name order, like the reference's `sort -rn`)
    e.keys.filter(_.startsWith("NEO4J_")).toSeq.sorted(Ordering[String].reverse).foreach { k =>
      if (!notConfigs.contains(k) && !k.endsWith("_FILE")) {
        val setting = mungeEnvName(k)
        val value = e(k)
        if (value.nonEmpty) {
          if (setting.headOption.exists(_.isDigit)) {
            warnings += s"WARNING: $setting not written to conf file. " +
              "Settings that start with a number are not permitted."
          } else {
            val file = if (setting.takeWhile(_ != '.') == "apoc") ApocConf else Neo4jConf
            val keep =
              if (appendNotReplace(setting)) conf(file)
              else conf(file).filterNot(_._1 == setting)
            conf(file) = keep :+ (setting -> value)
          }
        }
      }
    }

    Assembled(conf.toMap, warnings.toSeq)
  }

  /** Parse the NEO4J_PLUGINS JSON array (`["apoc","gds"]`) without a
    * JSON library: quoted names, order preserved. */
  def parsePluginList(json: String): Seq[String] =
    """"([^"]*)"""".r.findAllMatchIn(json).map(_.group(1)).toSeq
}
