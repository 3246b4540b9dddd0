package graft.auth

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

/** Auth bootstrap + credential store (SURVEY.md §2.7; behaviors from
  * docker-entrypoint.sh:299-360,617-633 and TestAuthentication.java).
  *
  * The engine is embedded, so parity means the same parse/validation/
  * precedence semantics, unit-tested: `NEO4J_AUTH=none` disables auth;
  * `neo4j/<pw>[/true]` sets the initial password (user must be
  * `neo4j`, password must not be `neo4j`, minimum length 8 unless
  * `dbms.security.auth_minimum_password_length` overrides);
  * `NEO4J_AUTH_PATH` beats the env var; an existing password is never
  * overwritten by env configuration.
  */
object Auth {

  sealed trait Bootstrap
  case object Unset extends Bootstrap
  case object NoAuth extends Bootstrap
  final case class SetPassword(user: String, password: String, requireChange: Boolean,
      warnings: Seq[String]) extends Bootstrap

  final case class AuthError(message: String) extends RuntimeException(message)

  private val AuthRe = "^([^/]+)/([^/]+)/?([tT][rR][uU][eE])?$".r

  /** Parse a NEO4J_AUTH value (docker-entrypoint.sh:305-331). The
    * too-short password produces a warning (the entrypoint warns; the
    * server then refuses the weak password itself). */
  def parse(value: Option[String], minPasswordLength: Int = 8): Bootstrap = value match {
    case None | Some("") => Unset
    case Some("none") => NoAuth
    case Some(AuthRe(user, password, reset)) =>
      if (password == "neo4j")
        throw AuthError("Invalid value for password. It cannot be 'neo4j', which is the default.")
      if (user != "neo4j")
        throw AuthError("Invalid admin username, it must be neo4j.")
      val warnings =
        if (password.length < minPasswordLength)
          Seq("Invalid value for password. The minimum password length is 8 characters.\n" +
            "If Neo4j fails to start, you can:\n" +
            "  1) Use a stronger password.\n" +
            "  2) Set configuration dbms.security.auth_minimum_password_length to override the minimum password length requirement.\n" +
            "  3) Set environment variable NEO4J_dbms_security_auth__minimum__password__length to override the minimum password length requirement.")
        else Nil
      SetPassword(user, password, reset != null, warnings)
    case Some(other) =>
      throw AuthError(s"Invalid value for NEO4J_AUTH: '$other'")
  }

  /** Resolve the auth source: NEO4J_AUTH_PATH (file) beats NEO4J_AUTH
    * (docker-entrypoint.sh:619-633); a missing file is an error. */
  def resolveBootstrap(env: Map[String, String],
      readFile: String => Option[String],
      minPasswordLength: Int = 8): Bootstrap =
    env.get("NEO4J_AUTH_PATH").filter(_.nonEmpty) match {
      case Some(path) =>
        readFile(path) match {
          case Some(content) => parse(Some(content.trim), minPasswordLength)
          case None => throw AuthError(s"The password file '$path' does not exist")
        }
      case None => parse(env.get("NEO4J_AUTH"), minPasswordLength)
    }

  private def sha256(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
}

/** File-backed credential store under `<dataDir>/dbms/auth` (the
  * reference's auth file lives at /data/dbms — docker-entrypoint.sh:335).
  * Line format: `user:sha256(salt+password):salt:flags`. */
final class AuthStore(dataDir: String) {
  import Auth.AuthError

  private val authFile = Paths.get(dataDir, "dbms", "auth")

  def exists: Boolean = Files.exists(authFile)

  private def sha256(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def entries: Map[String, (String, String, String)] =
    if (!exists) Map.empty
    else Files.readString(authFile).linesIterator.filter(_.nonEmpty).map { l =>
      val Array(u, h, salt, flags) = l.split(":", 4)
      u -> ((h, salt, flags))
    }.toMap

  private def writeEntries(es: Map[String, (String, String, String)]): Unit = {
    Files.createDirectories(authFile.getParent)
    Files.writeString(authFile,
      es.toSeq.sortBy(_._1).map { case (u, (h, s, f)) => s"$u:$h:$s:$f" }.mkString("\n"))
  }

  /** Set the initial password; returns false (no-op) if credentials
    * already exist — env config never overwrites an existing password
    * (TestAuthentication.java:222). `graft-admin dbms set-initial-password`
    * analog (docker-entrypoint.sh:340-352). */
  def setInitialPassword(password: String, requireChange: Boolean = false): Boolean = {
    if (exists) false
    else {
      val salt = newSalt()
      writeEntries(Map("neo4j" ->
        ((sha256(salt + password), salt, if (requireChange) "password_change_required" else ""))))
      true
    }
  }

  /** Random per-entry salt (the reference's auth file stores a random
    * per-user salt too): identical passwords must not produce
    * identical stored lines, or the auth file leaks password equality. */
  private def newSalt(): String = {
    val bytes = new Array[Byte](16)
    new java.security.SecureRandom().nextBytes(bytes)
    bytes.map("%02x".format(_)).mkString
  }

  def verify(user: String, password: String): Boolean =
    entries.get(user).exists { case (h, salt, _) => h == sha256(salt + password) }

  def requiresPasswordChange(user: String): Boolean =
    entries.get(user).exists(_._3.contains("password_change_required"))

  /** C12/C13: change a password, validating the old credential. */
  def changePassword(user: String, from: String, to: String): Unit = {
    if (!verify(user, from))
      throw AuthError(s"Invalid principal or credentials for $user")
    if (to == from)
      throw AuthError("Old password and new password cannot be the same.")
    val salt = newSalt()
    writeEntries(entries.updated(user, (sha256(salt + to), salt, "")))
  }
}
