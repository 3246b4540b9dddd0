package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.auth.{Auth, AuthStore}
import graft.tools.GraftAdmin

/** Auth bootstrap behaviors (SURVEY.md §2.7), replayed from
  * TestAuthentication.java and docker-entrypoint.sh:299-360,617-633.
  */
class AuthSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def tmp(): String = Files.createTempDirectory("graft-auth").toString

  // ---- NEO4J_AUTH parsing ----

  test("NEO4J_AUTH=none disables auth (TestAuthentication.java:57-71)") {
    assert(Auth.parse(Some("none")) == Auth.NoAuth)
  }

  test("NEO4J_AUTH=neo4j/<pw> sets password; /true requests reset (:256)") {
    assert(Auth.parse(Some("neo4j/secretpassword")) ==
      Auth.SetPassword("neo4j", "secretpassword", requireChange = false, Nil))
    assert(Auth.parse(Some("neo4j/secretpassword/true")) ==
      Auth.SetPassword("neo4j", "secretpassword", requireChange = true, Nil))
    assert(Auth.parse(Some("neo4j/secretpassword/TRUE")) ==
      Auth.SetPassword("neo4j", "secretpassword", requireChange = true, Nil))
  }

  test("password 'neo4j' rejected (docker-entrypoint.sh:313-316, TestAuthentication.java:74)") {
    val e = intercept[Auth.AuthError] { Auth.parse(Some("neo4j/neo4j")) }
    assert(e.message.contains("It cannot be 'neo4j', which is the default"))
  }

  test("non-neo4j admin user rejected (docker-entrypoint.sh:317-319)") {
    val e = intercept[Auth.AuthError] { Auth.parse(Some("admin/secretpassword")) }
    assert(e.message.contains("Invalid admin username, it must be neo4j"))
  }

  test("short password warns, override via min-length setting (:323-330, TestAuthentication.java:282,309)") {
    val warned = Auth.parse(Some("neo4j/short1"))
    assert(warned.asInstanceOf[Auth.SetPassword].warnings
      .exists(_.contains("minimum password length is 8")))
    val overridden = Auth.parse(Some("neo4j/short1"), minPasswordLength = 4)
    assert(overridden.asInstanceOf[Auth.SetPassword].warnings.isEmpty)
  }

  test("garbage NEO4J_AUTH value is invalid (docker-entrypoint.sh:355-358)") {
    val e = intercept[Auth.AuthError] { Auth.parse(Some("justapassword/with/too/many/parts")) }
    assert(e.message.contains("Invalid value for NEO4J_AUTH"))
  }

  // ---- NEO4J_AUTH_PATH precedence ----

  test("NEO4J_AUTH_PATH beats NEO4J_AUTH (docker-entrypoint.sh:619-633, TestAuthentication.java:166)") {
    val b = Auth.resolveBootstrap(
      Map("NEO4J_AUTH" -> "neo4j/envpassword", "NEO4J_AUTH_PATH" -> "/run/secrets/auth"),
      readFile = p => if (p == "/run/secrets/auth") Some("neo4j/filepassword\n") else None)
    assert(b == Auth.SetPassword("neo4j", "filepassword", requireChange = false, Nil))
  }

  test("missing NEO4J_AUTH_PATH file errors") {
    val e = intercept[Auth.AuthError] {
      Auth.resolveBootstrap(Map("NEO4J_AUTH_PATH" -> "/missing"), _ => None)
    }
    assert(e.message.contains("The password file '/missing' does not exist"))
  }

  // ---- credential store ----

  test("existing password never overwritten (TestAuthentication.java:222)") {
    val dir = tmp()
    val store = new AuthStore(dir)
    assert(store.setInitialPassword("firstpassword"))
    assert(!store.setInitialPassword("secondpassword"))
    assert(store.verify("neo4j", "firstpassword"))
    assert(!store.verify("neo4j", "secondpassword"))
  }

  test("set-initial-password verb with --require-password-change (docker-entrypoint.sh:340-352)") {
    val dir = tmp()
    assert(GraftAdmin.run(
      Seq("dbms", "set-initial-password", "secretpassword", "--require-password-change"), dir) == 0)
    val store = new AuthStore(dir)
    assert(store.verify("neo4j", "secretpassword"))
    assert(store.requiresPasswordChange("neo4j"))
  }

  // ---- C12/C13 through the session ----

  test("C12: ALTER CURRENT USER SET PASSWORD FROM ... TO ... (DatabaseIO.java:113-115)") {
    val s = GraftSession.fromEnv(spark, Map("NEO4J_AUTH" -> "neo4j/oldpassword"),
      dataDir = Some(tmp()))
    s.cypher("ALTER CURRENT USER SET PASSWORD FROM 'oldpassword' TO 'newpassword'", "system")
    assert(s.authStore.get.verify("neo4j", "newpassword"))
    assert(!s.authStore.get.verify("neo4j", "oldpassword"))
    s.login("neo4j", "newpassword")
  }

  test("C13: CALL dbms.changePassword(...) legacy form (DatabaseIO.java:117)") {
    val s = GraftSession.fromEnv(spark, Map("NEO4J_AUTH" -> "neo4j/oldpassword"),
      dataDir = Some(tmp()))
    s.cypher("CALL dbms.changePassword('newpassword')", "system").collect()
    assert(s.authStore.get.verify("neo4j", "newpassword"))
  }

  test("login rejects a wrong credential") {
    val s = GraftSession.fromEnv(spark, Map("NEO4J_AUTH" -> "neo4j/secretpassword"),
      dataDir = Some(tmp()))
    intercept[Auth.AuthError] { s.login("neo4j", "wrongpassword") }
    s.login("neo4j", "secretpassword")
  }

  test("random per-entry salt: identical passwords produce different stored lines") {
    val d1 = tmp(); val d2 = tmp()
    new AuthStore(d1).setInitialPassword("samepassword")
    new AuthStore(d2).setInitialPassword("samepassword")
    val l1 = Files.readString(java.nio.file.Paths.get(d1, "dbms", "auth"))
    val l2 = Files.readString(java.nio.file.Paths.get(d2, "dbms", "auth"))
    assert(l1 != l2, "identical passwords must not produce identical auth lines")
    assert(new AuthStore(d1).verify("neo4j", "samepassword"))
    assert(new AuthStore(d2).verify("neo4j", "samepassword"))
  }

  test("bootstrap against a data dir with existing credentials keeps the old password") {
    val dir = tmp()
    new AuthStore(dir).setInitialPassword("realpassword")
    val s = GraftSession.fromEnv(spark, Map("NEO4J_AUTH" -> "neo4j/ignoredpassword"),
      dataDir = Some(dir))
    assert(s.authStore.get.verify("neo4j", "realpassword"))
    assert(!s.authStore.get.verify("neo4j", "ignoredpassword"))
  }
}
