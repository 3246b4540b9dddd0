package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.tools.Lifecycle

/** Lifecycle semantics (SURVEY.md §2.8), replayed from
  * TestBasic.java:192-281 and docker-entrypoint.sh:637-644.
  */
class LifecycleSpec extends AnyFunSuite {

  private def tmp(): String = Files.createTempDirectory("graft-life").toString

  test("stale pid file from a SIGKILLed process is cleaned at boot (TestBasic.java:230-266)") {
    val dir = tmp()
    assert(!Lifecycle.cleanStalePid(dir)) // nothing to clean on first boot
    Files.createDirectories(Paths.get(dir, "run"))
    Files.writeString(Paths.get(dir, "run", "graft.pid"), "99999")
    assert(Lifecycle.cleanStalePid(dir)) // stale lock removed
    assert(!Files.exists(Paths.get(dir, "run", "graft.pid")))
    Lifecycle.writePid(dir)
    assert(Files.exists(Paths.get(dir, "run", "graft.pid")))
  }

  test("EXTENSION_SCRIPT runs when present, errors when missing (TestBasic.java:268-281)") {
    val dir = tmp()
    val script = Paths.get(dir, "ext.sh")
    Files.writeString(script, "echo hello from extension")
    var sourced: Option[String] = None
    Lifecycle.runExtensionScript(Map("EXTENSION_SCRIPT" -> script.toString),
      s => sourced = Some(s))
    assert(sourced.contains("echo hello from extension"))

    val e = intercept[IllegalStateException] {
      Lifecycle.runExtensionScript(Map("EXTENSION_SCRIPT" -> s"$dir/missing.sh"), _ => ())
    }
    assert(e.getMessage.contains("no script exists there"))
    // unset -> no-op
    Lifecycle.runExtensionScript(Map.empty, _ => fail("should not run"))
  }

  test("SECURE_FILE_PERMISSIONS refuses a missing data dir (utilities.sh:7-10)") {
    val missing = tmp() + "/nonexistent"
    val e = intercept[IllegalStateException] {
      Lifecycle.checkDataDir(Map("SECURE_FILE_PERMISSIONS" -> "yes"), missing)
    }
    assert(e.getMessage.contains("must be accessible and writable"))
    // existing writable dir passes; unset flag never checks
    Lifecycle.checkDataDir(Map("SECURE_FILE_PERMISSIONS" -> "yes"), tmp())
    Lifecycle.checkDataDir(Map.empty, missing)
  }

  test("shutdown hook flushes, removes pid, and reports Stopped. (TestBasic.java:192-214)") {
    val dir = tmp()
    Lifecycle.writePid(dir)
    var flushed = false
    var logged = List.empty[String]
    val hook = Lifecycle.registerShutdownHook(dir, () => flushed = true, l => logged ::= l)
    try {
      hook.run()
      assert(flushed)
      assert(logged.contains("Stopped."))
      assert(!Files.exists(Paths.get(dir, "run", "graft.pid")))
    } finally Runtime.getRuntime.removeShutdownHook(hook)
  }

  // ---- 7474-style HTTP surface (ref WaitStrategies.java:24-39,
  // Dockerfile-trixie:54) --------------------------------------------

  private def httpGet(url: String): (Int, String) = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("GET")
    val code = conn.getResponseCode
    val is = if (code < 400) conn.getInputStream else conn.getErrorStream
    val body = new String(is.readAllBytes(), "UTF-8")
    (code, body)
  }

  private def httpPost(url: String, json: String,
      auth: Option[(String, String)] = None): (Int, String) = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/json")
    auth.foreach { case (u, p) =>
      val tok = java.util.Base64.getEncoder.encodeToString(s"$u:$p".getBytes("UTF-8"))
      conn.setRequestProperty("Authorization", s"Basic $tok")
    }
    conn.getOutputStream.write(json.getBytes("UTF-8"))
    val code = conn.getResponseCode
    val is = if (code < 400) conn.getInputStream else conn.getErrorStream
    val body = new String(is.readAllBytes(), "UTF-8")
    (code, body)
  }

  test("HTTP tx/commit round-trips the dogs graph; readiness flips with STOP/START") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val session = new GraftSession(spark)
    val ep = new graft.http.HttpEndpoint(session, 0) // ephemeral port
    val port = ep.start()
    try {
      val base = s"http://127.0.0.1:$port"
      // write + parameterized read in one transactional request
      val (code, body) = httpPost(s"$base/db/neo4j/tx/commit",
        """{"statements":[
          |{"statement":"CREATE (a:dog {name:'Arne'})-[:SNIFFS]->(b:dog {name:'Bosse'})"},
          |{"statement":"MATCH (a:dog)-[:SNIFFS]->(b:dog) WHERE a.name = $who RETURN a.name AS a, b.name AS b",
          | "parameters":{"who":"Arne"}}]}""".stripMargin)
      assert(code == 200, body)
      assert(body.contains(""""columns":["a","b"]"""), body)
      assert(body.contains(""""row":["Arne","Bosse"]"""), body)
      assert(body.contains(""""errors":[]"""), body)
      // a failing statement rolls the whole request back
      val (code2, body2) = httpPost(s"$base/db/neo4j/tx/commit",
        """{"statements":[
          |{"statement":"CREATE (c:dog {name:'Nope'})"},
          |{"statement":"THIS IS NOT CYPHER"}]}""".stripMargin)
      assert(code2 == 200)
      assert(body2.contains("SyntaxError"), body2)
      assert(session.graph().nodes.count() == 2) // Nope rolled back
      // readiness probe (ref WaitStrategies.java:24-39): 200 ↔ started
      assert(httpGet(s"$base/db/neo4j/cluster/available")._1 == 200)
      session.cypher("STOP DATABASE neo4j")
      assert(httpGet(s"$base/db/neo4j/cluster/available")._1 == 404)
      session.cypher("START DATABASE neo4j")
      assert(httpGet(s"$base/db/neo4j/cluster/available")._1 == 200)
      assert(httpGet(s"$base/db/nosuchdb/cluster/available")._1 == 404)
      // root discovery document (the default HttpWaitStrategy probe)
      val (dcode, dbody) = httpGet(s"$base/")
      assert(dcode == 200 && dbody.contains("neo4j_version"))
      // unknown endpoint
      assert(httpGet(s"$base/db/neo4j/wat")._1 == 404)
    } finally ep.stop()
  }

  private def httpDelete(url: String): (Int, String) = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("DELETE")
    val code = conn.getResponseCode
    val is = if (code < 400) conn.getInputStream else conn.getErrorStream
    val body = new String(is.readAllBytes(), "UTF-8")
    (code, body)
  }

  test("HTTP multi-request transactions: open/continue/commit, DELETE rollback, expiry, in-band text") {
    val spark = org.apache.spark.sql.SparkSession.builder().getOrCreate()
    val session = new GraftSession(spark)
    val ep = new graft.http.HttpEndpoint(session, 0)
    val port = ep.start()
    try {
      val base = s"http://127.0.0.1:$port"
      def oneShotCount(): String =
        httpPost(s"$base/db/neo4j/tx/commit",
          """{"statements":[{"statement":"MATCH (x:htx) RETURN count(x) AS c"}]}""")._2
      def txIdOf(body: String): String =
        """/db/neo4j/tx/(\d+)/commit""".r.findFirstMatchIn(body)
          .getOrElse(fail(s"no commit url in $body")).group(1)

      // open with an initial statement: 201 + commit URL + expires
      val (c0, b0) = httpPost(s"$base/db/neo4j/tx",
        """{"statements":[{"statement":"CREATE (x:htx {k: 1})"}]}""")
      assert(c0 == 201, b0)
      assert(b0.contains(""""transaction":{"expires":"""), b0)
      val id = txIdOf(b0)
      // continue inside the transaction; read-your-writes sees BOTH rows
      val (c1, b1) = httpPost(s"$base/db/neo4j/tx/$id",
        """{"statements":[{"statement":"CREATE (x:htx {k: 2})"},
          |{"statement":"MATCH (x:htx) RETURN count(x) AS c"}]}""".stripMargin)
      assert(c1 == 200, b1)
      assert(b1.contains(""""row":[2]"""), b1)
      // the autocommit surface sees NEITHER uncommitted write
      assert(oneShotCount().contains(""""row":[0]"""))
      // commit publishes atomically
      val (c2, b2) = httpPost(s"$base/db/neo4j/tx/$id/commit",
        """{"statements":[]}""")
      assert(c2 == 200 && b2.contains(""""errors":[]"""), b2)
      assert(oneShotCount().contains(""""row":[2]"""))
      // the committed transaction is gone
      assert(httpPost(s"$base/db/neo4j/tx/$id", """{"statements":[]}""")._1 == 404)

      // DELETE rolls back and closes
      val (c3, b3) = httpPost(s"$base/db/neo4j/tx",
        """{"statements":[{"statement":"CREATE (x:htx {k: 3})"}]}""")
      assert(c3 == 201)
      val id3 = txIdOf(b3)
      assert(httpDelete(s"$base/db/neo4j/tx/$id3")._1 == 200)
      assert(oneShotCount().contains(""""row":[2]"""))
      assert(httpPost(s"$base/db/neo4j/tx/$id3", """{"statements":[]}""")._1 == 404)

      // an errored statement rolls the transaction back AND closes it
      val (c4, b4) = httpPost(s"$base/db/neo4j/tx",
        """{"statements":[{"statement":"CREATE (x:htx {k: 4})"},
          |{"statement":"THIS IS NOT CYPHER"}]}""".stripMargin)
      assert(c4 == 201 && b4.contains("SyntaxError"), b4)
      assert(httpPost(s"$base/db/neo4j/tx/${txIdOf(b4)}",
        """{"statements":[]}""")._1 == 404)
      assert(oneShotCount().contains(""""row":[2]"""))

      // in-band transaction-control text errors the whole request back
      val (c5, b5) = httpPost(s"$base/db/neo4j/tx/commit",
        """{"statements":[{"statement":"CREATE (x:htx {k: 9})"},
          |{"statement":"COMMIT"}]}""".stripMargin)
      assert(c5 == 200 && b5.contains("SyntaxError"), b5)
      assert(oneShotCount().contains(""""row":[2]""")) // k:9 rolled back
    } finally ep.stop()

    // idle expiry: a short-deadline endpoint rolls the transaction
    // back on next access
    val ep2 = new graft.http.HttpEndpoint(session, 0, txIdleTimeoutMs = 250L)
    val port2 = ep2.start()
    try {
      val base2 = s"http://127.0.0.1:$port2"
      val (ce, be) = httpPost(s"$base2/db/neo4j/tx",
        """{"statements":[{"statement":"CREATE (x:htx {k: 5})"}]}""")
      assert(ce == 201)
      val ide = """/db/neo4j/tx/(\d+)/commit""".r.findFirstMatchIn(be).get.group(1)
      Thread.sleep(500)
      val (cx, bx) = httpPost(s"$base2/db/neo4j/tx/$ide", """{"statements":[]}""")
      assert(cx == 404 && bx.contains("TransactionNotFound"), bx)
      assert(httpPost(s"$base2/db/neo4j/tx/commit",
        """{"statements":[{"statement":"MATCH (x:htx) RETURN count(x) AS c"}]}""")
        ._2.contains(""""row":[2]""")) // k:5 rolled back
    } finally ep2.stop()
  }

  test("HTTPS serves the transactional endpoint from a keystore (7473 analog)") {
    val spark = org.apache.spark.sql.SparkSession.builder().getOrCreate()
    val dir = tmp()
    val ksPath = s"$dir/graft-ssl.p12"
    // self-signed cert via the JDK's own keytool (the reference wires
    // mounted certs through /ssl; a keystore plays that role here)
    val keytool = new ProcessBuilder(
      s"${System.getProperty("java.home")}/bin/keytool",
      "-genkeypair", "-alias", "graft", "-keyalg", "RSA", "-keysize", "2048",
      "-storetype", "PKCS12", "-keystore", ksPath, "-storepass", "changeit",
      "-dname", "CN=localhost", "-validity", "1").redirectErrorStream(true).start()
    assert(keytool.waitFor() == 0)
    val ctx = graft.http.HttpEndpoint.sslContextFromKeystore(ksPath, "changeit")
    val session = new GraftSession(spark)
    session.cypher("CREATE (:sec {v: 42})")
    val ep = new graft.http.HttpEndpoint(session, 0, "127.0.0.1", ssl = Some(ctx))
    val port = ep.start()
    try {
      // trust-all client (self-signed test cert)
      val trustAll = javax.net.ssl.SSLContext.getInstance("TLS")
      trustAll.init(null, Array[javax.net.ssl.TrustManager](
        new javax.net.ssl.X509TrustManager {
          override def checkClientTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
          override def checkServerTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
          override def getAcceptedIssuers: Array[java.security.cert.X509Certificate] = Array.empty
        }), new java.security.SecureRandom)
      val conn = new java.net.URL(s"https://127.0.0.1:$port/db/neo4j/tx/commit")
        .openConnection().asInstanceOf[javax.net.ssl.HttpsURLConnection]
      conn.setSSLSocketFactory(trustAll.getSocketFactory)
      conn.setHostnameVerifier((_, _) => true)
      conn.setRequestMethod("POST"); conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      conn.getOutputStream.write(
        """{"statements":[{"statement":"MATCH (s:sec) RETURN s.v AS v"}]}"""
          .getBytes("UTF-8"))
      assert(conn.getResponseCode == 200)
      val body = new String(conn.getInputStream.readAllBytes(), "UTF-8")
      assert(body.contains(""""row":[42]"""), body)
    } finally ep.stop()
  }

  test("HTTP tx/commit enforces basic auth when the session has a credential store") {
    val spark = org.apache.spark.sql.SparkSession.builder().getOrCreate()
    val dir = tmp()
    val store = new graft.auth.AuthStore(dir)
    store.setInitialPassword("secretpass")
    val session = new GraftSession(spark)
    session.authStore = Some(store)
    val ep = new graft.http.HttpEndpoint(session, 0)
    val port = ep.start()
    try {
      val base = s"http://127.0.0.1:$port"
      val stmt = """{"statements":[{"statement":"MATCH (n) RETURN count(n) AS c"}]}"""
      assert(httpPost(s"$base/db/neo4j/tx/commit", stmt)._1 == 401)
      assert(httpPost(s"$base/db/neo4j/tx/commit", stmt,
        Some(("neo4j", "wrong")))._1 == 401)
      // malformed base64 in the header is an auth FAILURE, not a 500
      val conn = new java.net.URL(s"$base/db/neo4j/tx/commit").openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST"); conn.setDoOutput(true)
      conn.setRequestProperty("Authorization", "Basic not-base64!!")
      conn.getOutputStream.write(stmt.getBytes("UTF-8"))
      assert(conn.getResponseCode == 401)
      val (code, body) = httpPost(s"$base/db/neo4j/tx/commit", stmt,
        Some(("neo4j", "secretpass")))
      assert(code == 200, body)
      assert(body.contains(""""row":[0]"""), body)
    } finally ep.stop()
  }
}
