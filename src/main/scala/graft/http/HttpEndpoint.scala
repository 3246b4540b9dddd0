package graft.http

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.GraftSession
import java.net.InetSocketAddress
import scala.jdk.CollectionConverters._

/** Minimal HTTP query surface mirroring the reference image's 7474
  * endpoint shapes (SURVEY §2.9 network parity; the reference maps
  * 7474 at `docker-image-src/calver/coredb/Dockerfile-trixie:54`):
  *
  *  - `POST /db/{db}/tx/commit` with
  *    `{"statements":[{"statement":"…","parameters":{…}}]}` executes
  *    the statements as ONE transaction (the engine's real
  *    BEGIN/COMMIT/ROLLBACK — an error rolls the whole request back)
  *    and answers `{"results":[{"columns":[…],"data":[{"row":[…]}…]}],
  *    "errors":[…]}` — the transactional-endpoint response shape the
  *    reference's own HTTP checks read (ref TestBasic.java exercises
  *    7474 via HttpWaitStrategy).
  *  - `GET /db/{db}/cluster/available` answers the readiness probe the
  *    reference tests poll (ref WaitStrategies.java:24-39): 200 when
  *    the database exists and is started, 404 otherwise.
  *
  * Built on the JDK's `com.sun.net.httpserver` plus the Jackson that
  * ships with Spark — no new dependencies. Requests are served on ONE
  * executor thread: the transactional endpoint drives the session's
  * single open-transaction slot, so serialization is correctness, not
  * a shortcut. The collect at the response boundary is the same
  * contract as a Bolt result stream — row volume is the client's
  * LIMIT responsibility, exactly as with the reference server.
  */
final class HttpEndpoint(session: GraftSession, port: Int = 7474,
    bindAddress: String = "0.0.0.0") {

  private val mapper = new ObjectMapper
  // 0.0.0.0 default: the reference server listens on all interfaces
  // inside the container so `-p 7474:7474` port mapping works; a
  // loopback-only listener would time out the host-side wait strategy
  private val server = HttpServer.create(new InetSocketAddress(bindAddress, port), 0)
  server.setExecutor(java.util.concurrent.Executors.newSingleThreadExecutor(r => {
    val t = new Thread(r, "graft-http"); t.setDaemon(true); t
  }))

  private val TxPath = "/db/([A-Za-z0-9_]+)/tx/commit".r
  private val AvailPath = "/db/([A-Za-z0-9_]+)/cluster/available".r

  server.createContext("/", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = try {
      (ex.getRequestMethod, ex.getRequestURI.getPath) match {
        case ("POST", TxPath(db))   => handleTx(ex, db)
        case ("GET", AvailPath(db)) => handleAvail(ex, db)
        // root discovery document — the reference server answers 200
        // on "/" (the default HttpWaitStrategy probe path) with
        // edition/version plus the transaction-endpoint template
        case ("GET", "/") =>
          val out = mapper.createObjectNode()
          out.put("transaction", "/db/{databaseName}/tx")
          out.put("neo4j_version", "5.26.0")
          out.put("neo4j_edition", "community")
          respond(ex, 200, mapper.writeValueAsString(out))
        case _ => respond(ex, 404, errorBody("Neo.ClientError.Request.Invalid",
          s"no such endpoint: ${ex.getRequestURI.getPath}"))
      }
    } catch {
      case e: Exception =>
        respond(ex, 500, errorBody("Neo.DatabaseError.General.UnknownError",
          String.valueOf(e.getMessage)))
    } finally ex.close()
  })

  /** Bind and serve; returns the bound port (pass port=0 for an
    * ephemeral test port). */
  def start(): Int = { server.start(); server.getAddress.getPort }

  def stop(): Unit = server.stop(0)

  // ----------------------------------------------------------------

  private def handleAvail(ex: HttpExchange, db: String): Unit =
    if (session.available(db)) respond(ex, 200, "\"available\"")
    else respond(ex, 404, errorBody("Neo.ClientError.Database.DatabaseNotFound",
      s"database $db is not available"))

  private def handleTx(ex: HttpExchange, db: String): Unit = {
    if (!authorized(ex)) {
      respond(ex, 401, errorBody("Neo.ClientError.Security.Unauthorized",
        "Invalid credential."))
      return
    }
    val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
    val statements = mapper.readTree(body).path("statements")
    val results = mapper.createArrayNode()
    val errors = mapper.createArrayNode()
    // hold the session's statement lock across the WHOLE transaction:
    // the session has one transaction slot, and without exclusion a
    // concurrent shell autocommit write would silently join this
    // transaction (and vanish on its ROLLBACK); the lock is reentrant,
    // so the nested cypher() calls below re-acquire it harmlessly
    session.stmtLock.lock()
    try {
      session.cypher("BEGIN", db)
      try {
        statements.elements().asScala.foreach { st =>
          val q = st.path("statement").asText("")
          val params = Option(st.get("parameters"))
            .map(fromJsonMap).getOrElse(Map.empty[String, Any])
          val df = session.cypher(q, params, db)
          val cols = df.columns
          val res: ObjectNode = results.addObject()
          val colArr = res.putArray("columns")
          cols.foreach(colArr.add)
          val data = res.putArray("data")
          df.collect().foreach { r =>
            val rowArr = data.addObject().putArray("row")
            cols.indices.foreach(i => addJson(rowArr, r.get(i)))
          }
        }
        session.cypher("COMMIT", db)
      } catch {
        case e: Exception =>
          session.cypher("ROLLBACK", db)
          val err = errors.addObject()
          err.put("code", e match {
            case _: IllegalArgumentException => "Neo.ClientError.Statement.SyntaxError"
            case _: UnsupportedOperationException => "Neo.ClientError.Statement.SyntaxError"
            case _ => "Neo.DatabaseError.General.UnknownError"
          })
          err.put("message", String.valueOf(e.getMessage))
      }
    } finally session.stmtLock.unlock()
    val out = mapper.createObjectNode()
    out.set[JsonNode]("results", results)
    out.set[JsonNode]("errors", errors)
    respond(ex, 200, mapper.writeValueAsString(out))
  }

  /** Basic auth against the session's credential store; open when auth
    * is disabled (NEO4J_AUTH=none), like the reference. */
  private def authorized(ex: HttpExchange): Boolean = session.authStore match {
    case None => true
    case Some(store) =>
      Option(ex.getRequestHeaders.getFirst("Authorization")).exists { h =>
        h.startsWith("Basic ") && {
          // malformed base64 is an auth FAILURE (401), not a server
          // error — clients retry credentials on 401, not on 500
          scala.util.Try(
            new String(java.util.Base64.getDecoder.decode(h.substring(6).trim), "UTF-8"))
            .toOption.exists(_.split(":", 2) match {
              case Array(u, p) => store.verify(u, p)
              case _           => false
            })
        }
      }
  }

  // ---- JSON <-> engine values ------------------------------------

  private def fromJsonMap(n: JsonNode): Map[String, Any] =
    n.properties().asScala.map(e => e.getKey -> fromJson(e.getValue)).toMap

  private def fromJson(n: JsonNode): Any =
    if (n.isNull) null
    else if (n.isIntegralNumber) n.asLong
    else if (n.isNumber) n.asDouble
    else if (n.isBoolean) n.asBoolean
    else if (n.isTextual) n.asText
    else if (n.isArray) n.elements().asScala.map(fromJson).toVector
    else fromJsonMap(n)

  private def addJson(arr: ArrayNode, v: Any): Unit = v match {
    case null                    => arr.addNull()
    case b: Boolean              => arr.add(b)
    case i: Int                  => arr.add(i.toLong)
    case l: Long                 => arr.add(l)
    case d: Double               => arr.add(d)
    case f: Float                => arr.add(f.toDouble)
    case s: String               => arr.add(s)
    case seq: scala.collection.Seq[_] =>
      val sub = arr.addArray(); seq.foreach(addJson(sub, _))
    case m: scala.collection.Map[_, _] =>
      val sub = arr.addObject()
      m.foreach { case (k, x) =>
        val holder = mapper.createArrayNode(); addJson(holder, x)
        sub.set[JsonNode](String.valueOf(k), holder.get(0))
      }
    case other                   => arr.add(String.valueOf(other))
  }

  private def errorBody(code: String, message: String): String = {
    val out = mapper.createObjectNode()
    out.putArray("results")
    val err = out.putArray("errors").addObject()
    err.put("code", code); err.put("message", message)
    mapper.writeValueAsString(out)
  }

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    val os = ex.getResponseBody
    os.write(bytes); os.close()
  }
}
