package graft.bolt

import graft.GraftSession
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal Bolt 7687 surface mirroring the reference image's second
  * mapped port (SURVEY §2.9; the reference maps 7473/7474/7687 at
  * `docker-image-src/calver/coredb/Dockerfile-trixie:54`, and its
  * tests open real driver sessions against it, ref
  * `src/test/java/com/neo4j/docker/utils/DatabaseIO.java:121-132`).
  *
  * Implements the AUTOCOMMIT subset of Bolt 4.4 from the published
  * protocol documentation (the openly specified handshake, chunked
  * message framing, and PackStream v1 serialization):
  *
  *  - handshake: `60:60:B0:17` magic + four version proposals; the
  *    server answers 4.4 when offered (range proposals honored),
  *    0.0.0.0 otherwise and closes;
  *  - `HELLO {scheme, principal, credentials, …}` → basic auth against
  *    the session's credential store (open when auth is disabled,
  *    like the reference image with NEO4J_AUTH=none);
  *  - `RUN {query, params, {db}}` / `PULL {n}` / `DISCARD {n}` →
  *    executes through `session.cypher` (the statement lock serializes
  *    with the shell and HTTP surfaces) and streams RECORDs;
  *  - `RESET` clears a FAILURE (rolling back any open explicit
  *    transaction, like the reference server); messages after a
  *    failure are IGNORED until then; `GOODBYE` closes;
  *  - `BEGIN {db}` / `COMMIT` / `ROLLBACK` → explicit transactions
  *    over the session's snapshot-pointer transaction slot. The
  *    statement lock is held from BEGIN to COMMIT/ROLLBACK (the
  *    session has ONE transaction slot; without exclusion a
  *    concurrent shell/HTTP autocommit write would silently join
  *    this transaction and vanish on its ROLLBACK). A transaction
  *    spans an unbounded number of network round-trips, so a stalled
  *    client could hold that lock hostage — the socket gets a read
  *    timeout while a transaction is open (`txIdleTimeoutMs`,
  *    default 30 s between messages); on timeout or disconnect the
  *    transaction rolls back and the lock is released.
  *
  * Values stream as PackStream scalars/lists/maps; engine rows carry
  * scalars, arrays and structs (never node/relationship objects), so
  * the temporal/spatial/graph Bolt structures are not needed —
  * timestamps, dates and decimals are emitted as their string forms.
  *
  * One connection is served at a time (same single-executor stance as
  * the HTTP endpoint): the engine's unit of concurrency is the Spark
  * job, not the wire listener, and request serialization at the
  * session boundary is correctness (one transaction slot), not a
  * shortcut.
  */
final class BoltEndpoint(session: GraftSession, port: Int = 7687,
    bindAddress: String = "0.0.0.0", txIdleTimeoutMs: Int = 30000) {

  private val server = new ServerSocket()
  server.bind(new InetSocketAddress(bindAddress, port))
  @volatile private var running = true

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        try serve(sock)
        catch { case _: Throwable => () }
        finally { try sock.close() catch { case _: Throwable => () } }
      } catch { case _: Throwable => () } // accept interrupted by stop()
    }
  }, "graft-bolt")
  acceptor.setDaemon(true)

  /** Bind and serve; returns the bound port (pass port=0 for an
    * ephemeral test port). */
  def start(): Int = { acceptor.start(); server.getLocalPort }

  def stop(): Unit = { running = false; try server.close() catch { case _: Throwable => () } }

  // ---- message tags (Bolt 4.4) -------------------------------------
  private val HELLO = 0x01; private val GOODBYE = 0x02; private val RESET = 0x0F
  private val RUN = 0x10; private val BEGIN = 0x11; private val COMMIT = 0x12
  private val ROLLBACK = 0x13; private val DISCARD = 0x2F; private val PULL = 0x3F
  private val SUCCESS = 0x70; private val RECORD = 0x71
  private val IGNORED = 0x7E; private val FAILURE = 0x7F

  private def serve(sock: Socket): Unit = {
    val in = new DataInputStream(sock.getInputStream)
    val out = new DataOutputStream(sock.getOutputStream)

    // handshake: magic + 4 proposals, each 4 bytes
    // (reserved/range/minor/major little-to-big per the spec's layout
    // [0, ranges, minor, major]); a 4.x proposal whose minor range
    // covers 4 wins
    if (in.readInt() != 0x6060B017) return
    val proposals = Seq.fill(4)(in.readInt())
    val ok = proposals.exists { p =>
      val major = p & 0xFF; val minor = (p >> 8) & 0xFF; val range = (p >> 16) & 0xFF
      major == 4 && minor >= 4 && minor - range <= 4
    }
    if (!ok) { out.writeInt(0); out.flush(); return }
    out.writeInt((4 << 8) | 4) // 0x00000404 = Bolt 4.4
    out.flush()

    var authed = false
    var failed = false
    // the RUN result pending PULL/DISCARD: (rows, already-streamed)
    var pending: Option[Iterator[Seq[Any]]] = None
    // the open explicit transaction's database; the statement lock is
    // held exactly while this is Some (see endTx/cleanup)
    var txDb: Option[String] = None

    def success(meta: Map[String, Any]): Unit = writeMessage(out, SUCCESS, Seq(meta))
    def failure(code: String, msg: String): Unit = {
      failed = true; pending = None
      writeMessage(out, FAILURE, Seq(Map("code" -> code, "message" -> msg)))
    }
    // close the open transaction (verb = COMMIT | ROLLBACK), always
    // releasing the lock and the in-transaction socket timeout
    def endTx(verb: String): Unit = txDb.foreach { db =>
      try session.cypher(verb, db)
      finally {
        txDb = None
        session.stmtLock.unlock()
        try sock.setSoTimeout(0) catch { case _: Throwable => () }
      }
    }

    def extraMap(fields: Seq[Any], i: Int): Map[String, Any] =
      fields.lift(i).collect { case m: Map[_, _] =>
        m.asInstanceOf[Map[String, Any]] }.getOrElse(Map.empty)
    def dbOf(extra: Map[String, Any]): String =
      extra.get("db").collect { case s: String if s.nonEmpty => s }.getOrElse("neo4j")

    try while (true) {
      val msg = readMessage(in).getOrElse(return)
      val (tag, fields) = msg
      if (tag == GOODBYE) return
      else if (tag == RESET) {
        // RESET rolls back any open transaction, then clears FAILURE
        try endTx("ROLLBACK") catch { case _: Exception => () }
        failed = false; pending = None; success(Map.empty)
      }
      else if (failed) writeMessage(out, IGNORED, Nil)
      else if (!authed) {
        if (tag != HELLO) { failure("Neo.ClientError.Request.Invalid", "expected HELLO"); return }
        val extra = fields.headOption.collect { case m: Map[_, _] =>
          m.asInstanceOf[Map[String, Any]] }.getOrElse(Map.empty)
        val okAuth = session.authStore match {
          case None => true
          case Some(store) =>
            extra.get("scheme").contains("basic") &&
              ((extra.get("principal"), extra.get("credentials")) match {
                case (Some(u: String), Some(p: String)) => store.verify(u, p)
                case _ => false
              })
        }
        if (okAuth) {
          authed = true
          success(Map("server" -> "Neo4j/5.26.0", "connection_id" -> "bolt-1"))
        } else {
          failure("Neo.ClientError.Security.Unauthorized",
            "The client is unauthorized due to authentication failure.")
          return // auth failures terminate the connection, per the spec
        }
      } else tag match {
        case RUN =>
          val query = fields.headOption.collect { case s: String => s }.getOrElse("")
          val params = fields.lift(1).collect { case m: Map[_, _] =>
            m.asInstanceOf[Map[String, Any]] }.getOrElse(Map.empty)
          // inside an explicit transaction the db was fixed by BEGIN
          val db = txDb.getOrElse(dbOf(extraMap(fields, 2)))
          try {
            val df = session.cypher(query, params, db)
            val cols = df.columns.toSeq
            pending = Some(df.collect().iterator.map(r =>
              cols.indices.map(i => r.get(i))))
            success(Map("fields" -> cols, "t_first" -> 0L))
          } catch {
            case e: Exception => failure(e match {
              case _: IllegalArgumentException | _: UnsupportedOperationException =>
                "Neo.ClientError.Statement.SyntaxError"
              case _ => "Neo.DatabaseError.General.UnknownError"
            }, String.valueOf(e.getMessage))
          }
        case PULL =>
          pending match {
            case None => failure("Neo.ClientError.Request.Invalid", "PULL with no open result")
            case Some(it) =>
              val n = fields.headOption.collect { case m: Map[_, _] =>
                m.asInstanceOf[Map[String, Any]] }.flatMap(_.get("n"))
                .collect { case l: Long => l }.getOrElse(-1L)
              var left = n
              while (it.hasNext && (n < 0 || left > 0)) {
                writeMessage(out, RECORD, Seq(it.next().toList))
                left -= 1
              }
              if (it.hasNext) success(Map("has_more" -> true))
              else { pending = None; success(Map("t_last" -> 0L)) }
          }
        case DISCARD =>
          pending = None; success(Map("t_last" -> 0L))
        case BEGIN =>
          if (txDb.isDefined)
            failure("Neo.ClientError.Request.Invalid",
              "there is already an open transaction on this connection")
          else {
            val db = dbOf(extraMap(fields, 0))
            session.stmtLock.lock()
            try {
              session.cypher("BEGIN", db)
              txDb = Some(db)
              try sock.setSoTimeout(txIdleTimeoutMs) catch { case _: Throwable => () }
              success(Map.empty)
            } catch {
              case e: Exception =>
                session.stmtLock.unlock()
                failure("Neo.DatabaseError.General.UnknownError", String.valueOf(e.getMessage))
            }
          }
        case COMMIT | ROLLBACK =>
          val verb = if (tag == COMMIT) "COMMIT" else "ROLLBACK"
          if (txDb.isEmpty)
            failure("Neo.ClientError.Request.Invalid", s"no open transaction to $verb")
          else try {
            endTx(verb)
            success(if (tag == COMMIT) Map("bookmark" -> "graft:bm-0") else Map.empty)
          } catch {
            case e: Exception =>
              failure("Neo.DatabaseError.General.UnknownError", String.valueOf(e.getMessage))
          }
        case _ =>
          failure("Neo.ClientError.Request.Invalid", s"unsupported message 0x${tag.toHexString}")
      }
      out.flush()
    } finally {
      // disconnect / read-timeout with a transaction still open: roll
      // back and release the lock so the other surfaces never block on
      // a vanished client
      try endTx("ROLLBACK") catch { case _: Throwable => () }
    }
  }

  // ---- chunked message framing -------------------------------------

  /** One message = chunks (u16 size + bytes) until a 0-size chunk. */
  private def readMessage(in: DataInputStream): Option[(Int, Seq[Any])] = try {
    val buf = new ByteArrayOutputStream()
    var size = in.readUnsignedShort()
    while (size == 0) size = in.readUnsignedShort() // skip keep-alive NOOP chunks
    while (size != 0) {
      val chunk = new Array[Byte](size)
      in.readFully(chunk)
      buf.write(chunk)
      size = in.readUnsignedShort()
    }
    val ps = new DataInputStream(new ByteArrayInputStream(buf.toByteArray))
    readValue(ps) match {
      case Struct(tag, fields) => Some((tag, fields))
      case _ => None
    }
  } catch { case _: EOFException => None }

  private def writeMessage(out: DataOutputStream, tag: Int, fields: Seq[Any]): Unit = {
    val body = new ByteArrayOutputStream()
    val ps = new DataOutputStream(body)
    writeStructHeader(ps, tag, fields.size)
    fields.foreach(writeValue(ps, _))
    val bytes = body.toByteArray
    var off = 0
    while (off < bytes.length) {
      val n = math.min(0xFFFF, bytes.length - off)
      out.writeShort(n); out.write(bytes, off, n); off += n
    }
    out.writeShort(0)
  }

  private def readValue(in: DataInputStream): Any = PackStream.readValue(in)
  private def writeValue(out: DataOutputStream, v: Any): Unit = PackStream.writeValue(out, v)
  private def writeStructHeader(out: DataOutputStream, tag: Int, size: Int): Unit =
    PackStream.writeStructHeader(out, tag, size)
  private type Struct = PackStream.Struct
  private val Struct = PackStream.Struct
}

/** PackStream v1 codec (subset: the types the engine emits), shared
  * with the test client. Implemented from the published PackStream
  * specification. */
private[graft] object PackStream {

  final case class Struct(tag: Int, fields: Seq[Any])

  def readValue(in: DataInputStream): Any = {
    val m = in.readUnsignedByte()
    if (m <= 0x7F) m.toLong                               // tiny positive int
    else if (m >= 0xF0) (m - 0x100).toLong                // tiny negative int
    else if (m >= 0x80 && m <= 0x8F) readStr(in, m - 0x80)
    else if (m >= 0x90 && m <= 0x9F) readList(in, m - 0x90)
    else if (m >= 0xA0 && m <= 0xAF) readMap(in, m - 0xA0)
    else if (m >= 0xB0 && m <= 0xBF) Struct(in.readUnsignedByte(), Seq.fill(m - 0xB0)(readValue(in)))
    else m match {
      case 0xC0 => null
      case 0xC1 => in.readDouble()
      case 0xC2 => false
      case 0xC3 => true
      case 0xC8 => in.readByte().toLong
      case 0xC9 => in.readShort().toLong
      case 0xCA => in.readInt().toLong
      case 0xCB => in.readLong()
      case 0xD0 => readStr(in, in.readUnsignedByte())
      case 0xD1 => readStr(in, in.readUnsignedShort())
      case 0xD2 => readStr(in, in.readInt())
      case 0xD4 => readList(in, in.readUnsignedByte())
      case 0xD5 => readList(in, in.readUnsignedShort())
      case 0xD6 => readList(in, in.readInt())
      case 0xD8 => readMap(in, in.readUnsignedByte())
      case 0xD9 => readMap(in, in.readUnsignedShort())
      case 0xDA => readMap(in, in.readInt())
      case other => throw new IllegalArgumentException(f"unsupported PackStream marker 0x$other%02X")
    }
  }

  def readStr(in: DataInputStream, n: Int): String = {
    val b = new Array[Byte](n); in.readFully(b); new String(b, UTF_8)
  }
  def readList(in: DataInputStream, n: Int): Seq[Any] =
    Seq.fill(n)(readValue(in))
  def readMap(in: DataInputStream, n: Int): Map[String, Any] =
    Seq.fill(n)((readValue(in).asInstanceOf[String], readValue(in))).toMap

  def writeStructHeader(out: DataOutputStream, tag: Int, size: Int): Unit = {
    out.writeByte(0xB0 + size); out.writeByte(tag)
  }

  def writeValue(out: DataOutputStream, v: Any): Unit = v match {
    case null          => out.writeByte(0xC0)
    case b: Boolean    => out.writeByte(if (b) 0xC3 else 0xC2)
    case i: Int        => writeValue(out, i.toLong)
    case i: Short      => writeValue(out, i.toLong)
    case i: Byte       => writeValue(out, i.toLong)
    case l: Long       =>
      if (l >= -16 && l <= 127) out.writeByte(l.toInt & 0xFF)
      else if (l >= Byte.MinValue && l <= Byte.MaxValue) { out.writeByte(0xC8); out.writeByte(l.toInt) }
      else if (l >= Short.MinValue && l <= Short.MaxValue) { out.writeByte(0xC9); out.writeShort(l.toInt) }
      else if (l >= Int.MinValue && l <= Int.MaxValue) { out.writeByte(0xCA); out.writeInt(l.toInt) }
      else { out.writeByte(0xCB); out.writeLong(l) }
    case f: Float      => out.writeByte(0xC1); out.writeDouble(f.toDouble)
    case d: Double     => out.writeByte(0xC1); out.writeDouble(d)
    case s: String     =>
      val b = s.getBytes(UTF_8)
      if (b.length <= 15) out.writeByte(0x80 + b.length)
      else if (b.length <= 0xFF) { out.writeByte(0xD0); out.writeByte(b.length) }
      else if (b.length <= 0xFFFF) { out.writeByte(0xD1); out.writeShort(b.length) }
      else { out.writeByte(0xD2); out.writeInt(b.length) }
      out.write(b)
    case seq: scala.collection.Seq[_] =>
      if (seq.size <= 15) out.writeByte(0x90 + seq.size)
      else if (seq.size <= 0xFF) { out.writeByte(0xD4); out.writeByte(seq.size) }
      else if (seq.size <= 0xFFFF) { out.writeByte(0xD5); out.writeShort(seq.size) }
      else { out.writeByte(0xD6); out.writeInt(seq.size) }
      seq.foreach(writeValue(out, _))
    case arr: Array[_] => writeValue(out, arr.toSeq)
    case m: scala.collection.Map[_, _] =>
      if (m.size <= 15) out.writeByte(0xA0 + m.size)
      else if (m.size <= 0xFF) { out.writeByte(0xD8); out.writeByte(m.size) }
      else if (m.size <= 0xFFFF) { out.writeByte(0xD9); out.writeShort(m.size) }
      else { out.writeByte(0xDA); out.writeInt(m.size) }
      m.foreach { case (k, x) => writeValue(out, String.valueOf(k)); writeValue(out, x) }
    case r: org.apache.spark.sql.Row => // struct column → map by field name
      val names = Option(r.schema).map(_.fieldNames)
        .getOrElse(Array.tabulate(r.length)(i => s"_$i"))
      writeValue(out, names.zipWithIndex.map { case (n, i) => n -> r.get(i) }.toMap)
    case other         => writeValue(out, String.valueOf(other)) // timestamps/dates/decimals
  }
}
