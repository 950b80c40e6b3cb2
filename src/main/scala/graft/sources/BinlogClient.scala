package graft.sources

import java.io.{DataInputStream, EOFException, InputStream, OutputStream}
import java.net.Socket
import java.security.MessageDigest

/** Minimal MySQL replica WIRE client — the network half the reference
  * runs in `get_binlog_stream(server_id, pos, filename)`
  * (reference/src/main.rs:222-228): connect, authenticate,
  * `COM_REGISTER_SLAVE`, then `COM_BINLOG_DUMP` from a
  * (filename, pos) resume pair and stream binlog events. Everything
  * here is the public client/server protocol: 4-byte packet framing
  * (3-byte LE length + sequence id), the v10 initial handshake,
  * HandshakeResponse41, and the dump command layouts.
  *
  * Both production auth plugins are spoken:
  *  - `mysql_native_password` — scramble
  *    `SHA1(pwd) XOR SHA1(salt ++ SHA1(SHA1(pwd)))`;
  *  - `caching_sha2_password` (the MySQL 8.0+ DEFAULT; 8.4 disables
  *    native password) — fast path scramble
  *    `SHA256(pwd) XOR SHA256(SHA256(SHA256(pwd)) ++ nonce)`, and
  *    when the server's cache misses (AuthMoreData 0x04 "perform
  *    full authentication") the insecure-channel full-auth exchange:
  *    request the server's RSA public key (0x02), receive the PEM
  *    SubjectPublicKeyInfo, send `RSA-OAEP(pwd ++ NUL XOR nonce)`.
  *  - `AuthSwitchRequest` (0xfe) in EITHER direction: the client
  *    re-scrambles with the requested plugin over the fresh salt.
  *
  * The streamed events are byte-identical to binlog FILE events (each
  * dump packet is `0x00` + one event), so decode is delegated
  * unchanged to [[Binlog.decodeFile]] by re-framing the stream as
  * `magic ++ events`; resume positions are rebased by `startPos - 4`
  * so a socket-resumed change reports the SAME binlog position a
  * file decode of the full segment would. The dump is issued
  * NON_BLOCK (the server sends EOF at log end instead of parking the
  * connection) — the batch shape of [[ChangeLogSource]]'s
  * micro-batches: each poll drains the available suffix, the
  * (filename, pos) checkpoint carries the continuation.
  *
  * TLS (round 12): pass `tlsTrustPem` to upgrade via SSLRequest —
  * the 32-byte capability prefix in the clear, then the JSSE
  * handshake on the same socket, then the full HandshakeResponse41
  * inside the tunnel. Trust is PINNED to the given PEM certificate
  * (no trust-all hole, no system-CA dependence). Over TLS the
  * caching_sha2 full-auth step sends the NUL-terminated cleartext
  * password through the tunnel (the real client behavior — the RSA
  * exchange exists only for insecure channels). No compression —
  * irrelevant to correctness; spec'd against a scripted master
  * fixture (`BinlogMasterFixture`) that verifies the client's
  * scramble bytes — and decrypts the full-auth RSA blob — with its
  * own independent compositions before serving.
  */
object BinlogClient {

  // command bytes (public protocol)
  val ComRegisterSlave = 0x15
  val ComBinlogDump = 0x12
  val ComBinlogDumpGtid = 0x1e
  val BinlogDumpNonBlock = 0x01
  val BinlogThroughGtid = 0x04

  // capability flags the client advertises
  val ClientLongPassword = 0x00000001L
  val ClientProtocol41 = 0x00000200L
  val ClientSsl = 0x00000800L
  val ClientSecureConnection = 0x00008000L
  val ClientPluginAuth = 0x00080000L

  final case class Handshake(serverVersion: String, threadId: Long,
      salt: Array[Byte], authPlugin: String)

  final class ProtocolException(msg: String) extends RuntimeException(msg)

  // ------------------------------------------------------ packet framing

  /** Read one framed packet: 3-byte LE length + 1-byte sequence id. */
  private[sources] def readPacket(in: DataInputStream): (Int, Array[Byte]) = {
    val h = new Array[Byte](4)
    in.readFully(h)
    val len = (h(0) & 0xff) | ((h(1) & 0xff) << 8) | ((h(2) & 0xff) << 16)
    val body = new Array[Byte](len)
    in.readFully(body)
    ((h(3) & 0xff), body)
  }

  private[sources] def writePacket(out: OutputStream, seq: Int,
      body: Array[Byte]): Unit = {
    out.write(body.length & 0xff)
    out.write((body.length >> 8) & 0xff)
    out.write((body.length >> 16) & 0xff)
    out.write(seq & 0xff)
    out.write(body)
    out.flush()
  }

  private def err(body: Array[Byte]): Nothing = {
    // ERR packet: 0xff, code u16, '#' + 5-byte sql state, message
    val code = (body(1) & 0xff) | ((body(2) & 0xff) << 8)
    val msg = new String(body.drop(if (body.length > 3 && body(3) == '#') 9 else 3),
      "UTF-8")
    throw new ProtocolException(s"server ERR $code: $msg")
  }

  private def expectOk(in: DataInputStream, what: String): Unit = {
    val (_, body) = readPacket(in)
    (body(0) & 0xff) match {
      case 0x00 => ()
      case 0xff => err(body)
      case b => throw new ProtocolException(f"unexpected 0x$b%02x after $what")
    }
  }

  // --------------------------------------------------------- handshake

  private[sources] def parseHandshake(body: Array[Byte]): Handshake = {
    if ((body(0) & 0xff) == 0xff) err(body)
    val proto = body(0) & 0xff
    if (proto != 10)
      throw new ProtocolException(s"unsupported handshake protocol $proto")
    var p = 1
    val vEnd = body.indexOf(0.toByte, p)
    val version = new String(body.slice(p, vEnd), "UTF-8"); p = vEnd + 1
    def u16(): Int = { val v = (body(p) & 0xff) | ((body(p + 1) & 0xff) << 8); p += 2; v }
    def u32(): Long = { u16().toLong | (u16().toLong << 16) }
    val threadId = u32()
    val salt1 = body.slice(p, p + 8); p += 9 // 8 auth bytes + 0x00 filler
    u16() // capability flags (lower)
    p += 1 // charset
    u16() // status flags
    u16() // capability flags (upper)
    val authLen = body(p) & 0xff; p += 1
    p += 10 // reserved
    // part-2 is max(13, authLen - 8) bytes INCLUDING a trailing NUL
    val part2Len = math.max(13, authLen - 8) - 1
    val salt2 = body.slice(p, p + part2Len); p += part2Len + 1
    val pEnd = body.indexOf(0.toByte, p)
    val plugin = new String(body.slice(p, if (pEnd < 0) body.length else pEnd),
      "UTF-8")
    // the native-password scramble uses exactly 20 salt bytes
    Handshake(version, threadId, (salt1 ++ salt2).take(20), plugin)
  }

  /** `mysql_native_password`: SHA1(pwd) XOR SHA1(salt ++ SHA1(SHA1(pwd))). */
  def nativePasswordScramble(password: String,
      salt: Array[Byte]): Array[Byte] = {
    if (password.isEmpty) return Array.emptyByteArray
    val sha1 = MessageDigest.getInstance("SHA-1")
    val p1 = sha1.digest(password.getBytes("UTF-8"))
    val p2 = sha1.digest(p1)
    sha1.update(salt)
    val p3 = sha1.digest(p2)
    p1.zip(p3).map { case (a, b) => (a ^ b).toByte }
  }

  /** `caching_sha2_password` fast path:
    * SHA256(pwd) XOR SHA256(SHA256(SHA256(pwd)) ++ nonce) — 32 bytes.
    */
  def sha2PasswordScramble(password: String,
      nonce: Array[Byte]): Array[Byte] = {
    if (password.isEmpty) return Array.emptyByteArray
    val sha = MessageDigest.getInstance("SHA-256")
    val p1 = sha.digest(password.getBytes("UTF-8"))
    val p2 = sha.digest(p1)
    sha.update(p2 ++ nonce)
    val p3 = sha.digest()
    p1.zip(p3).map { case (a, b) => (a ^ b).toByte }
  }

  /** Dispatch on the auth plugin the SERVER asked for; anything
    * outside the two production plugins refuses loudly (never a
    * silent wrong-scramble retry loop).
    */
  private[sources] def scrambleFor(plugin: String, password: String,
      salt: Array[Byte]): Array[Byte] = plugin match {
    case "" | "mysql_native_password" => nativePasswordScramble(password, salt)
    case "caching_sha2_password" => sha2PasswordScramble(password, salt)
    case p => throw new ProtocolException(s"unsupported auth plugin $p")
  }

  /** Full-auth password blob for an insecure channel: the server's
    * PEM RSA public key encrypts `XOR(pwd ++ NUL, nonce repeated)`
    * with OAEP (MySQL's RSA_PKCS1_OAEP_PADDING = SHA-1 OAEP/MGF1) —
    * the cleartext password never crosses the wire.
    */
  private[sources] def rsaEncryptPassword(password: String,
      nonce: Array[Byte], pem: String): Array[Byte] = {
    val der = java.util.Base64.getMimeDecoder.decode(
      pem.replaceAll("-----[A-Z ]+-----", "").trim)
    val key = java.security.KeyFactory.getInstance("RSA")
      .generatePublic(new java.security.spec.X509EncodedKeySpec(der))
    val pw = password.getBytes("UTF-8") :+ 0.toByte
    val xored = pw.zipWithIndex.map { case (b, i) =>
      (b ^ nonce(i % nonce.length)).toByte
    }
    val c = javax.crypto.Cipher.getInstance(
      "RSA/ECB/OAEPWithSHA-1AndMGF1Padding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE, key)
    c.doFinal(xored)
  }

  private def baseCaps(withSsl: Boolean): Long =
    ClientLongPassword | ClientProtocol41 | ClientSecureConnection |
      ClientPluginAuth | (if (withSsl) ClientSsl else 0L)

  private def handshakeResponse(user: String, password: String,
      salt: Array[Byte], plugin: String,
      withSsl: Boolean = false): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = b.write(v & 0xff)
    def u32(v: Long): Unit = (0 until 4).foreach(i => u8((v >> (8 * i)).toInt))
    u32(baseCaps(withSsl))
    u32(1L << 24) // max packet size
    u8(33) // charset: utf8_general_ci
    (0 until 23).foreach(_ => u8(0)) // reserved
    b.write(user.getBytes("UTF-8")); u8(0)
    val token = scrambleFor(plugin, password, salt)
    u8(token.length); b.write(token) // 1-byte-length auth response
    val named = if (plugin.isEmpty) "mysql_native_password" else plugin
    b.write(named.getBytes("UTF-8")); u8(0)
    b.toByteArray
  }

  /** SSLRequest: the 32-byte HandshakeResponse41 PREFIX (caps with
    * CLIENT_SSL, max packet, charset, 23 reserved) sent in the clear;
    * the TLS handshake follows on the same socket and the full
    * response travels inside the tunnel.
    */
  private def sslRequest: Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = b.write(v & 0xff)
    def u32(v: Long): Unit = (0 until 4).foreach(i => u8((v >> (8 * i)).toInt))
    u32(baseCaps(withSsl = true))
    u32(1L << 24)
    u8(33)
    (0 until 23).foreach(_ => u8(0))
    b.toByteArray
  }

  /** Upgrade the socket to TLS, trusting EXACTLY the given PEM
    * certificate (pinning — no trust-all hole, no system CA
    * dependence: the deployment hands the client its master's cert).
    */
  private def tlsUpgrade(socket: Socket, host: String, port: Int,
      trustPem: String): javax.net.ssl.SSLSocket = {
    val cf = java.security.cert.CertificateFactory.getInstance("X.509")
    val cert = cf.generateCertificate(
      new java.io.ByteArrayInputStream(trustPem.getBytes("UTF-8")))
    val ks = java.security.KeyStore.getInstance(
      java.security.KeyStore.getDefaultType)
    ks.load(null, null)
    ks.setCertificateEntry("binlog-master", cert)
    val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
      javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ks)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(null, tmf.getTrustManagers, null)
    val ssl = ctx.getSocketFactory.createSocket(socket, host, port, false)
      .asInstanceOf[javax.net.ssl.SSLSocket]
    ssl.setUseClientMode(true)
    ssl.startHandshake()
    ssl
  }

  /** Drive the post-HandshakeResponse auth negotiation to OK/ERR:
    * fast-auth success (AuthMoreData 0x03) falls through to the OK;
    * perform-full-authentication (0x04) runs the RSA key fetch +
    * encrypted-password send; AuthSwitchRequest (0xfe) re-scrambles
    * with the requested plugin over the fresh salt — in EITHER
    * direction between the two production plugins.
    */
  private[sources] def authenticate(in: DataInputStream, out: OutputStream,
      password: String, firstSalt: Array[Byte],
      overTls: Boolean = false): Unit = {
    var salt = firstSalt
    var done = false
    while (!done) {
      val (seq, body) = readPacket(in)
      (body(0) & 0xff) match {
        case 0x00 => done = true
        case 0xff => err(body)
        case 0x01 => // AuthMoreData
          val data = body.drop(1)
          if (data.length == 1 && data(0) == 0x03) {
            () // fast-auth success: the real OK follows
          } else if (data.length == 1 && data(0) == 0x04 && overTls) {
            // full authentication over TLS: the channel is the
            // protection — send the NUL-terminated cleartext password
            // inside the tunnel (what a real client does; the RSA
            // step exists only for insecure channels)
            writePacket(out, seq + 1,
              password.getBytes("UTF-8") :+ 0.toByte)
          } else if (data.length == 1 && data(0) == 0x04) {
            // full authentication over an insecure channel: fetch the
            // server's RSA public key, send the encrypted password
            writePacket(out, seq + 1, Array[Byte](0x02))
            val (seq2, keyBody) = readPacket(in)
            if ((keyBody(0) & 0xff) == 0xff) err(keyBody)
            if ((keyBody(0) & 0xff) != 0x01)
              throw new ProtocolException(
                f"unexpected 0x${keyBody(0) & 0xff}%02x awaiting RSA key")
            val pem = new String(keyBody.drop(1), "UTF-8")
            writePacket(out, seq2 + 1, rsaEncryptPassword(password, salt, pem))
          } else {
            throw new ProtocolException(
              s"unexpected AuthMoreData payload (${data.length} bytes)")
          }
        case 0xfe => // AuthSwitchRequest: plugin NUL salt
          val pEnd = body.indexOf(0.toByte, 1)
          if (pEnd < 0)
            throw new ProtocolException("malformed AuthSwitchRequest")
          val plugin = new String(body.slice(1, pEnd), "UTF-8")
          salt = body.slice(pEnd + 1, pEnd + 21) // 20 bytes, NUL excluded
          writePacket(out, seq + 1, scrambleFor(plugin, password, salt))
        case b =>
          throw new ProtocolException(f"unexpected 0x$b%02x during auth")
      }
    }
  }

  // ----------------------------------------------------------- commands

  private def registerSlave(serverId: Long): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = b.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    def u32(v: Long): Unit = (0 until 4).foreach(i => u8((v >> (8 * i)).toInt))
    u8(ComRegisterSlave); u32(serverId)
    u8(0); u8(0); u8(0) // empty hostname / user / password (1-byte lens)
    u16(0); u32(0); u32(0) // port, replication rank, master_id
    b.toByteArray
  }

  private def binlogDump(serverId: Long, filename: String,
      pos: Long): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = b.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    def u32(v: Long): Unit = (0 until 4).foreach(i => u8((v >> (8 * i)).toInt))
    u8(ComBinlogDump); u32(pos); u16(BinlogDumpNonBlock); u32(serverId)
    b.write(filename.getBytes("UTF-8"))
    b.toByteArray
  }

  // ---------------------------------------------------------------- GTID

  /** An executed-GTID set: 32-hex-char source id → INCLUSIVE
    * (first, last) gno intervals. [[encode]] is the
    * COM_BINLOG_DUMP_GTID wire form (n_sids u64; per sid 16 raw
    * bytes + n_intervals u64 + per interval start u64, end u64 with
    * the wire's end EXCLUSIVE — the +1 happens here, callers think
    * in inclusive gnos).
    */
  final case class GtidSet(intervals: Map[String, Seq[(Long, Long)]]) {
    def encode: Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      def u64(v: Long): Unit =
        (0 until 8).foreach(i => b.write(((v >> (8 * i)) & 0xff).toInt))
      u64(intervals.size.toLong)
      intervals.toSeq.sortBy(_._1).foreach { case (sidHex, ivs) =>
        require(sidHex.length == 32, s"sid must be 32 hex chars: $sidHex")
        b.write(sidHex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
        u64(ivs.size.toLong)
        ivs.foreach { case (first, last) => u64(first); u64(last + 1) }
      }
      b.toByteArray
    }
  }
  object GtidSet { val empty: GtidSet = GtidSet(Map.empty) }

  /** GTID events seen in a drained dump — `(sid hex, gno)` in stream
    * order: what a caller unions into its executed set to build the
    * NEXT [[fetchGtid]] resume argument. (GTID_LOG_EVENT payload:
    * flags u8, sid 16 bytes, gno u64 LE; later 5.7+ fields follow and
    * are ignored.)
    */
  def gtidsOf(events: IndexedSeq[Array[Byte]]): Seq[(String, Long)] =
    events.filter(e => e.length >= 19 + 25 && (e(4) & 0xff) == Binlog.GtidEvent)
      .map { e =>
        val sid = e.slice(20, 36).map(b => f"${b & 0xff}%02x").mkString
        val gno = (0 until 8).map(i => (e(36 + i) & 0xffL) << (8 * i)).sum
        (sid, gno)
      }.toSeq

  /** COM_BINLOG_DUMP_GTID, auto-position: empty filename + pos 4 +
    * the encoded executed set — the server decides where to start
    * and skips transactions the set already covers.
    */
  private def binlogDumpGtid(serverId: Long, gtids: GtidSet): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = b.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    def u32(v: Long): Unit = (0 until 4).foreach(i => u8((v >> (8 * i)).toInt))
    def u64(v: Long): Unit = (0 until 8).foreach(i => u8((v >> (8 * i)).toInt))
    u8(ComBinlogDumpGtid)
    u16(BinlogDumpNonBlock | BinlogThroughGtid)
    u32(serverId)
    u32(0L) // filename length (auto-position: empty)
    u64(4L) // position
    val data = gtids.encode
    u32(data.length.toLong)
    b.write(data)
    b.toByteArray
  }

  // --------------------------------------------------------------- dump

  /** One drained dump: the raw wire events (verbatim packet bodies,
    * virtual log_pos-0 preamble events excluded), the decoded
    * changes/rotate, and the resume position — the last real event's
    * `next_position`, i.e. the master-stamped continuation offset
    * (== `startPos` when the suffix was empty).
    */
  final case class Fetched(events: IndexedSeq[Array[Byte]],
      decoded: Binlog.Decoded, endPos: Long)

  /** Connect, authenticate, register as a replica, and drain the
    * binlog from `(filename, startPos)` to the server's current end
    * (NON_BLOCK). Returns the decoded changes with TRUE file offsets
    * (a socket resume from pos P reports the same `pos` values a file
    * decode of the whole segment reports from P on) plus any trailing
    * rotate — i.e. exactly what [[Binlog.decodeFile]] yields, arrived
    * over the wire instead.
    */
  def dump(host: String, port: Int, user: String, password: String,
      serverId: Long, filename: String, startPos: Long,
      tlsTrustPem: Option[String] = None): Binlog.Decoded =
    fetch(host, port, user, password, serverId, filename, startPos,
      tlsTrustPem).decoded

  /** [[dump]] plus the raw bytes and resume offset — what
    * [[ChangeLog.syncFromMaster]] mirrors into local `.binlog`
    * segments (the wire events are byte-identical to file events, so
    * the mirrored segment is byte-equal to the master's file suffix).
    */
  def fetch(host: String, port: Int, user: String, password: String,
      serverId: Long, filename: String, startPos: Long,
      tlsTrustPem: Option[String] = None): Fetched =
    replicaSession(host, port, user, password, serverId,
        tlsTrustPem) { (in, out) =>
      writePacket(out, 0, binlogDump(serverId, filename, startPos))
      drainDump(in, startPos)
    }

  /** [[fetch]]'s GTID twin: COM_BINLOG_DUMP_GTID with an
    * executed-GTID set instead of a (filename, pos) pair — the resume
    * mode real MySQL 8 deployments run (the reference carries it
    * commented out, reference/src/main.rs:225). The server skips
    * every transaction `executed` covers; [[gtidsOf]] over the
    * returned events builds the next call's set. The mirror ingest
    * ([[ChangeLog.syncFromMaster]]) stays position-based on purpose —
    * byte-mirroring needs file offsets, which auto-position
    * deliberately abstracts away.
    */
  def fetchGtid(host: String, port: Int, user: String, password: String,
      serverId: Long, executed: GtidSet,
      tlsTrustPem: Option[String] = None): Fetched =
    replicaSession(host, port, user, password, serverId,
        tlsTrustPem) { (in, out) =>
      writePacket(out, 0, binlogDumpGtid(serverId, executed))
      drainDump(in, 4L)
    }

  /** Connect, authenticate, REGISTER_SLAVE, then hand the framed
    * streams to the dump command — the shared session prelude of
    * [[fetch]] and [[fetchGtid]].
    */
  private def replicaSession[A](host: String, port: Int, user: String,
      password: String, serverId: Long,
      tlsTrustPem: Option[String] = None)(
      f: (DataInputStream, OutputStream) => A): A = {
    val socket = new Socket(host, port)
    try {
      var in = new DataInputStream(socket.getInputStream)
      var out: OutputStream = socket.getOutputStream
      val (seq0, hello) = readPacket(in)
      val hs = parseHandshake(hello)
      var seq = seq0 + 1
      tlsTrustPem.foreach { pem =>
        writePacket(out, seq, sslRequest); seq += 1
        val ssl = tlsUpgrade(socket, host, port, pem)
        in = new DataInputStream(ssl.getInputStream)
        out = ssl.getOutputStream
      }
      writePacket(out, seq, handshakeResponse(user, password, hs.salt,
        hs.authPlugin, withSsl = tlsTrustPem.nonEmpty))
      authenticate(in, out, password, hs.salt,
        overTls = tlsTrustPem.nonEmpty)
      writePacket(out, 0, registerSlave(serverId))
      expectOk(in, "COM_REGISTER_SLAVE")
      f(in, out)
    } finally socket.close()
  }

  private def drainDump(in: DataInputStream, startPos: Long): Fetched = {
    val events = IndexedSeq.newBuilder[Array[Byte]]
    var done = false
    while (!done) {
      val (_, body) = readPacket(in)
      (body(0) & 0xff) match {
        case 0x00 => events += body.drop(1) // one binlog event
        case 0xfe if body.length < 9 => done = true // EOF
        case 0xff => err(body)
        case b => throw new ProtocolException(f"unexpected 0x$b%02x in dump")
      }
    }
    val all = events.result()
    // virtual preamble events (the server re-sends the format
    // description with log_pos 0 at the head of every dump) carry
    // no file position and must not reach the mirror's byte-append
    def logPos(e: Array[Byte]): Long =
      (e(13) & 0xffL) | ((e(14) & 0xffL) << 8) |
        ((e(15) & 0xffL) << 16) | ((e(16) & 0xffL) << 24)
    val real = all.filter(e => e.length >= 19 && logPos(e) != 0L)
    Fetched(real, decodeStream(all),
      real.lastOption.map(logPos).getOrElse(startPos))
  }

  /** Re-frame streamed events as a binlog file, decode through the
    * unchanged [[Binlog.decodeFile]], then remap each change's
    * buffer-local offset to its TRUE segment offset recovered from
    * the event's own v4 header: `next_position − event_size` (the
    * master stamps next_position with the real end offset; a virtual
    * preamble event with log_pos 0 simply never yields a change, so
    * it can't poison the map).
    */
  private[sources] def decodeStream(
      events: IndexedSeq[Array[Byte]]): Binlog.Decoded = {
    val buf = new java.io.ByteArrayOutputStream()
    buf.write(Binlog.Magic)
    val truePos = Map.newBuilder[Long, Long]
    var local = 4L
    events.foreach { e =>
      require(e.length >= 19, s"short event (${e.length} bytes)")
      def u32(off: Int): Long =
        (e(off) & 0xffL) | ((e(off + 1) & 0xffL) << 8) |
          ((e(off + 2) & 0xffL) << 16) | ((e(off + 3) & 0xffL) << 24)
      truePos += local -> (u32(13) - u32(9)) // next_position - event_size
      buf.write(e)
      local += e.length
    }
    val map = truePos.result()
    val d = Binlog.decodeFile(buf.toByteArray)
    Binlog.Decoded(
      d.changes.map(c => c.copy(pos = map.getOrElse(c.pos, c.pos))), d.rotate)
  }
}
