package graft

import java.io.{DataInputStream, OutputStream}
import java.net.{InetAddress, ServerSocket, SocketException}

/** Scripted MySQL MASTER fixture — the server half of the replica
  * wire protocol [[graft.sources.BinlogClient]] speaks, so the
  * client's handshake parsing, auth scrambles,
  * REGISTER_SLAVE/BINLOG_DUMP layouts and dump-stream draining are
  * exercised against a real socket, byte-for-byte. The fixture:
  *
  *  - serves HandshakeV10 with a FIXED 20-byte salt (split 8 + 12+NUL
  *    across the two auth-data parts, exactly the server layout),
  *    advertising `authPlugin` (`mysql_native_password` default, or
  *    `caching_sha2_password` — the stock MySQL 8 configuration);
  *  - parses HandshakeResponse41 and verifies the client's scramble
  *    against its OWN independently-written composition —
  *    `SHA1(pwd) XOR SHA1(salt ++ SHA1(SHA1(pwd)))` for native,
  *    `SHA256(pwd) XOR SHA256(SHA256(SHA256(pwd)) ++ salt)` for
  *    caching_sha2 — a wrong password (or a wrong client
  *    composition) gets the real ERR 1045 packet;
  *  - for caching_sha2 with `sha2Cached = false` scripts the FULL
  *    authentication exchange a cache-miss triggers on a real
  *    server: AuthMoreData 0x04, the client's 0x02 public-key
  *    request, a PEM RSA key, then RSA-OAEP decrypt + nonce-unXOR of
  *    the client's blob and a cleartext compare;
  *  - with `switchTo` set, answers the handshake response with an
  *    AuthSwitchRequest (0xfe + plugin + fresh salt) and verifies
  *    the client's re-scramble under the SWITCHED plugin/salt;
  *  - accepts COM_REGISTER_SLAVE (recording the server id) and
  *    COM_BINLOG_DUMP (recording the (filename, pos) resume pair);
  *  - streams the requested segment's events from byte offset `pos`
  *    as dump packets (`0x00` + event), preceded by the virtual
  *    format-description preamble with log_pos ZEROED (what a real
  *    master sends at the head of every dump), then the 5-byte EOF
  *    packet (NON_BLOCK semantics: EOF at log end, no parking).
  *
  * Framing and parsing here are written independently of the client
  * (own byte helpers) — the spec is client bytes vs server bytes,
  * not one implementation vs itself.
  */
final class BinlogMasterFixture(password: String,
    @volatile var segments: Map[String, Array[Byte]],
    authPlugin: String = "mysql_native_password",
    sha2Cached: Boolean = true,
    switchTo: Option[String] = None,
    tls: Boolean = false) extends AutoCloseable {

  /** Fixed handshake salt (20 bytes, deterministic). */
  val salt: Array[Byte] = Array.tabulate[Byte](20)(i => (i * 7 + 3).toByte)

  /** Fresh salt served inside an AuthSwitchRequest (distinct from the
    * handshake salt so a client that re-uses the old one fails).
    */
  val switchSalt: Array[Byte] = Array.tabulate[Byte](20)(i => (i * 5 + 11).toByte)

  /** Per-fixture RSA keypair for the caching_sha2 full-auth step. */
  private val rsa: java.security.KeyPair = {
    val g = java.security.KeyPairGenerator.getInstance("RSA")
    g.initialize(2048)
    g.generateKeyPair()
  }

  /** PEM SubjectPublicKeyInfo — exactly what a real server sends. */
  def publicKeyPem: String =
    "-----BEGIN PUBLIC KEY-----\n" +
      java.util.Base64.getMimeEncoder(64, "\n".getBytes)
        .encodeToString(rsa.getPublic.getEncoded) +
      "\n-----END PUBLIC KEY-----\n"

  /** TLS identity, minted by the JDK's own keytool (a real PKCS12
    * keystore with a self-signed RSA cert, like a default MySQL
    * install's auto-generated server certs). Only built when
    * `tls = true`.
    */
  private lazy val tlsContext: javax.net.ssl.SSLContext = {
    val dir = java.nio.file.Files.createTempDirectory("binlog_tls")
    val ksPath = dir.resolve("ks.p12").toString
    val pr = new ProcessBuilder("keytool", "-genkeypair", "-alias",
      "master", "-keyalg", "RSA", "-keysize", "2048", "-storetype",
      "PKCS12", "-keystore", ksPath, "-storepass", "changeit", "-dname",
      "CN=binlog-master-fixture", "-validity", "1")
      .redirectErrorStream(true).start()
    require(pr.waitFor() == 0, "keytool keypair generation failed")
    val ks = java.security.KeyStore.getInstance("PKCS12")
    val fis = new java.io.FileInputStream(ksPath)
    try ks.load(fis, "changeit".toCharArray) finally fis.close()
    tlsCert = Some(ks.getCertificate("master"))
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, "changeit".toCharArray)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }
  @volatile private var tlsCert: Option[java.security.cert.Certificate] = None

  /** The server certificate PEM — what a deployment hands the client
    * to PIN (forces tlsContext init on first call).
    */
  def certPem: String = {
    tlsContext
    "-----BEGIN CERTIFICATE-----\n" +
      java.util.Base64.getMimeEncoder(64, "\n".getBytes)
        .encodeToString(tlsCert.get.getEncoded) +
      "\n-----END CERTIFICATE-----\n"
  }

  // observability for the spec
  @volatile var lastAuth: Array[Byte] = Array.emptyByteArray
  @volatile var lastUser: String = ""
  @volatile var lastClientPlugin: String = ""
  @volatile var lastEncryptedBlob: Array[Byte] = Array.emptyByteArray
  @volatile var fullAuthExchanges: Int = 0
  @volatile var lastFullAuthMode: String = ""
  @volatile var sslUpgrades: Int = 0
  val registeredServerIds = new java.util.concurrent.ConcurrentLinkedQueue[Long]
  val dumps = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]
  /** GTID dumps seen: (flags, executed set as sidHex -> inclusive
    * (first, last) intervals) — parsed INDEPENDENTLY of the client's
    * encoder.
    */
  val gtidDumps = new java.util.concurrent.ConcurrentLinkedQueue[
    (Int, Map[String, Seq[(Long, Long)]])]

  private val server =
    new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
  def port: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    try while (true) {
      val s = server.accept()
      try serve(s)
      catch { case _: Exception => () } // one bad session ≠ dead master
      finally s.close()
    } catch { case _: SocketException => () } // closed
  }, "binlog-master-fixture")
  acceptor.setDaemon(true)
  acceptor.start()

  override def close(): Unit = server.close()

  // ------------------------------------------------------------ bytes

  private def u16le(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  private def readPacket(in: DataInputStream): Array[Byte] = {
    val h = new Array[Byte](4)
    in.readFully(h)
    val len = (h(0) & 0xff) | ((h(1) & 0xff) << 8) | ((h(2) & 0xff) << 16)
    val body = new Array[Byte](len)
    in.readFully(body)
    body
  }

  private def writePacket(out: OutputStream, seq: Int,
      body: Array[Byte]): Unit = {
    out.write(body.length & 0xff)
    out.write((body.length >> 8) & 0xff)
    out.write((body.length >> 16) & 0xff)
    out.write(seq & 0xff)
    out.write(body)
    out.flush()
  }

  private def okPacket: Array[Byte] =
    Array[Byte](0x00, 0x00, 0x00, 0x02, 0x00, 0x00, 0x00)

  private def errPacket(code: Int, state: String, msg: String): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    b.write(0xff); b.write(code & 0xff); b.write((code >> 8) & 0xff)
    b.write('#'); b.write(state.getBytes("UTF-8").take(5))
    b.write(msg.getBytes("UTF-8"))
    b.toByteArray
  }

  private def eofPacket: Array[Byte] =
    Array[Byte](0xfe.toByte, 0x00, 0x00, 0x02, 0x00)

  // -------------------------------------------------------- handshake

  private def handshakeV10: Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = b.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    def u32(v: Long): Unit = (0 until 4).foreach(i => u8((v >> (8 * i)).toInt))
    u8(10) // protocol version
    b.write("8.0.99-graft-master".getBytes("UTF-8")); u8(0)
    u32(42L) // thread id
    b.write(salt, 0, 8); u8(0) // auth-plugin-data-part-1 + filler
    u16(0xffff) // capability flags (lower)
    u8(33) // charset utf8_general_ci
    u16(0x0002) // status: autocommit
    u16(0x0008) // capability flags (upper): CLIENT_PLUGIN_AUTH
    u8(21) // auth plugin data len: 20 salt + trailing NUL
    (0 until 10).foreach(_ => u8(0)) // reserved
    b.write(salt, 8, 12); u8(0) // part-2: max(13, 21-8) incl. NUL
    b.write(authPlugin.getBytes("UTF-8")); u8(0)
    b.toByteArray
  }

  /** The server-side native-password expectation, composed
    * independently of
    * [[graft.sources.BinlogClient.nativePasswordScramble]]:
    * stage-wise update/digest instead of concat-then-digest.
    */
  private def expectedNative(pwd: String, nonce: Array[Byte]): Array[Byte] = {
    if (pwd.isEmpty) return Array.emptyByteArray
    val md = java.security.MessageDigest.getInstance("SHA-1")
    val h1 = md.digest(pwd.getBytes("UTF-8"))
    md.reset()
    val h2 = md.digest(h1)
    md.reset()
    md.update(nonce)
    md.update(h2)
    val h3 = md.digest()
    h1.indices.map(i => (h1(i) ^ h3(i)).toByte).toArray
  }

  /** The server-side caching_sha2 expectation — independent stage-wise
    * composition of
    * `SHA256(pwd) XOR SHA256(SHA256(SHA256(pwd)) ++ nonce)`.
    */
  private def expectedSha2(pwd: String, nonce: Array[Byte]): Array[Byte] = {
    if (pwd.isEmpty) return Array.emptyByteArray
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val h1 = md.digest(pwd.getBytes("UTF-8"))
    md.reset()
    val h2 = md.digest(h1)
    md.reset()
    md.update(h2)
    md.update(nonce)
    val h3 = md.digest()
    h1.indices.map(i => (h1(i) ^ h3(i)).toByte).toArray
  }

  private def expected(plugin: String, pwd: String,
      nonce: Array[Byte]): Array[Byte] = plugin match {
    case "caching_sha2_password" => expectedSha2(pwd, nonce)
    case _ => expectedNative(pwd, nonce)
  }

  private def parseAuthResponse(
      body: Array[Byte]): (String, Array[Byte], String) = {
    // caps u32, max-packet u32, charset u8, 23 reserved
    var p = 4 + 4 + 1 + 23
    val uEnd = body.indexOf(0.toByte, p)
    val user = new String(body.slice(p, uEnd), "UTF-8"); p = uEnd + 1
    val n = body(p) & 0xff; p += 1
    val auth = body.slice(p, p + n); p += n
    val pEnd = body.indexOf(0.toByte, p)
    val plugin =
      new String(body.slice(p, if (pEnd < 0) body.length else pEnd), "UTF-8")
    (user, auth, plugin)
  }

  // ------------------------------------------------------------ serve

  private def serve(s: java.net.Socket): Unit = {
    var in = new DataInputStream(s.getInputStream)
    var out: OutputStream = s.getOutputStream

    writePacket(out, 0, handshakeV10)
    var first = readPacket(in)
    // SSLRequest: a 32-byte capability prefix with CLIENT_SSL set —
    // upgrade the SAME socket to TLS (server mode) and read the real
    // HandshakeResponse41 inside the tunnel
    var sessionTls = false
    if (first.length == 32 && (u32le(first, 0) & 0x0800L) != 0) {
      require(tls, "client requested TLS but the fixture has no identity")
      sslUpgrades += 1
      sessionTls = true
      val ssl = tlsContext.getSocketFactory
        .createSocket(s, null, s.getPort, false)
        .asInstanceOf[javax.net.ssl.SSLSocket]
      ssl.setUseClientMode(false)
      ssl.startHandshake()
      in = new DataInputStream(ssl.getInputStream)
      out = ssl.getOutputStream
      first = readPacket(in)
    }
    val (user, auth0, clientPlugin) = parseAuthResponse(first)
    lastUser = user
    lastClientPlugin = clientPlugin
    var seq = 2
    def deny(): Unit =
      writePacket(out, seq, errPacket(1045, "28000",
        s"Access denied for user '$user'"))

    val ok: Boolean = switchTo match {
      case Some(next) =>
        // AuthSwitchRequest: 0xfe + plugin NUL + fresh 20-byte salt NUL
        val b = new java.io.ByteArrayOutputStream()
        b.write(0xfe)
        b.write(next.getBytes("UTF-8")); b.write(0)
        b.write(switchSalt); b.write(0)
        writePacket(out, seq, b.toByteArray); seq += 1
        val re = readPacket(in); seq += 1
        lastAuth = re
        java.util.Arrays.equals(re, expected(next, password, switchSalt))
      case None if authPlugin == "caching_sha2_password" && !sha2Cached =>
        // cache miss: perform full authentication (a real server
        // ignores the fast scramble it can't check without a cache
        // entry). Over TLS the client sends the cleartext password
        // through the tunnel; in the clear it runs the RSA
        // public-key exchange.
        fullAuthExchanges += 1
        writePacket(out, seq, Array[Byte](0x01, 0x04)); seq += 1
        val req = readPacket(in); seq += 1
        if (sessionTls && !(req.length == 1 && req(0) == 0x02)) {
          lastFullAuthMode = "cleartext-tls"
          java.util.Arrays.equals(req,
            password.getBytes("UTF-8") :+ 0.toByte)
        } else if (req.length == 1 && req(0) == 0x02) {
          lastFullAuthMode = "rsa"
          writePacket(out, seq,
            Array[Byte](0x01) ++ publicKeyPem.getBytes("UTF-8")); seq += 1
          val blob = readPacket(in); seq += 1
          lastEncryptedBlob = blob
          val c = javax.crypto.Cipher.getInstance(
            "RSA/ECB/OAEPWithSHA-1AndMGF1Padding")
          c.init(javax.crypto.Cipher.DECRYPT_MODE, rsa.getPrivate)
          val clear = try c.doFinal(blob)
          catch { case _: Exception => Array.emptyByteArray }
          val unxored = clear.zipWithIndex.map { case (v, i) =>
            (v ^ salt(i % salt.length)).toByte
          }
          java.util.Arrays.equals(unxored,
            password.getBytes("UTF-8") :+ 0.toByte)
        } else {
          writePacket(out, seq, errPacket(1047, "08S01",
            "expected public key request")); return
        }
      case None =>
        lastAuth = auth0
        val match0 =
          java.util.Arrays.equals(auth0, expected(authPlugin, password, salt))
        if (match0 && authPlugin == "caching_sha2_password") {
          // fast-auth success marker precedes the OK on a cache hit
          writePacket(out, seq, Array[Byte](0x01, 0x03)); seq += 1
        }
        match0
    }
    if (!ok) { deny(); return }
    writePacket(out, seq, okPacket)

    val reg = readPacket(in)
    if ((reg(0) & 0xff) != 0x15) {
      writePacket(out, 1, errPacket(1047, "08S01", "expected REGISTER_SLAVE"))
      return
    }
    registeredServerIds.add(u32le(reg, 1))
    writePacket(out, 1, okPacket)

    val dump = readPacket(in)
    var dumpSeq = 1
    def send(ev: Array[Byte]): Unit = {
      val b = new Array[Byte](ev.length + 1)
      b(0) = 0x00
      System.arraycopy(ev, 0, b, 1, ev.length)
      writePacket(out, dumpSeq, b); dumpSeq += 1
    }
    // virtual preamble: the file's format-description event with
    // log_pos zeroed — sent at the head of EVERY dump. On a
    // checksummed file the edit invalidates the FDE's CRC, so the
    // master RE-STAMPS it (what a real master does — it sends a
    // freshly-built, validly-checksummed FDE).
    def sendPreamble(bytes: Array[Byte]): Unit =
      if (bytes.length >= 4 + 19) {
        val size = u32le(bytes, 4 + 9).toInt
        val pre = java.util.Arrays.copyOfRange(bytes, 4, 4 + size)
        pre(13) = 0; pre(14) = 0; pre(15) = 0; pre(16) = 0
        // checksum detection: 5.6.1+ FDE carries the alg byte at
        // end-5 (1 = CRC32); the fixture's own version strings are
        // all 8.x, so the byte position is authoritative
        if (size >= 24 && (pre(size - 5) & 0xff) == 1) {
          val crc = new java.util.zip.CRC32()
          crc.update(pre, 0, size - 4)
          val v = crc.getValue
          pre(size - 4) = (v & 0xff).toByte
          pre(size - 3) = ((v >> 8) & 0xff).toByte
          pre(size - 2) = ((v >> 16) & 0xff).toByte
          pre(size - 1) = ((v >> 24) & 0xff).toByte
        }
        send(pre)
      }

    (dump(0) & 0xff) match {
      case 0x12 =>
        val pos = u32le(dump, 1)
        // flags u16 at 5, server_id u32 at 7, filename from 11
        val filename = new String(dump.drop(11), "UTF-8")
        dumps.add((filename, pos))
        segments.get(filename) match {
          case None =>
            writePacket(out, dumpSeq, errPacket(1236, "HY000",
              "Could not find first log file name in binary log index " +
                s"file ($filename)"))
          case Some(bytes) =>
            sendPreamble(bytes)
            var p = 4
            while (p + 19 <= bytes.length) {
              val size = u32le(bytes, p + 9).toInt
              if (p >= pos)
                send(java.util.Arrays.copyOfRange(bytes, p, p + size))
              p += size
            }
            writePacket(out, dumpSeq, eofPacket)
        }

      case 0x1e => // COM_BINLOG_DUMP_GTID (auto-position)
        // flags u16 at 1, server_id u32 at 3, name_len u32 at 7,
        // name, pos u64, data_len u32, executed-GTID-set data
        val flags = u16le(dump, 1)
        var p = 7
        val nameLen = u32le(dump, p).toInt; p += 4 + nameLen
        p += 8 // position (auto-position sends 4; unused here)
        val dataLen = u32le(dump, p).toInt; p += 4
        def u64le(off: Int): Long =
          (0 until 8).map(i => (dump(off + i) & 0xffL) << (8 * i)).sum
        val dataEnd = p + dataLen
        val nSids = u64le(p).toInt; p += 8
        val executed = (0 until nSids).map { _ =>
          val sid = dump.slice(p, p + 16)
            .map(b => f"${b & 0xff}%02x").mkString; p += 16
          val nIv = u64le(p).toInt; p += 8
          val ivs = (0 until nIv).map { _ =>
            val first = u64le(p); val endExcl = u64le(p + 8); p += 16
            (first, endExcl - 1) // wire end is exclusive
          }
          sid -> ivs
        }.toMap
        require(p == dataEnd, s"GTID set data length mismatch ($p != $dataEnd)")
        gtidDumps.add((flags, executed))
        def covered(sid: String, gno: Long): Boolean =
          executed.getOrElse(sid, Nil)
            .exists { case (a, b) => gno >= a && gno <= b }

        // auto-position: serve every segment in name order, skipping
        // transactions the executed set covers — a transaction is a
        // GTID event (type 33) plus everything until the next GTID
        // event; FDE/ROTATE pass through regardless
        val names = segments.keys.toSeq.sorted
        names.headOption.foreach(n => sendPreamble(segments(n)))
        names.foreach { n =>
          val bytes = segments(n)
          var q = 4
          var skipping = false
          while (q + 19 <= bytes.length) {
            val size = u32le(bytes, q + 9).toInt
            val typ = bytes(q + 4) & 0xff
            if (typ == 33) {
              val sid = bytes.slice(q + 20, q + 36)
                .map(b => f"${b & 0xff}%02x").mkString
              val gno = (0 until 8)
                .map(i => (bytes(q + 36 + i) & 0xffL) << (8 * i)).sum
              skipping = covered(sid, gno)
            }
            val always = typ == 15 || typ == 4 // FDE, ROTATE
            if (always || !skipping)
              send(java.util.Arrays.copyOfRange(bytes, q, q + size))
            q += size
          }
        }
        writePacket(out, dumpSeq, eofPacket)

      case _ =>
        writePacket(out, dumpSeq, errPacket(1047, "08S01", "expected BINLOG_DUMP"))
    }
  }
}
