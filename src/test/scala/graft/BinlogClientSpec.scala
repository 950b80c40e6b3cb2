package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Binlog, BinlogClient, ChangeLog}
import graft.sources.Binlog._
import BinlogFixture._

/** The replica WIRE client (SURVEY §2.1 S1's network half; reference
  * src/main.rs:222-228 `get_binlog_stream`) against a scripted master
  * socket ([[BinlogMasterFixture]]): handshake + scramble verified
  * byte-for-byte by the SERVER side, dump == file decode including a
  * mid-segment resume (the true-offset rebase), ERR paths, and the
  * env-gated mirror ingest ([[ChangeLog.syncFromMaster]]) feeding the
  * unchanged DSv2 source.
  */
class BinlogClientSpec extends AnyFunSuite {

  private val T = Seq(TypeLong, TypeVarchar)
  private val M = Seq(0, 64)

  private def seg1: Array[Byte] = file(Seq(
    (1700000000L, FormatDescription, fdePayload()),
    (1700000001L, TableMapEvent, tableMapPayload(7, "db0", "users", T, M)),
    (1700000001L, WriteRowsV2,
      rowsPayload(7, T, M, Seq(Seq(I(1), S("a")), Seq(I(2), S("b"))))),
    (1700000002L, TableMapEvent, tableMapPayload(7, "db0", "users", T, M)),
    (1700000002L, UpdateRowsV2,
      updateRowsPayload(7, T, M, Seq((Seq(I(1), S("a")), Seq(I(1), S("a2")))))),
    (1700000003L, Rotate, rotatePayload("fix-bin.000002"))))

  private def seg2Events(extra: Boolean) = Seq(
    (1700000010L, FormatDescription, fdePayload()),
    (1700000011L, TableMapEvent, tableMapPayload(7, "db0", "users", T, M)),
    (1700000011L, DeleteRowsV2, rowsPayload(7, T, M, Seq(Seq(I(2), S("b")))))
  ) ++ (if (extra) Seq(
    (1700000012L, TableMapEvent, tableMapPayload(7, "db0", "users", T, M)),
    (1700000012L, WriteRowsV2, rowsPayload(7, T, M, Seq(Seq(I(3), S("c")))))
  ) else Nil)

  private def seg2: Array[Byte] = file(seg2Events(extra = false))
  private def seg2Grown: Array[Byte] = file(seg2Events(extra = true))

  /** (event type, file offset) walk of a fixture file's headers. */
  private def eventOffsets(bytes: Array[Byte]): Seq[(Int, Long)] = {
    var p = 4
    val out = Seq.newBuilder[(Int, Long)]
    while (p + 19 <= bytes.length) {
      val typ = bytes(p + 4) & 0xff
      val size = ((bytes(p + 9) & 0xffL) | ((bytes(p + 10) & 0xffL) << 8) |
        ((bytes(p + 11) & 0xffL) << 16) |
        ((bytes(p + 12) & 0xffL) << 24)).toInt
      out += ((typ, p.toLong))
      p += size
    }
    out.result()
  }

  private def withMaster[A](password: String,
      segs: Map[String, Array[Byte]],
      authPlugin: String = "mysql_native_password",
      sha2Cached: Boolean = true,
      switchTo: Option[String] = None,
      tls: Boolean = false)(f: BinlogMasterFixture => A): A = {
    val m = new BinlogMasterFixture(password, segs, authPlugin, sha2Cached,
      switchTo, tls)
    try f(m) finally m.close()
  }

  test("native-password scramble: empty password and 20-byte shape") {
    assert(BinlogClient.nativePasswordScramble("", Array.fill[Byte](20)(1)).isEmpty)
    val s = BinlogClient.nativePasswordScramble("secret",
      Array.tabulate[Byte](20)(_.toByte))
    assert(s.length == 20)
  }

  test("full dump over the socket == Binlog.decodeFile, rotate included") {
    withMaster("secret", Map("fix-bin.000001" -> seg1)) { m =>
      val d = BinlogClient.dump("127.0.0.1", m.port, "repl", "secret",
        99L, "fix-bin.000001", 4L)
      val exp = Binlog.decodeFile(seg1)
      assert(d.changes == exp.changes) // values AND true positions
      assert(d.rotate == exp.rotate)
      assert(m.registeredServerIds.contains(99L))
      // the master verified the scramble byte-for-byte with its OWN
      // composition before serving; pin the bytes it saw against the
      // client's published function
      assert(java.util.Arrays.equals(m.lastAuth,
        BinlogClient.nativePasswordScramble("secret", m.salt)))
      assert(m.lastUser == "repl")
    }
  }

  test("mid-segment resume reports TRUE file offsets (the rebase)") {
    val mapOffsets = eventOffsets(seg1).filter(_._1 == TableMapEvent)
    assert(mapOffsets.size == 2)
    val resumeAt = mapOffsets(1)._2 // second statement's TABLE_MAP
    withMaster("secret", Map("fix-bin.000001" -> seg1)) { m =>
      val d = BinlogClient.dump("127.0.0.1", m.port, "repl", "secret",
        99L, "fix-bin.000001", resumeAt)
      val exp = Binlog.decodeFile(seg1)
      // same suffix a file decode of the WHOLE segment reports from
      // resumeAt on — including each change's absolute position, which
      // the wire stream cannot know from buffer offsets alone
      assert(d.changes == exp.changes.filter(_.pos >= resumeAt))
      assert(d.changes.nonEmpty && d.changes.head.op == graft.cdc.ChangeOp.Update)
      assert(d.rotate == exp.rotate)
    }
  }

  test("caching_sha2 scramble: empty password and 32-byte shape") {
    assert(BinlogClient.sha2PasswordScramble("",
      Array.fill[Byte](20)(1)).isEmpty)
    val s = BinlogClient.sha2PasswordScramble("secret",
      Array.tabulate[Byte](20)(_.toByte))
    assert(s.length == 32)
    // distinct nonces must move the token (it is salted, not a hash
    // of the password alone)
    val s2 = BinlogClient.sha2PasswordScramble("secret",
      Array.tabulate[Byte](20)(i => (i + 1).toByte))
    assert(!java.util.Arrays.equals(s, s2))
  }

  test("caching_sha2 FAST path (cache hit): dump == file decode, scramble " +
      "verified by the master's independent SHA-256 composition") {
    withMaster("secret", Map("fix-bin.000001" -> seg1),
        authPlugin = "caching_sha2_password") { m =>
      val d = BinlogClient.dump("127.0.0.1", m.port, "repl", "secret",
        99L, "fix-bin.000001", 4L)
      val exp = Binlog.decodeFile(seg1)
      assert(d.changes == exp.changes && d.rotate == exp.rotate)
      assert(m.lastClientPlugin == "caching_sha2_password")
      assert(m.lastAuth.length == 32)
      assert(java.util.Arrays.equals(m.lastAuth,
        BinlogClient.sha2PasswordScramble("secret", m.salt)))
      assert(m.fullAuthExchanges == 0)
    }
  }

  test("caching_sha2 fast path, wrong password: ERR 1045") {
    withMaster("secret", Map("fix-bin.000001" -> seg1),
        authPlugin = "caching_sha2_password") { m =>
      val e = intercept[BinlogClient.ProtocolException] {
        BinlogClient.dump("127.0.0.1", m.port, "repl", "WRONG",
          99L, "fix-bin.000001", 4L)
      }
      assert(e.getMessage.contains("1045"))
    }
  }

  test("caching_sha2 FULL auth (cache miss): RSA public-key exchange, " +
      "cleartext never on the wire") {
    withMaster("secret", Map("fix-bin.000001" -> seg1),
        authPlugin = "caching_sha2_password", sha2Cached = false) { m =>
      val d = BinlogClient.dump("127.0.0.1", m.port, "repl", "secret",
        99L, "fix-bin.000001", 4L)
      assert(d.changes == Binlog.decodeFile(seg1).changes)
      assert(m.fullAuthExchanges == 1)
      // the blob is one RSA-2048 block, and the password bytes appear
      // nowhere in it (OAEP + nonce-XOR — the master DECRYPTED it
      // with its private key and compared cleartext server-side)
      assert(m.lastEncryptedBlob.length == 256)
      val blob = new String(m.lastEncryptedBlob, "ISO-8859-1")
      assert(!blob.contains("secret"))
    }
  }

  test("caching_sha2 full auth, wrong password: the master's RSA decrypt " +
      "+ compare ERRs 1045") {
    withMaster("secret", Map("fix-bin.000001" -> seg1),
        authPlugin = "caching_sha2_password", sha2Cached = false) { m =>
      val e = intercept[BinlogClient.ProtocolException] {
        BinlogClient.dump("127.0.0.1", m.port, "repl", "WRONG",
          99L, "fix-bin.000001", 4L)
      }
      assert(e.getMessage.contains("1045"))
      assert(m.fullAuthExchanges == 1)
    }
  }

  test("AuthSwitchRequest sha2->native: client re-scrambles under the " +
      "switched plugin and the FRESH salt") {
    withMaster("secret", Map("fix-bin.000001" -> seg1),
        authPlugin = "caching_sha2_password",
        switchTo = Some("mysql_native_password")) { m =>
      val d = BinlogClient.dump("127.0.0.1", m.port, "repl", "secret",
        99L, "fix-bin.000001", 4L)
      assert(d.changes == Binlog.decodeFile(seg1).changes)
      assert(m.lastAuth.length == 20) // a SHA-1 scramble, not SHA-256
      assert(java.util.Arrays.equals(m.lastAuth,
        BinlogClient.nativePasswordScramble("secret", m.switchSalt)))
    }
  }

  test("AuthSwitchRequest native->sha2: the reverse direction") {
    withMaster("secret", Map("fix-bin.000001" -> seg1),
        switchTo = Some("caching_sha2_password")) { m =>
      val d = BinlogClient.dump("127.0.0.1", m.port, "repl", "secret",
        99L, "fix-bin.000001", 4L)
      assert(d.changes == Binlog.decodeFile(seg1).changes)
      assert(m.lastAuth.length == 32)
      assert(java.util.Arrays.equals(m.lastAuth,
        BinlogClient.sha2PasswordScramble("secret", m.switchSalt)))
    }
  }

  test("TLS upgrade: SSLRequest + pinned cert, dump == file decode") {
    withMaster("secret", Map("fix-bin.000001" -> seg1),
        tls = true) { m =>
      val d = BinlogClient.dump("127.0.0.1", m.port, "repl", "secret",
        99L, "fix-bin.000001", 4L, tlsTrustPem = Some(m.certPem))
      val exp = Binlog.decodeFile(seg1)
      assert(d.changes == exp.changes && d.rotate == exp.rotate)
      assert(m.sslUpgrades == 1)
      // the scramble still travels (inside the tunnel) and verifies
      assert(java.util.Arrays.equals(m.lastAuth,
        BinlogClient.nativePasswordScramble("secret", m.salt)))
    }
  }

  test("TLS + caching_sha2 full auth: cleartext through the tunnel, no RSA step") {
    withMaster("secret", Map("fix-bin.000001" -> seg1),
        authPlugin = "caching_sha2_password", sha2Cached = false,
        tls = true) { m =>
      val d = BinlogClient.dump("127.0.0.1", m.port, "repl", "secret",
        99L, "fix-bin.000001", 4L, tlsTrustPem = Some(m.certPem))
      assert(d.changes == Binlog.decodeFile(seg1).changes)
      assert(m.sslUpgrades == 1 && m.fullAuthExchanges == 1)
      assert(m.lastFullAuthMode == "cleartext-tls")
      assert(m.lastEncryptedBlob.isEmpty) // the RSA path never ran
    }
  }

  test("TLS pin mismatch: a foreign certificate fails the handshake loudly") {
    withMaster("secret", Map("fix-bin.000001" -> seg1), tls = true) { m =>
      withMaster("secret", Map.empty, tls = true) { other =>
        intercept[javax.net.ssl.SSLHandshakeException] {
          BinlogClient.dump("127.0.0.1", m.port, "repl", "secret",
            99L, "fix-bin.000001", 4L, tlsTrustPem = Some(other.certPem))
        }
      }
    }
  }

  test("unknown auth plugin refuses loudly (no silent wrong scramble)") {
    withMaster("secret", Map("fix-bin.000001" -> seg1),
        authPlugin = "sha256_password") { m =>
      val e = intercept[BinlogClient.ProtocolException] {
        BinlogClient.dump("127.0.0.1", m.port, "repl", "secret",
          99L, "fix-bin.000001", 4L)
      }
      assert(e.getMessage.contains("unsupported auth plugin"))
    }
  }

  test("wrong password: the master's independent scramble check ERRs") {
    withMaster("secret", Map("fix-bin.000001" -> seg1)) { m =>
      val e = intercept[BinlogClient.ProtocolException] {
        BinlogClient.dump("127.0.0.1", m.port, "repl", "WRONG",
          99L, "fix-bin.000001", 4L)
      }
      assert(e.getMessage.contains("1045") &&
        e.getMessage.contains("Access denied"))
    }
  }

  test("unknown segment name: server ERR 1236 surfaces") {
    withMaster("secret", Map("fix-bin.000001" -> seg1)) { m =>
      val e = intercept[BinlogClient.ProtocolException] {
        BinlogClient.dump("127.0.0.1", m.port, "repl", "secret",
          99L, "no-such-bin.000009", 4L)
      }
      assert(e.getMessage.contains("1236"))
    }
  }

  private val Sid: Array[Byte] = Array.tabulate[Byte](16)(i => (i * 11 + 2).toByte)
  private val SidHex: String = Sid.map(b => f"${b & 0xff}%02x").mkString

  /** Three single-statement transactions, each opened by a GTID event
    * (gno 1..3): inserts (1,"a"), (2,"b"), then delete (1,"a").
    */
  private def gtidSeg: Array[Byte] = file(Seq(
    (1700000000L, FormatDescription, fdePayload()),
    (1700000001L, GtidEvent, gtidPayload(Sid, 1L)),
    (1700000001L, TableMapEvent, tableMapPayload(7, "db0", "users", T, M)),
    (1700000001L, WriteRowsV2, rowsPayload(7, T, M, Seq(Seq(I(1), S("a"))))),
    (1700000002L, GtidEvent, gtidPayload(Sid, 2L)),
    (1700000002L, TableMapEvent, tableMapPayload(7, "db0", "users", T, M)),
    (1700000002L, WriteRowsV2, rowsPayload(7, T, M, Seq(Seq(I(2), S("b"))))),
    (1700000003L, GtidEvent, gtidPayload(Sid, 3L)),
    (1700000003L, TableMapEvent, tableMapPayload(7, "db0", "users", T, M)),
    (1700000003L, DeleteRowsV2, rowsPayload(7, T, M, Seq(Seq(I(1), S("a")))))))

  test("GTID dump, empty executed set == full file decode; gtidsOf " +
      "recovers the stream's gnos") {
    withMaster("secret", Map("gtid-bin.000001" -> gtidSeg)) { m =>
      val d = BinlogClient.fetchGtid("127.0.0.1", m.port, "repl", "secret",
        99L, BinlogClient.GtidSet.empty)
      val exp = Binlog.decodeFile(gtidSeg)
      assert(d.decoded.changes == exp.changes) // values AND true positions
      assert(BinlogClient.gtidsOf(d.events) ==
        Seq((SidHex, 1L), (SidHex, 2L), (SidHex, 3L)))
      // the fixture's INDEPENDENT command parse saw auto-position +
      // THROUGH_GTID flags and an empty set
      val (flags, set) = m.gtidDumps.peek()
      assert((flags & BinlogClient.BinlogThroughGtid) != 0)
      assert(set.isEmpty)
    }
  }

  test("GTID dump resumes by executed set: covered transactions are " +
      "skipped server-side") {
    withMaster("secret", Map("gtid-bin.000001" -> gtidSeg)) { m =>
      val d = BinlogClient.fetchGtid("127.0.0.1", m.port, "repl", "secret",
        99L, BinlogClient.GtidSet(Map(SidHex -> Seq((1L, 2L)))))
      val exp = Binlog.decodeFile(gtidSeg)
      // only transaction gno=3 (the delete) arrives — with its TRUE
      // file position, same as a file decode's suffix
      assert(d.decoded.changes == exp.changes.drop(2))
      assert(d.decoded.changes.map(_.op) ==
        Seq(graft.cdc.ChangeOp.Delete))
      assert(BinlogClient.gtidsOf(d.events) == Seq((SidHex, 3L)))
      // the fixture parsed the client's encoding back to the
      // INCLUSIVE interval it was built from
      val (_, set) = m.gtidDumps.peek()
      assert(set == Map(SidHex -> Seq((1L, 2L))))
    }
  }

  test("GTID resume loop: gtidsOf of one dump is the next dump's " +
      "executed set, and the next dump is empty until new commits") {
    withMaster("secret", Map("gtid-bin.000001" -> gtidSeg)) { m =>
      val d1 = BinlogClient.fetchGtid("127.0.0.1", m.port, "repl", "secret",
        99L, BinlogClient.GtidSet.empty)
      val gnos = BinlogClient.gtidsOf(d1.events).map(_._2)
      val executed = BinlogClient.GtidSet(
        Map(SidHex -> Seq((gnos.min, gnos.max))))
      val d2 = BinlogClient.fetchGtid("127.0.0.1", m.port, "repl", "secret",
        99L, executed)
      assert(d2.decoded.changes.isEmpty) // everything already executed
      assert(BinlogClient.gtidsOf(d2.events).isEmpty)
    }
  }

  test("GTID dump works over caching_sha2 auth (the stock MySQL 8 pairing)") {
    withMaster("secret", Map("gtid-bin.000001" -> gtidSeg),
        authPlugin = "caching_sha2_password", sha2Cached = false) { m =>
      val d = BinlogClient.fetchGtid("127.0.0.1", m.port, "repl", "secret",
        99L, BinlogClient.GtidSet(Map(SidHex -> Seq((1L, 1L)))))
      assert(d.decoded.changes == Binlog.decodeFile(gtidSeg).changes.drop(1))
      assert(m.fullAuthExchanges == 1)
    }
  }

  test("full column-type surface decodes to the reference's value forms") {
    // FLOAT, DOUBLE, YEAR, TIMESTAMP(3), TIME(6), DECIMAL(13,3),
    // BLOB(2-byte len), CHAR(10) — the types a real table mix hits
    // beyond the integer/varchar/date core (reference value surface:
    // main.rs:453-502 — numbers stay numbers, temporals/decimal
    // stringify, bytes go utf8-or-hex)
    val types = Seq(TypeFloat, TypeDouble, TypeYear, TypeTimestamp2,
      TypeTime2, TypeNewDecimal, TypeBlob, TypeString)
    val metas = Seq(4, 8, 0, 3, 6, (13 << 8) | 3, 2, (0xfe << 8) | 10)
    val epoch2026 = 1767225600L // 2026-01-01T00:00:00Z
    val rows = Seq(
      Seq(F(1.5f), DBL(-2.25), Y(1999), TS(epoch2026, 123400),
        TM(neg = true, 0, 0, 1, 500000), DEC("-1234.500"),
        BLOB("hello".getBytes("UTF-8")), CH("padded")),
      Seq(F(0f), NULL, Y(0), TS(epoch2026 + 86399),
        TM(neg = false, 123, 2, 3), DEC("9999999999.999"),
        BLOB(Array[Byte](0xff.toByte, 0x00, 0xc3.toByte)), NULL))
    val f = file(Seq(
      (1700000000L, FormatDescription, fdePayload()),
      (1700000001L, TableMapEvent,
        tableMapPayload(9, "db0", "mix", types, metas)),
      (1700000001L, WriteRowsV2, rowsPayload(9, types, metas, rows))))
    val changes = Binlog.decodeFile(f).changes
    assert(changes.size == 2)
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val r0 = m.readTree(changes(0).after.get)
    assert(r0.get("c0").floatValue == 1.5f)
    assert(r0.get("c1").doubleValue == -2.25)
    assert(r0.get("c2").asInt == 1999)
    assert(r0.get("c3").asText == "2026-01-01 00:00:00.123")
    assert(r0.get("c4").asText == "-000:00:01.500000")
    assert(r0.get("c5").asText == "-1234.500")
    assert(r0.get("c6").asText == "hello")
    assert(r0.get("c7").asText == "padded")
    val r1 = m.readTree(changes(1).after.get)
    assert(r1.get("c0").floatValue == 0f)
    assert(r1.get("c1").isNull && r1.get("c7").isNull)
    assert(r1.get("c2").asInt == 0) // YEAR 0 is the literal 0000
    assert(r1.get("c3").asText == "2026-01-01 23:59:59.000")
    assert(r1.get("c4").asText == "123:02:03") // no frac when micros=0
    assert(r1.get("c5").asText == "9999999999.999") // 10 int digits: 2 groups
    assert(r1.get("c6").asText == "FF00C3") // non-UTF-8 -> uppercase hex
  }

  test("CRC32 checksums (the 5.6+ default): verified, excluded, corruption loud") {
    val events = Seq(
      (1700000000L, FormatDescription, fdePayload()),
      (1700000001L, TableMapEvent, tableMapPayload(7, "db0", "users", T, M)),
      (1700000001L, WriteRowsV2,
        rowsPayload(7, T, M, Seq(Seq(I(1), S("a")), Seq(I(2), S("b"))))),
      (1700000002L, Rotate, rotatePayload("fix-bin.000002")))
    val plainF = file(events)
    val crcF = file(events, checksum = true)
    // same changes, same rotate — the 4 CRC bytes never reach the
    // row parser (without the exclusion the rows loop would read
    // them as another row image and corrupt the decode)
    val plain = Binlog.decodeFile(plainF)
    val crc = Binlog.decodeFile(crcF)
    assert(crc.changes.map(c => (c.op, c.before, c.after, c.tsSec)) ==
      plain.changes.map(c => (c.op, c.before, c.after, c.tsSec)))
    assert(crc.rotate.map(_.nextFile) == plain.rotate.map(_.nextFile))
    // flip one payload byte inside the rows event: fails LOUD with a
    // CRC message, never a silently-wrong row
    val bad = crcF.clone()
    val rowsOff = {
      var p = 4; var found = -1
      while (found < 0) {
        val typ = bad(p + 4) & 0xff
        val size = ((bad(p + 9) & 0xffL) | ((bad(p + 10) & 0xffL) << 8) |
          ((bad(p + 11) & 0xffL) << 16) |
          ((bad(p + 12) & 0xffL) << 24)).toInt
        if (typ == WriteRowsV2) found = p else p += size
      }
      found
    }
    bad(rowsOff + 25) = (bad(rowsOff + 25) ^ 0x5a).toByte
    val e = intercept[IllegalArgumentException](Binlog.decodeFile(bad))
    assert(e.getMessage.contains("CRC32 mismatch"))
  }

  test("checksummed segment over the wire == file decode (preamble re-stamp)") {
    val crcSeg = file(Seq(
      (1700000000L, FormatDescription, fdePayload()),
      (1700000001L, TableMapEvent, tableMapPayload(7, "db0", "users", T, M)),
      (1700000001L, WriteRowsV2, rowsPayload(7, T, M, Seq(Seq(I(9), S("z")))))),
      checksum = true)
    withMaster("secret", Map("crc-bin.000001" -> crcSeg)) { m =>
      // the master's virtual preamble (log_pos zeroed) must carry a
      // RE-STAMPED CRC or the client's decode rejects the stream
      val d = BinlogClient.dump("127.0.0.1", m.port, "repl", "secret",
        99L, "crc-bin.000001", 4L)
      val exp = Binlog.decodeFile(crcSeg)
      assert(d.changes == exp.changes)
    }
  }

  test("live tail: repeated mirror syncs feed the STREAMING source incrementally") {
    val spark = TestSpark.spark
    val dir = Files.createTempDirectory("binlog_tail").toString
    val ckp = Files.createTempDirectory("binlog_tail_ckp").toString
    val seg = (extra: Boolean) => file(seg2Events(extra))
    withMaster("secret", Map("fix-bin.000002" -> seg(false))) { m =>
      ChangeLog.syncFromMaster(dir, Some(s"127.0.0.1:${m.port}"),
        user = "repl", password = "secret", serverId = 6L,
        firstFile = "fix-bin.000002")
      val q = spark.readStream.format("graft-changelog")
        .option("path", dir).load()
        .writeStream.format("memory").queryName("binlog_tail")
        .option("checkpointLocation", ckp).start()
      try {
        q.processAllAvailable()
        assert(spark.table("binlog_tail").count() == 1) // the delete row
        // the master's active segment grows; a new sync appends the
        // suffix and the RUNNING stream picks it up — the live loop
        m.segments = Map("fix-bin.000002" -> seg(true))
        ChangeLog.syncFromMaster(dir, Some(s"127.0.0.1:${m.port}"),
          user = "repl", password = "secret", serverId = 6L,
          firstFile = "fix-bin.000002")
        q.processAllAvailable()
        val rows = spark.table("binlog_tail")
          .select("op", "seq").collect().sortBy(_.getLong(1))
        assert(rows.length == 2)
        assert(rows.map(_.getString(0)).toSeq == Seq("Delete", "Insert"))
        assert(rows(0).getLong(1) < rows(1).getLong(1)) // seq monotonic
      } finally q.stop()
    }
  }

  test("tailMaster: the turnkey loop keeps syncing, survives outages, stops clean") {
    val dir = Files.createTempDirectory("binlog_tailloop").toString
    // env-gated: no master -> no thread
    assert(ChangeLog.tailMaster(dir, None).isEmpty)
    withMaster("secret", Map("fix-bin.000002" -> seg2)) { m =>
      val tail = ChangeLog.tailMaster(dir, Some(s"127.0.0.1:${m.port}"),
        user = "repl", password = "secret", serverId = 8L,
        firstFile = "fix-bin.000002", pollMillis = 50L).get
      try {
        val t0 = System.nanoTime()
        while (tail.syncs < 2 && System.nanoTime() - t0 < 10e9) Thread.sleep(20)
        assert(tail.syncs >= 2 && tail.lastError.isEmpty)
        assert(java.util.Arrays.equals(
          Files.readAllBytes(java.nio.file.Paths.get(dir,
            "fix-bin.000002.binlog")), seg2))
        // outage: wrong-password rejections surface but don't kill
        // the loop; recovery clears the error
        val goodSyncs = tail.syncs
        m.segments = Map.empty // 1236 on every poll
        val t1 = System.nanoTime()
        while (tail.lastError.isEmpty && System.nanoTime() - t1 < 10e9)
          Thread.sleep(20)
        assert(tail.lastError.exists(_.getMessage.contains("1236")))
        m.segments = Map("fix-bin.000002" -> seg2Grown)
        val t2 = System.nanoTime()
        while ((tail.lastError.nonEmpty || tail.syncs <= goodSyncs) &&
          System.nanoTime() - t2 < 10e9) Thread.sleep(20)
        assert(tail.lastError.isEmpty)
        assert(java.util.Arrays.equals(
          Files.readAllBytes(java.nio.file.Paths.get(dir,
            "fix-bin.000002.binlog")), seg2Grown))
      } finally tail.stop()
    }
  }

  test("mirror ingest: socket -> byte-equal local segments -> DSv2 source") {
    val spark = TestSpark.spark
    val dir = Files.createTempDirectory("binlog_mirror").toString
    withMaster("secret",
        Map("fix-bin.000001" -> seg1, "fix-bin.000002" -> seg2)) { m =>
      // gated: no master configured -> no socket, no files
      assert(ChangeLog.syncFromMaster(dir, None).isEmpty)

      val st = ChangeLog.syncFromMaster(dir, Some(s"127.0.0.1:${m.port}"),
        user = "repl", password = "secret", serverId = 5L,
        firstFile = "fix-bin.000001").get
      // followed the rotate and drained the active segment to its end
      assert(st == ChangeLog.MasterState("fix-bin.000002", seg2.length.toLong))
      // mirrored segments are BYTE-EQUAL to the master's files (wire
      // events are file events; the virtual preamble never lands)
      def local(n: String) =
        Files.readAllBytes(java.nio.file.Paths.get(dir, n + ".binlog"))
      assert(java.util.Arrays.equals(local("fix-bin.000001"), seg1))
      assert(java.util.Arrays.equals(local("fix-bin.000002"), seg2))

      // the unchanged DSv2 source serves the mirrored log
      val df = spark.read.format("graft-changelog").option("path", dir).load()
      assert(df.count() == 4) // 2 inserts + 1 update + 1 delete
      assert(df.filter(org.apache.spark.sql.functions.col("op") === "Delete")
        .count() == 1)

      // incremental resume: grow the active segment on the master,
      // sync again — the dump starts at the persisted pos (not 4) and
      // only the suffix is appended
      m.segments = Map("fix-bin.000001" -> seg1, "fix-bin.000002" -> seg2Grown)
      val st2 = ChangeLog.syncFromMaster(dir, Some(s"127.0.0.1:${m.port}"),
        user = "repl", password = "secret", serverId = 5L,
        firstFile = "fix-bin.000001").get
      assert(st2 == ChangeLog.MasterState("fix-bin.000002",
        seg2Grown.length.toLong))
      val lastDump = {
        val it = m.dumps.iterator(); var d = it.next(); while (it.hasNext) d = it.next(); d
      }
      assert(lastDump == (("fix-bin.000002", seg2.length.toLong)))
      assert(java.util.Arrays.equals(local("fix-bin.000002"), seg2Grown))
      assert(spark.read.format("graft-changelog").option("path", dir).load()
        .count() == 5)
    }
  }
}
