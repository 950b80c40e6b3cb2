package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Stable identity for a checkpoint LINEAGE, persisted next to the
  * checkpoint itself.
  *
  * The additive stores (CardStore's counters, TokenQuotaStore's
  * spend) guard against at-least-once replay with a per-key
  * (run, batch) high-water. The mark is only correct if "run" means
  * the checkpoint lineage, NOT the driver process: Structured
  * Streaming replays a batch after a crash by RESTARTING the driver
  * from the same checkpoint, so a process-scoped id (a fresh UUID per
  * `maintain()` call) would change across exactly the restart that
  * produces the replay, defeating the guard and double-adding.
  *
  * [[forCheckpoint]] writes a UUID once under the checkpoint
  * directory and returns the same value to every later `maintain()`
  * pointed at that checkpoint — a restarted driver resumes the SAME
  * run id, so the replayed (runId, batchId) hits the stored mark and
  * skips. Deleting the checkpoint (a genuinely fresh ingest run,
  * reading fresh offsets that can never re-deliver old batches)
  * deletes the mark file with it, which is exactly the scoping the
  * high-water contract needs: batch ids restart at 0 in a fresh run
  * and must be allowed to accumulate again.
  *
  * Write is tmp + ATOMIC_MOVE (no REPLACE_EXISTING): a concurrent
  * racer loses the move and reads the winner's id, so all callers of
  * one checkpoint agree even without the single-writer assumption.
  */
object RunMark {

  private val FileName = "graft-run-id"

  def forCheckpoint(checkpointDir: String): String = {
    val dir = Paths.get(checkpointDir)
    Files.createDirectories(dir)
    val f = dir.resolve(FileName)
    if (Files.exists(f)) new String(Files.readAllBytes(f), "UTF-8").trim
    else {
      val id = java.util.UUID.randomUUID().toString
      val tmp = dir.resolve(s"$FileName.tmp-$id")
      Files.write(tmp, id.getBytes("UTF-8"))
      try {
        Files.move(tmp, f, StandardCopyOption.ATOMIC_MOVE)
        id
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp)
          new String(Files.readAllBytes(f), "UTF-8").trim
      }
    }
  }
}
