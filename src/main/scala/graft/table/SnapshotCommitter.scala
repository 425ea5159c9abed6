package graft.table

import java.nio.file.{Files, Path}
import java.util.UUID

/** The atomic publish primitive every snapshot commits through: put
  * `content` at `target` IFF nothing exists there yet, atomically — the
  * compare-and-swap optimistic concurrency rests on (see
  * `StreamTable.commit`'s retry loop). This interface is the deployment
  * seam: the local/POSIX default below links a fully-written temp file into
  * place; an object-store deployment swaps in a conditional put
  * (`If-None-Match: *` / DynamoDB-style conditional write) with identical
  * semantics. The contract, precisely:
  *
  *  - returns TRUE only if this call made `target` exist with `content`;
  *  - returns FALSE when `target` already exists (a concurrent committer
  *    won) — the caller re-reads table state and retries under a fresh id;
  *  - a FALSE whose cause was this call's own earlier success (a retried
  *    conditional put whose first response was lost) is SAFE: the retry
  *    recomputes against the now-visible snapshot, so the re-add collapses
  *    into an in-place replacement, never duplicated rows (pinned in
  *    ConcurrencySpec);
  *  - readers may observe `target` at any moment after the call starts, and
  *    must then see the complete `content` (no partial writes). */
trait SnapshotCommitter {
  def publish(target: Path, content: Array[Byte]): Boolean
}

/** POSIX hard-link CAS: write a temp sibling, `createLink` it into place.
  * Link, not rename — POSIX rename() silently REPLACES an existing target
  * (ATOMIC_MOVE gives no fail-if-exists guarantee), so a rename-based
  * publish would let a concurrent committer's snapshot be overwritten and
  * its commit silently lost; createLink is atomic AND fails with EEXIST
  * when the loser arrives second. Readers only ever see a fully written
  * file (the link appears after the tmp content is complete). */
object PosixLinkCommitter extends SnapshotCommitter {
  override def publish(target: Path, content: Array[Byte]): Boolean = {
    val tmp = target.resolveSibling(s".tmp-${UUID.randomUUID()}.json")
    Files.write(tmp, content)
    try {
      Files.createLink(target, tmp)
      Files.deleteIfExists(tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        false
    }
  }
}
