package graft.sources

import java.nio.file.{Files, Path}

/** The atomic publish primitive of the snapshot commit protocol —
  * the ONLY step whose atomicity depends on the storage system, so
  * it lives behind this interface: the rest of the protocol (staging,
  * manifests, retries, conflict detection) is storage-agnostic.
  *
  * Contract: `publish` makes `body` durably readable at `target` if
  * and only if no manifest exists there yet, and throws
  * `java.nio.file.FileAlreadyExistsException` otherwise. The
  * check-and-publish MUST be atomic — two racing publishers for one
  * target see exactly one winner; the loser's exception is the
  * optimistic-concurrency signal [[Snapshots]] retries or aborts on.
  *
  * Implementations map to what each store can do atomically:
  *  - POSIX filesystems: hard-link no-clobber ([[LinkCommitPublisher]],
  *    the default) — link() fails with EEXIST where rename() would
  *    silently replace the race winner.
  *  - S3-style object stores: conditional PUT (`If-None-Match: *`) —
  *    the HTTP 412 maps to the same exception. Implemented as
  *    [[ObjectStoreCommitPublisher]] over the staged-upload protocol
  *    of [[DirObjectStore]] (bytes travel before the conditional
  *    commit; the conflict surface is a typed 412 result, translated
  *    to this exception only at the publisher boundary). The store
  *    emulation is a local directory — the HTTP client itself stays
  *    out of this zero-egress build — and the spec races it with
  *    writers in separate threads AND separate JVMs.
  */
trait CommitPublisher {
  def publish(target: Path, body: String): Unit
}

/** Default single-filesystem publisher: stage the body to a temp file
  * in the manifest directory, then hard-link it to the final name.
  * The link is the commit point — atomic no-clobber on every POSIX
  * filesystem (EEXIST when a racing writer already won the version).
  * The temp file is always removed: on the win path after linking,
  * on the loss path before rethrowing. */
object LinkCommitPublisher extends CommitPublisher {
  def publish(target: Path, body: String): Unit = {
    val tmp = Files.createTempFile(target.getParent, s".${target.getFileName}-", ".tmp")
    Files.writeString(tmp, body)
    try Files.createLink(target, tmp)
    catch { case e: java.nio.file.FileAlreadyExistsException =>
      Files.deleteIfExists(tmp)
      throw e
    }
    Files.delete(tmp)
  }
}
