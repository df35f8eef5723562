package graft.sources

import java.nio.file.{Files, Path, Paths}

/** A minimal object-store client surface — the exact subset of an
  * S3-style API the snapshot commit protocol needs, shaped like the
  * HTTP reality rather than like a filesystem:
  *
  *  - `putIfNoneMatch` is the conditional PUT (`If-None-Match: *`):
  *    it returns a TYPED result — `Created(etag)` or
  *    `PreconditionFailed(winnerEtag)` — never a filesystem
  *    exception. 412 is a normal response in HTTP, not a throw; a
  *    client that catches `FileAlreadyExistsException` from its store
  *    has baked a POSIX assumption into the protocol layer.
  *  - bytes travel BEFORE the conditional commit (the multipart-
  *    upload shape): the body is staged under `.staging/`, and the
  *    store's internal atomic primitive fires once, on complete
  *    content — an object is never visible half-written, exactly the
  *    S3 visibility contract.
  *  - `get` lets a loser fetch the winner's object through the store
  *    API (read-your-conflict), and etags identify versions.
  *
  * [[DirObjectStore]] emulates the store over a local directory: its
  * INTERNAL atomic primitive is a hard link of the fully-staged body
  * (standing in for the store's internal compare-and-swap — some
  * primitive must be atomic, and in the real service it lives behind
  * the HTTP boundary; link is atomic across processes, so the
  * emulation holds for racing writers in separate JVMs, which the
  * spec proves). What matters is that NOTHING above this class sees
  * EEXIST: the client surface is 412-shaped end to end.
  */
final class DirObjectStore(root: Path) {
  import DirObjectStore._

  private val staging = root.resolve(".staging")

  private def keyPath(key: String): Path = {
    val p = root.resolve(key).normalize()
    require(p.startsWith(root), s"key escapes the store root: $key")
    p
  }

  /** Conditional PUT of `body` at `key` (`If-None-Match: *`).
    * Full-content staging first, then one atomic commit; returns
    * `PreconditionFailed` with the current winner's etag when an
    * object already exists. Never throws for the exists case. */
  def putIfNoneMatch(key: String, body: Array[Byte]): PutResult = {
    val target = keyPath(key)
    Files.createDirectories(target.getParent)
    Files.createDirectories(staging)
    // upload phase: the bytes are durable in the staging area before
    // the commit fires (multipart-upload shape); the staged file is
    // private to this writer, so no atomicity is needed here
    val tmp = Files.createTempFile(staging, "put-", ".part")
    try {
      Files.write(tmp, body)
      // commit phase: the store's one internal atomic primitive
      try { Files.createLink(target, tmp); Created(etagOf(body)) }
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          PreconditionFailed(head(key).getOrElse("unknown"))
      }
    } finally Files.deleteIfExists(tmp)
  }

  /** GET: the object's bytes, or None (404). */
  def get(key: String): Option[Array[Byte]] = {
    val p = keyPath(key)
    if (Files.isRegularFile(p)) Some(Files.readAllBytes(p)) else None
  }

  /** HEAD: the object's etag, or None (404). */
  def head(key: String): Option[String] =
    get(key).map(etagOf)
}

object DirObjectStore {
  sealed trait PutResult
  final case class Created(etag: String) extends PutResult
  final case class PreconditionFailed(winnerEtag: String) extends PutResult

  /** Content etag — a stable hash of the bytes, the S3 convention. */
  def etagOf(body: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(body).map("%02x".format(_)).mkString
  }
}

/** [[CommitPublisher]] over an object store's conditional PUT — the
  * production shape for lakehouse tables on S3-style storage (the
  * real service swaps [[DirObjectStore]] for an HTTP client with the
  * same three calls; zero-egress build, so the HTTP client itself
  * stays out — the PROTOCOL is what this proves, against a store
  * whose failure mode is a 412 response, not an EEXIST errno).
  *
  * The 412 → [[java.nio.file.FileAlreadyExistsException]] translation
  * happens HERE, at the protocol boundary, because that exception is
  * the optimistic-concurrency signal [[Snapshots]]' retry/abort path
  * keys on — the point of the seam is that Snapshots needs exactly
  * one bit ("someone else won this version") and no knowledge of how
  * the store says it. */
final class ObjectStoreCommitPublisher(store: DirObjectStore, root: Path)
    extends CommitPublisher {
  def publish(target: Path, body: String): Unit = {
    val key = root.relativize(target.normalize()).toString
    store.putIfNoneMatch(key, body.getBytes("UTF-8")) match {
      case DirObjectStore.Created(_) => ()
      case DirObjectStore.PreconditionFailed(_) =>
        throw new java.nio.file.FileAlreadyExistsException(target.toString)
    }
  }
}

object ObjectStoreCommitPublisher {
  /** Publisher rooted at `root`; manifest paths under `root` map to
    * store keys by relativization, so [[Snapshots]] needs no path
    * changes to run on the emulated store. */
  def rooted(root: String): ObjectStoreCommitPublisher = {
    val r = Paths.get(root).toAbsolutePath.normalize()
    new ObjectStoreCommitPublisher(new DirObjectStore(r), r)
  }
}
