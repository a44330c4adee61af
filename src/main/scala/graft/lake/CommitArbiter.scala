package graft.lake

import java.io.IOException

import org.apache.hadoop.fs.{FileSystem, Path}

/** The pluggable commit-arbitration seam — who decides which writer
  * wins a manifest version. `IncrementalTable`'s publish path stages
  * the manifest at a writer-unique `tmp` and asks the arbiter to make
  * it `dest` iff `dest` does not already exist; everything above the
  * seam (retry loops, rebase, conflict typing) is storage-agnostic.
  *
  * This is the analog of Delta's `LogStore` interface (the reference
  * platform, `scd_handler.py`, inherits Delta's): one implementation
  * per storage contract —
  *
  *  - [[LinkCasArbiter]]: local filesystems, `link(2)` create-if-absent
  *    (an atomic CAS the racy exists-then-rename cannot provide);
  *  - [[RenameArbiter]]: stores whose rename is atomic and fails on an
  *    existing destination (HDFS semantics);
  *  - [[ExternalCasArbiter]]: object stores with NO atomic
  *    create-if-absent on the store itself — an external
  *    [[ExternalCas]] (DynamoDB-style conditional put, or S3's
  *    `If-None-Match: *`) owns the race, and the store write happens
  *    only after the CAS is won.
  *
  * Deployments wire a custom arbiter per scheme or per table prefix via
  * [[CommitArbiters.register]] / [[CommitArbiters.registerPath]] before
  * touching the table (the same shape as Delta's per-scheme
  * `spark.delta.logStore.<scheme>.impl` configuration).
  */
trait CommitArbiter {

  /** Short name, quoted by [[CommitConflictException]] messages so a
    * conflict names the protocol that arbitrated it.
    */
  def name: String

  /** Publish `tmp` as `dest` iff `dest` does not exist.
    *
    * Contract (the whole commit protocol rests on these):
    *  - returns `true` iff THIS call created `dest` (the caller's
    *    commit won); `tmp` is consumed (removal is best-effort — a
    *    leftover tmp is invisible garbage, never corruption);
    *  - returns `false` iff `dest` already existed (the caller lost
    *    the race); `dest` is untouched and `tmp` still exists for the
    *    caller to clean up;
    *  - MUST NEVER replace an existing `dest` — a clobbered manifest
    *    is a lost update, the one outcome this seam exists to prevent;
    *  - throws on environmental failure (I/O error that is neither a
    *    win nor a loss) — the commit fails loudly rather than guess.
    *
    * Callers may serialize same-JVM racers around this (the per-table
    * publish lock); the arbiter is what makes CROSS-PROCESS racers
    * safe.
    */
  def publish(fs: FileSystem, tmp: Path, dest: Path): Boolean
}

/** `link(2)` create-if-absent CAS for local filesystems. POSIX rename
  * overwrites and Hadoop's ChecksumFileSystem "rename" is
  * check-then-act, so the only local atomic create-if-absent is a hard
  * link (pinned cross-process by `CommitRaceSpec`'s two-JVM race).
  * Mounts without hard links (FAT/FUSE/some NFS) degrade to
  * exists+rename — decided by [[LinkCasArbiter.hardLinksWork]], a real
  * capability PROBE, never by matching locale-dependent strerror text.
  */
object LinkCasArbiter extends CommitArbiter {

  val name = "link-cas"

  def publish(fs: FileSystem, tmp: Path, dest: Path): Boolean = {
    val destP = java.nio.file.Paths.get(dest.toUri.getPath)
    val tmpP = java.nio.file.Paths.get(tmp.toUri.getPath)
    // Tri-state: Some(won) when the CAS answered; None when this mount
    // cannot link at all and the rename degrade applies.
    val linked: Option[Boolean] =
      try {
        java.nio.file.Files.createLink(destP, tmpP)
        Some(true)
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => Some(false)
        case _: UnsupportedOperationException => None
        case e: IOException =>
          if (!hardLinksWork(destP.getParent)) None
          else {
            // links work here, so this is a real I/O failure of an
            // undecided commit: clean the stage and fail loudly —
            // degrading to exists+rename could REPLACE a concurrent
            // winner's manifest
            try fs.delete(tmp, false) catch { case _: IOException => () }
            throw e
          }
      }
    linked match {
      case Some(true) =>
        // The commit IS the link that just landed at dest; tmp is now
        // merely a second hard link to the same committed inode. A
        // failed tmp cleanup must therefore never read as a failed
        // commit — retrying callers would double-commit the batch.
        try fs.delete(tmp, false) catch { case _: IOException => () }
        true
      case Some(false) => false
      case None => !fs.exists(dest) && fs.rename(tmp, dest)
    }
  }

  /** Can `dir`'s mount create hard links at all? Decided by one real
    * probe: write an empty file, then `link(2)` it. A result is cached
    * per directory ONLY when it is definitive — links worked, or the
    * probe write succeeded and only the link failed (a capability
    * failure of the mount, not a flake: the write just proved I/O to
    * the directory is healthy). If even the probe WRITE fails, nothing
    * can be concluded — nothing is cached and the error propagates, so
    * a transient outage never permanently degrades the commit CAS to
    * the racy exists+rename (the silent degradation this probe exists
    * to prevent).
    */
  private val linkProbeCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  private[lake] def hardLinksWork(dir: java.nio.file.Path): Boolean =
    linkProbeCache.computeIfAbsent(dir.toString, _ => {
      val nonce = java.util.UUID.randomUUID().toString.take(8)
      val a = dir.resolve(s"._linkprobe_$nonce")
      val b = dir.resolve(s"._linkprobe_$nonce.l")
      var wrote = false
      try {
        java.nio.file.Files.write(a, Array.emptyByteArray)
        wrote = true
        java.nio.file.Files.createLink(b, a)
        true
      } catch {
        case _: UnsupportedOperationException | _: SecurityException => false
        case e: IOException if !wrote => throw e // undecided: not cached
        case _: IOException => false
      } finally {
        Seq(b, a).foreach(p =>
          try java.nio.file.Files.deleteIfExists(p)
          catch { case _: IOException => () })
      }
    })
}

/** For stores whose `rename` is atomic and refuses an existing
  * destination — HDFS's contract. The exists check is advisory (fast
  * loss detection); the rename itself is the arbiter.
  */
object RenameArbiter extends CommitArbiter {
  val name = "atomic-rename"
  def publish(fs: FileSystem, tmp: Path, dest: Path): Boolean =
    !fs.exists(dest) && fs.rename(tmp, dest)
}

/** The external conditional-put a deployment supplies for object
  * stores: atomically record `token` as the committer of `key` iff no
  * committer is recorded, returning whether THIS call recorded it.
  * DynamoDB `attribute_not_exists` puts, S3 `If-None-Match: *`, etcd
  * txns and ZooKeeper ephemeral-create all implement this directly.
  * The CAS entry for a key must outlive the manifest it arbitrates
  * (vacuum never deletes log heads, so there is no re-use of keys).
  */
trait ExternalCas {
  def putIfAbsent(key: String, token: String): Boolean
}

/** In-process [[ExternalCas]] — the mock object-store CAS the specs
  * race against, and the reference semantics an S3/GCS deployment's
  * implementation must match.
  */
final class InMemoryCas extends ExternalCas {
  private val entries =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  def putIfAbsent(key: String, token: String): Boolean =
    entries.putIfAbsent(key, token) == null
  def owner(key: String): Option[String] = Option(entries.get(key))
}

/** Object-store commit arbitration: the [[ExternalCas]] owns the race
  * on the manifest KEY; only the CAS winner touches the store, so the
  * store write may be a plain (even eventually-consistent) put — the
  * S3A/DynamoDB LogStore design. A loser's `tmp` stays for the caller
  * to clean; a winner whose store write then fails throws (the CAS
  * entry deliberately stays: that key's commit is poisoned-pending and
  * a retry under a NEW version is the safe path — exactly Delta's
  * behavior when the winning writer dies between CAS and write).
  */
final class ExternalCasArbiter(cas: ExternalCas) extends CommitArbiter {
  val name = "external-cas"
  def publish(fs: FileSystem, tmp: Path, dest: Path): Boolean = {
    val token = java.util.UUID.randomUUID().toString
    if (!cas.putIfAbsent(dest.toString, token)) false
    else {
      // we own dest exclusively now — rename cannot race anything
      if (!fs.rename(tmp, dest))
        throw new IOException(
          s"commit CAS won but store write failed for $dest (arbiter $name)")
      true
    }
  }
}

/** Arbiter wiring — resolution order for a table at `path` with
  * filesystem `scheme`:
  *  1. the longest registered PATH-PREFIX override ([[registerPath]]),
  *  2. the registered SCHEME override ([[register]]),
  *  3. defaults: `file` → [[LinkCasArbiter]], else [[RenameArbiter]].
  *
  * Register an [[ExternalCasArbiter]] for `s3`/`gs`/`abfs` schemes
  * BEFORE the first commit from this JVM — those stores' rename is
  * copy+delete (not atomic, overwrites), so the default RenameArbiter
  * is NOT safe there and real deployments must supply the CAS.
  */
object CommitArbiters {
  private val byScheme =
    new java.util.concurrent.ConcurrentHashMap[String, CommitArbiter]()
  private val byPrefix =
    new java.util.concurrent.ConcurrentHashMap[String, CommitArbiter]()

  def register(scheme: String, arbiter: CommitArbiter): Unit =
    byScheme.put(scheme, arbiter)

  /** Scoped override (tests, per-table wiring): applies to any table
    * whose path starts with `prefix`.
    */
  def registerPath(prefix: String, arbiter: CommitArbiter): Unit =
    byPrefix.put(prefix, arbiter)

  def unregister(scheme: String): Unit = byScheme.remove(scheme)
  def unregisterPath(prefix: String): Unit = byPrefix.remove(prefix)

  private[lake] def forTable(path: String, scheme: String): CommitArbiter = {
    val prefixHit = {
      var best: Option[(String, CommitArbiter)] = None
      byPrefix.forEach { (p, a) =>
        if (path.startsWith(p) && best.forall(_._1.length < p.length))
          best = Some(p -> a)
      }
      best.map(_._2)
    }
    prefixHit
      .orElse(Option(byScheme.get(scheme)))
      .getOrElse(if (scheme == "file") LinkCasArbiter else RenameArbiter)
  }
}
