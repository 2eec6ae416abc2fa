package graft.sources

/** The conditional-put commit primitive behind [[ResultStore.transact]]
  * — the ONE operation a multi-writer optimistic commit needs from its
  * storage: atomically claim the next commit slot such that exactly one
  * writer wins, with a fencing check a resumed-after-pause writer fails
  * instead of double-committing.
  *
  * This is the documented Delta/Iceberg boundary made swappable: the
  * lake protocol is "write data files anywhere, then conditionally put
  * the next log record" — Delta's `_delta_log/N.json` put-if-absent,
  * Iceberg's metadata-pointer compare-and-swap. Implementations:
  *
  *  - [[FilesystemCommitPrimitive]] (default): an atomic `CREATE_NEW`
  *    of a per-slot marker file carrying a per-claim fencing TOKEN,
  *    plus a lease sweep for crashed claimants. Correct on any
  *    filesystem with atomic create (local, NFSv4, HDFS).
  *  - An object-store deployment implements this trait with the
  *    store's native conditional write and DROPS the lease entirely:
  *    S3 `PutObject If-None-Match: *` (no sweep needed — a crashed
  *    claimant's marker is deleted by lifecycle policy or by the
  *    winner of the NEXT slot observing the pointer has moved past
  *    it), GCS `x-goods-if-generation-match: 0`, Azure
  *    `If-None-Match: *`. With a true conditional put, `verifyClaim`
  *    can re-read the object and compare the token — same contract,
  *    no time-based assumption anywhere.
  *
  * Fencing contract (what closes the double-claim window the lease
  * alone leaves open): `tryClaim` returns a TOKEN unique to this
  * claim; the committer re-checks `verifyClaim(token)` immediately
  * before publishing its pointer flip. A claimant that was paused past
  * its lease, swept, and superseded finds the marker gone or carrying
  * the new owner's token, FAILS the verify, and rebases — its staged
  * write is never published, so no lost update and no double commit.
  * The residual window is the verify→flip instruction gap itself
  * (microseconds, vs the lease's tens of seconds): entering it
  * requires a writer to pause past the LEASE between two adjacent
  * filesystem calls after already proving liveness at the verify — an
  * object-store conditional put on the pointer itself is the
  * principled fix and slots in through this trait. */
trait CommitPrimitive {

  /** Attempt to claim commit slot `version` on top of committed
    * generation `base`. Returns the fencing token on success; None
    * when another writer holds (or won) the slot, or the pointer
    * moved off `base` — the caller rebases and retries.
    * `currentVersion` re-reads the committed pointer (the
    * implementation must re-check it AFTER a successful claim: a
    * create succeeding on a RECYCLED slot name means this writer is a
    * full generation behind). `leaseMs` bounds how long a crashed
    * claimant can hold a slot before it is swept. */
  def tryClaim(
      schemaDir: java.io.File,
      version: String,
      base: Option[String],
      currentVersion: () => Option[String],
      leaseMs: Long): Option[String]

  /** Whether `token` still owns the claim on `version` — the fencing
    * check, called immediately before the pointer flip. False means
    * this claimant was swept (lease expiry while paused) and the slot
    * was re-claimed: it must abandon the commit and rebase. */
  def verifyClaim(
      schemaDir: java.io.File, version: String, token: String): Boolean

  /** Release the claim IF `token` still owns it (a token-checked
    * delete — releasing after being swept must not delete the new
    * owner's claim). Called after a successful flip, and on the
    * lost-pointer-check path of a claim that never committed. */
  def release(
      schemaDir: java.io.File, version: String, token: String): Unit
}

/** [[CommitPrimitive]] over an atomic-create filesystem: the claim is
  * `CREATE_NEW` of `_TXN-<version>` carrying a UUID fencing token;
  * dead markers (slot at/below the committed pointer — the winner
  * flips BEFORE releasing — or older than the lease) are swept before
  * each claim attempt. See the trait doc for the object-store swap. */
object FilesystemCommitPrimitive extends CommitPrimitive {

  private def marker(schemaDir: java.io.File, version: String) =
    new java.io.File(schemaDir, s"_TXN-$version")

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    f.delete()
    ()
  }

  override def tryClaim(
      schemaDir: java.io.File,
      version: String,
      base: Option[String],
      currentVersion: () => Option[String],
      leaseMs: Long): Option[String] = {
    val cur0 = currentVersion()
    Option(schemaDir.listFiles((_, n) => n.startsWith("_TXN-v")))
      .getOrElse(Array.empty).foreach { f =>
        val v = f.getName.stripPrefix("_TXN-")
        val committedPast = cur0.exists(_ >= v)
        val expired =
          (System.currentTimeMillis() - f.lastModified()) > leaseMs
        // a lease-expired claimant ABOVE the pointer left a strand
        // version directory too (crash between move and flip): sweep
        // it here, in the claim phase — the COMMIT phase must never
        // delete an existing target (a resumed zombie would be
        // deleting the new owner's live generation; see transact)
        if (!committedPast && expired)
          rmTree(new java.io.File(schemaDir, v))
        if (committedPast || expired) { f.delete(); () }
      }
    val token = java.util.UUID.randomUUID().toString
    try {
      java.nio.file.Files.write(marker(schemaDir, version).toPath,
        token.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE_NEW)
      if (currentVersion() == base) Some(token)
      else { release(schemaDir, version, token); None }
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => None
    }
  }

  override def verifyClaim(
      schemaDir: java.io.File, version: String, token: String): Boolean =
    try new String(
      java.nio.file.Files.readAllBytes(marker(schemaDir, version).toPath),
      java.nio.charset.StandardCharsets.UTF_8) == token
    catch { case _: java.io.IOException => false }

  override def release(
      schemaDir: java.io.File, version: String, token: String): Unit =
    if (verifyClaim(schemaDir, version, token))
      marker(schemaDir, version).delete()
}
