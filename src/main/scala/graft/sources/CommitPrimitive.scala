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
  *  - [[ConditionalPutCommitPrimitive]]: a TRUE conditional put
  *    (atomic compare-and-insert) with NO lease and NO time-based
  *    sweep — the in-process model of what an object-store deployment
  *    implements with the store's native conditional write:
  *    S3 `PutObject If-None-Match: *` (no sweep needed — a crashed
  *    claimant's marker is deleted by lifecycle policy or by the
  *    winner of the NEXT slot observing the pointer has moved past
  *    it), GCS `x-goog-if-generation-match: 0`, Azure
  *    `If-None-Match: *`. With a true conditional put, `verifyClaim`
  *    re-reads the slot and compares the token — same contract,
  *    no time-based assumption anywhere. Selected per session via
  *    `spark.graft.store.commitPrimitive = conditional-put`.
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
  * filesystem calls after already proving liveness at the verify — a
  * true conditional put closes it STRUCTURALLY, because with no lease
  * nothing ever sweeps a live claim, so a claim that passes the verify
  * cannot change hands before the flip ([[ConditionalPutCommitPrimitive]]
  * proves the trait contract is sufficient without any time-based
  * assumption; SourcesSpec drives the same claim-pause-sweep-resume
  * races through both implementations). */
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
        // deleting the new owner's live generation; see transact).
        // "Not committed" must NOT be decided from the cur0 snapshot
        // alone: a lease-expired-but-alive claimant can pass its
        // verify and FLIP this slot in after cur0 was read, making
        // the strand the live committed generation. Check the
        // generation's own _COMMITTED marker (stamped at flip time)
        // and re-read the pointer immediately before deleting — the
        // remaining exposure collapses back to the verify→flip
        // instruction gap the trait doc acknowledges, not a whole
        // snapshot-to-sweep window.
        if (!committedPast && expired) {
          val gen = new java.io.File(schemaDir, v)
          val committedMeanwhile =
            new java.io.File(gen, "_COMMITTED").exists() ||
              currentVersion().exists(_ >= v)
          if (!committedMeanwhile) rmTree(gen)
        }
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

  /** Token-checked delete. NOT atomic on a plain filesystem (verify,
    * then delete): between the two calls a sweeper can delete this
    * marker and a new claimant re-create it, and the delete then
    * removes the NEW owner's claim. Consequence bound: the new owner
    * fails its own verify at the flip and rebases — claim churn, never
    * a lost update or double commit (the pointer flip is still fenced).
    * An atomic-rename repair would open a worse window (the marker
    * name transiently free invites a THIRD claim, and the rename-back
    * can clobber it), so the window is documented instead;
    * [[ConditionalPutCommitPrimitive.release]] is genuinely atomic
    * (compare-and-remove), which is the upgrade path. */
  override def release(
      schemaDir: java.io.File, version: String, token: String): Unit =
    if (verifyClaim(schemaDir, version, token))
      marker(schemaDir, version).delete()
}

/** [[CommitPrimitive]] over a TRUE conditional put — an in-process
  * atomic compare-and-insert, modeling exactly what S3
  * `If-None-Match: *` / GCS `x-goog-if-generation-match: 0` / a
  * server-side-MVCC store (the reference's Postgres/Redis backends,
  * `nexus/backends/stores/postgres_store.py`) give a multi-writer
  * commit: first PUT of a slot wins, verification re-reads the slot,
  * release is an atomic token-checked remove.
  *
  * NO lease, NO time-based sweep — the property that closes the
  * filesystem impl's verify→flip window structurally: a claim above
  * the committed pointer is never touched by another writer, so a
  * claimant that passes [[verifyClaim]] cannot lose the slot before
  * its flip. Dead claims are collected by the pointer itself: a slot
  * at/below the committed pointer can never flip (winners move the
  * pointer BEFORE releasing), so claimants drop such entries on their
  * way in — the in-process analog of "the winner of the next slot
  * observes the pointer moved past the stale object". A claimant that
  * CRASHES while holding an above-pointer claim blocks that slot until
  * [[expire]] (the lifecycle-policy / operator-action analog; a real
  * S3 deployment sets an object-lifecycle age far above any pause a
  * live writer intends to survive) — racing writers see bounded claim
  * losses and surface [[java.util.ConcurrentModificationException]]
  * from transact, never silent divergence.
  *
  * Claims are JVM-global (keyed by the schema dir's canonical path +
  * slot), shared across [[ResultStore]] instances over the same root —
  * the single-authority shape of the object store being modeled.
  * Selected via `spark.graft.store.commitPrimitive = conditional-put`. */
object ConditionalPutCommitPrimitive extends CommitPrimitive {

  private val claims =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def key(schemaDir: java.io.File, version: String): String =
    schemaDir.getCanonicalPath + "#" + version

  override def tryClaim(
      schemaDir: java.io.File,
      version: String,
      base: Option[String],
      currentVersion: () => Option[String],
      leaseMs: Long): Option[String] = {
    val cur0 = currentVersion()
    // dead-claim collection: slots at/below the committed pointer are
    // unwinnable by definition. This is the ONLY sweeping that exists
    // here — live above-pointer claims are untouchable (no lease).
    val prefix = schemaDir.getCanonicalPath + "#"
    claims.keySet.removeIf(k =>
      k.startsWith(prefix) && cur0.exists(_ >= k.stripPrefix(prefix)))
    val token = java.util.UUID.randomUUID().toString
    if (claims.putIfAbsent(key(schemaDir, version), token) == null) {
      // same post-claim pointer re-check as the filesystem impl: a
      // create succeeding on a RECYCLED slot name means this writer
      // is a full generation behind
      if (currentVersion() == base) Some(token)
      else { release(schemaDir, version, token); None }
    } else None
  }

  override def verifyClaim(
      schemaDir: java.io.File, version: String, token: String): Boolean =
    token == claims.get(key(schemaDir, version))

  /** Atomic token-checked remove — the release the filesystem impl
    * can only approximate (its verify-then-delete window is documented
    * there). A stale releaser whose slot was re-claimed removes
    * nothing. */
  override def release(
      schemaDir: java.io.File, version: String, token: String): Unit = {
    claims.remove(key(schemaDir, version), token)
    ()
  }

  /** Lifecycle-policy / operator-action analog: unconditionally drop a
    * CRASHED claimant's claim and its strand generation directory (if
    * the slot never committed), freeing the slot. The deployment
    * contract is that this fires only at ages far beyond any pause a
    * live writer intends to survive — the race spec uses it to model
    * crash recovery, never to model sweeping a live writer. */
  def expire(schemaDir: java.io.File, version: String): Unit = {
    val gen = new java.io.File(schemaDir, version)
    if (!new java.io.File(gen, "_COMMITTED").exists() && gen.isDirectory) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
        ()
      }
      rm(gen)
    }
    claims.remove(key(schemaDir, version))
    ()
  }
}

/** [[CommitPrimitive]] over an S3-COMPATIBLE HTTP endpoint — the
  * networked form of [[ConditionalPutCommitPrimitive]], speaking the
  * store's native conditional-write verbs:
  *
  *  - claim:  `PUT <endpoint>/<url-encoded schema root>/_TXN-<slot>`
  *    with `If-None-Match: *` and the fencing token as the body —
  *    exactly one racing PUT lands (S3 conditional write; GCS is the
  *    same shape via `x-goog-if-generation-match: 0`); 412/409 means
  *    the slot is held and the caller rebases.
  *  - verify: `GET` the slot object and compare the body to the token.
  *  - release: `DELETE` with `If-Match: <ETag of OUR claim PUT>` (the
  *    S3 conditional delete) — atomic, a stale releaser can never
  *    remove a foreign claim. A store lacking conditional DELETE falls
  *    back to verify-then-delete with the churn bound documented on
  *    [[FilesystemCommitPrimitive.release]].
  *
  * NO lease and NO sweeping, so the verify→flip window-closure
  * argument of [[ConditionalPutCommitPrimitive]] holds verbatim; a
  * CRASHED claimant's object frees via bucket lifecycle policy (the
  * spec models it with an unconditional DELETE + strand removal).
  * One instance per endpoint (connection pool + claim-ETag cache);
  * selected via `spark.graft.store.commitPrimitive = <endpoint URL>`.
  * The spec drives it against an in-process JDK HttpServer
  * implementing the same conditional semantics, including injected
  * faults (5xx bursts, responses dropped after the mutation applied).
  *
  * Fault policy (what separates "models S3" from "survives S3"):
  *
  *  - Transport faults ([[java.io.IOException]]) and 5xx responses
  *    get a bounded in-call retry with exponential backoff — a blip
  *    must not crash `transact` past the 12-attempt rebase loop built
  *    to absorb exactly these disturbances. PERSISTENT faults then
  *    surface as the exception (store unavailable ≠ "slot taken" ≠
  *    "fenced": a verify that answered false on a network fault would
  *    silently strand the already-moved generation, so verify is
  *    retry-then-THROW). [[InterruptedException]] propagates
  *    immediately with the interrupt flag restored — cancellation is
  *    not a fault to absorb.
  *  - Lost 201: a claim PUT whose success response dies on the wire
  *    is retried and 412s against the writer's OWN object. A 412 is
  *    therefore never final until a GET proves the slot holds a
  *    FOREIGN token — if it holds ours, the claim is won.
  *  - Strand recovery: a claimant that crashed between its
  *    generation-dir move and the pointer flip leaves the dir on the
  *    data filesystem while bucket lifecycle collects only the claim
  *    OBJECT. The next claimant of that slot — who, holding the claim
  *    object, is the slot's sole live writer — sweeps the uncommitted
  *    strand (same `_COMMITTED` + fresh-pointer re-check as
  *    [[FilesystemCommitPrimitive]]'s claim-phase sweep) instead of
  *    dying on `FileAlreadyExistsException` forever.
  *  - `release` is best-effort cleanup of an already-decided commit:
  *    a persistent fault there is swallowed, the claim object is left
  *    for lifecycle collection, and the local tag entry is dropped
  *    either way (claim tags are keyed per SLOT and cleared on every
  *    release path, so the map is bounded by the claims this JVM
  *    currently holds — fenced zombies and re-claims do not leak). */
final class HttpConditionalPutCommitPrimitive(
    endpoint: String,
    client: java.net.http.HttpClient =
      java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofSeconds(10)).build())
    extends CommitPrimitive {
  import java.net.http.{HttpRequest, HttpResponse}

  // "<token> <ETag of OUR claim PUT>" keyed per SLOT — what makes
  // release a true conditional delete instead of verify-then-delete.
  // Per-slot (not slot#token) so a re-claim REPLACES a stale entry
  // and release removes it on every outcome: bounded by live claims.
  private val claimTags =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def slotUri(schemaDir: java.io.File, version: String) =
    java.net.URI.create(endpoint.stripSuffix("/") + "/" +
      java.net.URLEncoder.encode(schemaDir.getCanonicalPath, "UTF-8") +
      "/_TXN-" + version)

  /** Bounded-retry send: up to 4 attempts, 50/100/200 ms backoff, on
    * transport faults and 5xx (the idempotent-verb contract: GET and
    * DELETE-If-Match trivially; PUT-If-None-Match because a repeat of
    * a LANDED put can only 412, which [[tryClaim]] resolves with a
    * token-compare GET). Persistent 5xx returns the response for the
    * caller's status dispatch; persistent transport faults rethrow. */
  private def send(req: HttpRequest): HttpResponse[String] = {
    var lastIo: java.io.IOException = null
    var lastResp: HttpResponse[String] = null
    var attempt = 0
    while (attempt < 4) {
      attempt += 1
      try {
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() < 500) return resp
        lastResp = resp
      } catch {
        case ie: InterruptedException =>
          Thread.currentThread().interrupt()
          throw ie
        case io: java.io.IOException => lastIo = io
      }
      if (attempt < 4) Thread.sleep(50L << (attempt - 1))
    }
    if (lastResp != null) lastResp else throw lastIo
  }

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    f.delete()
    ()
  }

  /** Post-win bookkeeping shared by the 201 and lost-201 paths: record
    * the claim ETag, sweep a crashed predecessor's strand generation
    * dir, and run the recycled-slot pointer re-check every impl does. */
  private def claimWon(
      schemaDir: java.io.File,
      version: String,
      base: Option[String],
      currentVersion: () => Option[String],
      slot: java.net.URI,
      token: String,
      etag: Option[String]): Option[String] = {
    claimTags.put(slot.toString, token + " " + etag.getOrElse(""))
    // strand recovery: we HOLD the claim object, so no live writer can
    // be mid-commit on this slot — an existing UNCOMMITTED generation
    // dir is a crashed predecessor's strand whose claim object bucket
    // lifecycle already collected. Without this sweep every future
    // attempt dies on Files.move(FileAlreadyExists) and the schema
    // wedges until manual cleanup. Same _COMMITTED + fresh-pointer
    // re-check as FilesystemCommitPrimitive immediately before rmTree.
    val gen = new java.io.File(schemaDir, version)
    if (gen.isDirectory &&
        !new java.io.File(gen, "_COMMITTED").exists() &&
        !currentVersion().exists(_ >= version))
      rmTree(gen)
    if (currentVersion() == base) Some(token)
    else { release(schemaDir, version, token); None }
  }

  override def tryClaim(
      schemaDir: java.io.File,
      version: String,
      base: Option[String],
      currentVersion: () => Option[String],
      leaseMs: Long): Option[String] = {
    val slot = slotUri(schemaDir, version)
    val token = java.util.UUID.randomUUID().toString
    val resp = send(HttpRequest.newBuilder(slot)
      .header("If-None-Match", "*")
      .PUT(HttpRequest.BodyPublishers.ofString(token)).build())
    resp.statusCode() match {
      case 200 | 201 =>
        claimWon(schemaDir, version, base, currentVersion, slot, token,
          toScala(resp.headers().firstValue("ETag")))
      case 412 | 409 =>
        // never final on its face: OUR earlier PUT may have landed
        // with the 201 lost on the wire, making the in-call re-PUT
        // 412 against our own claim. Only a FOREIGN token refuses.
        val got = send(HttpRequest.newBuilder(slot).GET().build())
        if (got.statusCode() == 200 && got.body() == token)
          claimWon(schemaDir, version, base, currentVersion, slot, token,
            toScala(got.headers().firstValue("ETag")))
        else None // held by another writer (or store flapping) — rebase
      case s => throw new java.io.IOException(
        s"claim PUT $slot -> HTTP $s")
    }
  }

  private def toScala(o: java.util.Optional[String]): Option[String] =
    if (o.isPresent) Some(o.get) else None

  /** Retry-then-THROW on store trouble: answering false on a fault
    * would be read as "fenced" by the committer and silently strand
    * its already-moved generation. Only an authoritative 404 (claim
    * gone) or a foreign token answers false. */
  override def verifyClaim(
      schemaDir: java.io.File, version: String, token: String): Boolean = {
    val resp = send(HttpRequest.newBuilder(slotUri(schemaDir, version))
      .GET().build())
    resp.statusCode() match {
      case 200 => resp.body() == token
      case 404 => false
      case s => throw new java.io.IOException(
        s"verify GET ${slotUri(schemaDir, version)} -> HTTP $s")
    }
  }

  /** Best-effort by design (see class doc): the commit outcome is
    * already decided when release runs, so a persistent store fault is
    * swallowed — the claim object is left for lifecycle collection
    * (dead: at/below the pointer, or swept as a strand by the slot's
    * next claimant) rather than failing a commit that succeeded. The
    * local tag entry is dropped on every path. */
  override def release(
      schemaDir: java.io.File, version: String, token: String): Unit = {
    val slot = slotUri(schemaDir, version)
    val entry = Option(claimTags.get(slot.toString))
      .filter(_.startsWith(token + " "))
    try entry match {
      case Some(v) =>
        val etag = v.drop(token.length + 1)
        if (etag.nonEmpty) {
          send(HttpRequest.newBuilder(slot)
            .header("If-Match", etag).DELETE().build())
          () // 204 released; 412 foreign claim untouched; 404 gone
        } else if (verifyClaim(schemaDir, version, token)) {
          send(HttpRequest.newBuilder(slot).DELETE().build())
          ()
        }
      case None =>
        // no recorded ETag (resumed process): the documented
        // verify-then-delete fallback — churn-bounded, never a lost
        // update (see FilesystemCommitPrimitive.release)
        if (verifyClaim(schemaDir, version, token)) {
          send(HttpRequest.newBuilder(slot).DELETE().build())
          ()
        }
    } catch {
      case _: java.io.IOException => ()
    } finally entry.foreach { v =>
      claimTags.remove(slot.toString, v)
      ()
    }
  }
}

/** Per-endpoint cache of [[HttpConditionalPutCommitPrimitive]]
  * instances — one connection pool and claim-ETag map per endpoint,
  * shared by every [[ResultStore]] in the JVM. */
object HttpConditionalPutCommitPrimitive {
  private val byEndpoint = new java.util.concurrent.ConcurrentHashMap[
    String, HttpConditionalPutCommitPrimitive]()
  def forEndpoint(endpoint: String): HttpConditionalPutCommitPrimitive =
    byEndpoint.computeIfAbsent(endpoint,
      e => new HttpConditionalPutCommitPrimitive(e))
}
