package graft.ops

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Filesystem plumbing for the materialized index stores (spec markers,
  * tombstone sidecars, compaction listings and swaps), resolved through the
  * store path's HADOOP FileSystem — the same resolution Spark's own
  * readers/writers use — so every maintenance operation runs on any store
  * Spark can write (HDFS, S3A, local) instead of silently requiring
  * `java.nio.file` local paths. Before this module the data-plane writes
  * were already Hadoop-FS (`IndexManifests.write`, the bucket deletes) while
  * the maintenance plane (`compactCodes`/`compactTable` listings, marker
  * files) resolved locally: on an object store compaction could not list
  * and spec markers could not be read, even though every query worked —
  * the one place the 100 TB posture was false in code.
  *
  * Marker writes go through write-to-temp + rename, never an in-place
  * overwrite: a crash mid-write must not leave a truncated-but-parsable
  * marker (the [[IndexManifests.write]] rationale, shared here).
  */
private[graft] object IndexFiles {

  def fs(spark: SparkSession, path: String): FileSystem =
    new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new HPath(path))

  def isDirectory(spark: SparkSession, path: String): Boolean = {
    val f = fs(spark, path)
    val p = new HPath(path)
    f.exists(p) && f.getFileStatus(p).isDirectory
  }

  /** Read a small marker file fully; throws (with the path) when absent. */
  def readString(spark: SparkSession, path: String): String = {
    val in = fs(spark, path).open(new HPath(path))
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  def readStringOpt(spark: SparkSession, path: String): Option[String] = {
    val f = fs(spark, path)
    val p = new HPath(path)
    if (f.exists(p)) {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
    } else None
  }

  /** Write a small marker file via temp + rename (atomic on HDFS/local; on
    * copy+delete stores the crash window is a MISSING marker — which every
    * reader treats as its explicit absent case — never a torn one).
    *
    * The rename is attempted ONTO the destination first: POSIX-rename
    * stores (local FS) replace the old content atomically, so a REWRITTEN
    * marker has no missing-file window at all there. Stores whose rename
    * refuses an existing destination (HDFS semantics) fall back to
    * delete + rename, which re-opens the narrow missing window — which is
    * why the one marker that is repeatedly rewritten under live readers
    * (the PQ codes generation pointer) does not use content rewrites at
    * all (see [[createMarker]] / ProductQuantizer's sequenced
    * `_graft_codes_gen.N` files).
    */
  def writeString(spark: SparkSession, path: String, content: String): Unit = {
    val f = fs(spark, path)
    val dst = new HPath(path)
    val tmp = new HPath(path + ".tmp")
    val out = f.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    if (!f.rename(tmp, dst)) {
      f.delete(dst, false)
      require(f.rename(tmp, dst), s"marker rename failed: $tmp -> $dst")
    }
  }

  /** Create a marker file exclusively (fails if present) with its content
    * landing before the name is re-readable is NOT guaranteed — callers
    * must encode the information in the NAME (a reader may list the file
    * before the payload write returns). This is the object-store-safe
    * commit primitive: `create(overwrite = false)` is atomic on HDFS,
    * local and strongly-consistent S3, with no rename involved at all.
    */
  def createMarker(spark: SparkSession, path: String, content: String): Unit = {
    val out = fs(spark, path).create(new HPath(path), false)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** Immediate children of `dir` that are FILES named with `prefix`. */
  def listFilesWithPrefix(spark: SparkSession, dir: String,
      prefix: String): Seq[FileStatus] = {
    val f = fs(spark, dir)
    val p = new HPath(dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith(prefix))
  }

  /** Immediate children of `dir` that are parquet part files. */
  def listParquet(spark: SparkSession, dir: String): Seq[FileStatus] =
    fs(spark, dir).listStatus(new HPath(dir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))

  /** Immediate child DIRECTORIES of `dir` whose names start with `prefix`
    * (e.g. partition directories `__centroid=`).
    */
  def listSubdirs(spark: SparkSession, dir: String,
      prefix: String): Seq[FileStatus] =
    fs(spark, dir).listStatus(new HPath(dir)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))

  def deleteRecursive(spark: SparkSession, path: String): Unit = {
    fs(spark, path).delete(new HPath(path), true)
    ()
  }

  // ------------------------------------------------------------------
  // Writer lease — MECHANICAL enforcement of the single-writer contract
  // every materialized-index mutation documents. Before r16 the contract
  // was prose: two maintenance writers racing on a store (e.g. a
  // compaction timer firing while a takedown batch rewrites the same
  // buckets) would interleave dynamic partition overwrites and corrupt
  // the store SILENTLY — the reads stay well-formed, the rows are wrong.
  // Now every mutation runs inside `withWriterLease`: the second writer
  // fails LOUDLY at acquisition instead.
  //
  // Mechanics: a `_graft_writer.lock` marker at the store root, created
  // with `FileSystem.create(overwrite = false)` — atomic on HDFS and a
  // check-then-create on local/object stores (same-JVM contention is
  // additionally fenced by an in-process table, which covers the
  // non-atomic window for the only writers this sandbox can run).
  // Leases are REENTRANT per (store, thread): compound mutations
  // (append folds the tombstone sidecar via compactCodes; layout-routed
  // compact delegates) hold one lease for the whole operation. The lock
  // name is underscore-prefixed so Spark's readers treat it as hidden.
  //
  // Crash story: an in-process failure releases in `finally`; a writer
  // JVM that dies mid-mutation leaves the lock on disk, and the next
  // writer fails with the holder's payload (op, jvm, thread, UTC time)
  // plus explicit `breakWriterLease` guidance — takeover is an OPERATOR
  // decision (verify the old writer is dead), never a timeout guess:
  // clock-skew-based auto-expiry is how two writers both believe they
  // hold a store.
  // ------------------------------------------------------------------

  private[graft] val LockName = "_graft_writer.lock"

  private final class Lease(val thread: Thread, val nonce: String) {
    var depth: Int = 1
  }
  private val held = new java.util.concurrent.ConcurrentHashMap[String, Lease]()

  /** Test seam: distinct values scope the in-process lease table, so a
    * spec can simulate SEPARATE JVMs racing one store (two real JVMs
    * cannot share a spec process, and the cross-JVM acquisition path —
    * create-exclusive + payload read-back — is exactly the part that
    * needs adversarial coverage). Production never sets it: one shared
    * table per JVM, the real semantics.
    */
  private[graft] val jvmScopeForTest = new ThreadLocal[String] {
    override def initialValue(): String = ""
  }

  private def leaseKey(f: FileSystem, store: String): String =
    jvmScopeForTest.get() + f.makeQualified(new HPath(store)).toString

  /** The current on-disk lease payload, if any (specs + operator triage). */
  def writerLeaseHolder(spark: SparkSession, store: String): Option[String] =
    readStringOpt(spark, new HPath(store, LockName).toString)

  /** Generation-flip fence (r19): re-verify THIS thread's lease nonce on
    * disk immediately before the final pointer/marker write that commits a
    * maintenance epoch. Lease verification is otherwise acquisition-time
    * only, so a long epoch whose lease was broken mid-flight (an operator
    * takeover — `breakWriterLease` + a new writer's acquisition) would
    * still land its final flip over the new writer's work. The contract
    * covers that (takeover is an explicit operator decision: verify the
    * old writer is dead first), but this fence turns the contract
    * violation into a LOUD failure: the stale writer aborts with the
    * store still resolving the previously committed state.
    *
    * No-op when the calling thread holds no in-process lease for the
    * store — the same final writes also run from un-leased initial builds
    * (materialize), whose single-writer contract is the caller's.
    */
  def fenceWriterLease(spark: SparkSession, store: String): Unit = {
    val f = fs(spark, store)
    // The lease may be registered on an ANCESTOR of the mutated table:
    // ProductQuantizer leases the store root but writes its manifest under
    // $root/codes, GraphAnn under $root/edges and $root/assign — looking
    // up only the exact path would silently no-op the fence for every
    // subdirectory table. Walk up from the path to the filesystem root and
    // fence against the nearest lease THIS thread holds.
    var p: HPath = new HPath(store)
    var cur: Lease = null
    var leaseRoot: String = null
    while (p != null && cur == null) {
      val c = held.get(leaseKey(f, p.toString))
      if (c != null && (c.thread eq Thread.currentThread())) {
        cur = c; leaseRoot = p.toString
      }
      p = p.getParent
    }
    if (cur != null) {
      val owns = readStringOpt(spark, new HPath(leaseRoot, LockName).toString)
        .exists(_.contains(s"nonce=${cur.nonce}"))
      if (!owns) throw new IllegalStateException(
        s"writer lease for $leaseRoot was broken mid-epoch — the on-disk " +
          "lock no longer carries this writer's nonce (operator takeover?). " +
          "Refusing the final commit write: the store still resolves the " +
          "previously committed state; re-run the operation under a fresh " +
          "lease once the takeover writer is done.")
    }
  }

  /** Operator override for a crashed writer's leftover lease: verify the
    * old writer is dead FIRST — breaking a live writer's lease re-creates
    * the silent two-writer corruption this mechanism exists to prevent.
    */
  def breakWriterLease(spark: SparkSession, store: String): Unit = {
    val f = fs(spark, store)
    held.remove(leaseKey(f, store))
    f.delete(new HPath(store, LockName), false)
    ()
  }

  /** Run `body` holding the store's exclusive writer lease (see above).
    * Reentrant on the same (store, thread); any other holder — this JVM,
    * another JVM, or a leftover lock from a crashed writer — fails loudly.
    *
    * Acquisition order matters (r17): the IN-PROCESS table is claimed
    * FIRST, and only the claim winner ever touches disk. On filesystems
    * where `create(overwrite = false)` is check-then-create (local FS,
    * object stores) two same-JVM racers could otherwise BOTH create the
    * lock file — and the `putIfAbsent` loser's cleanup would delete the
    * WINNER's on-disk lock, leaving the active writer unprotected against
    * a writer in another JVM. Claiming in-process first means same-JVM
    * contention is decided before the filesystem is involved at all, so
    * the only cross-writer disk race left is cross-JVM — which the
    * create-exclusive call is for (atomic on HDFS and strongly-consistent
    * S3; the documented single-writer contract covers the rest).
    *
    * Release is NONCE-SCOPED: each acquisition writes a unique nonce into
    * the lock payload, and the releasing `finally` deletes the lock file
    * only after re-reading it and matching its own nonce (and evicts only
    * its own in-process entry, via `remove(key, lease)`). Without that, a
    * `breakWriterLease` issued against a live holder followed by a new
    * acquisition would let the OLD holder's release delete the NEW
    * holder's lock and registration, silently unprotecting it.
    */
  def withWriterLease[T](spark: SparkSession, store: String, op: String)
      (body: => T): T = {
    val f = fs(spark, store)
    val key = leaseKey(f, store)
    val cur = held.get(key)
    if (cur != null && (cur.thread eq Thread.currentThread())) {
      cur.depth += 1
      try body finally cur.depth -= 1
    } else {
      val lock = new HPath(store, LockName)
      def contended(detail: String): Nothing = throw new IllegalStateException(
        s"writer lease for $store is held — refusing to run '$op' " +
          s"concurrently with another mutation ($detail). If the holder " +
          "crashed, verify it is dead and call IndexFiles.breakWriterLease.")
      val lease = new Lease(Thread.currentThread(),
        java.util.UUID.randomUUID().toString)
      // in-process claim FIRST: the loser never reaches the filesystem
      // (beyond the read-only payload lookup for the error message)
      if (held.putIfAbsent(key, lease) != null)
        contended(writerLeaseHolder(spark, store)
          .map(p => s"holder: ${p.trim}")
          .getOrElse("another writer in this JVM holds the lease"))
      val out =
        try f.create(lock, false)
        catch {
          case e: java.io.IOException =>
            held.remove(key, lease)
            contended(writerLeaseHolder(spark, store)
              .map(p => s"on-disk holder: ${p.trim}")
              .getOrElse(s"create failed: ${e.getMessage}"))
        }
      def ownsDiskLock(): Boolean =
        readStringOpt(spark, lock.toString)
          .exists(_.contains(s"nonce=${lease.nonce}"))
      try {
        val payload = s"op=$op jvm=${
          java.lang.management.ManagementFactory.getRuntimeMXBean.getName
        } thread=${Thread.currentThread().getName} nonce=${lease.nonce} " +
          s"utc=${java.time.Instant.now}\n"
        try out.write(payload.getBytes("UTF-8")) finally out.close()
      } catch {
        case e: Throwable =>
          held.remove(key, lease)
          // the payload may not have landed, so the nonce check can't
          // identify the file — but we created it via create-exclusive
          // this very call, so it is ours to remove
          f.delete(lock, false)
          throw e
      }
      // Read-back verification (r18): on filesystems where
      // create(overwrite = false) is check-then-create (RawLocal; the
      // WriterLeaseSpec race measured 3/8 racers through it) two JVMs can
      // BOTH believe they created the lock — a window the in-process
      // claim cannot reach (it only sees this JVM). After writing the
      // payload, proceed only if the lock still carries OUR nonce: the
      // racer whose payload was overwritten fails loudly here instead of
      // entering body unprotected. (The residual window — the other
      // JVM's create landing after this read-back — needs a truly atomic
      // create to close, which HDFS and conditional-write S3 provide;
      // this check reduces the non-atomic-store race to that sliver.)
      // the read-back itself can fail transiently (FS read error on the
      // lock we just wrote): clean up like the payload-write failure path
      // above — otherwise the in-process entry AND our on-disk lock both
      // stay behind and wedge every future acquisition until an operator
      // breaks the lease. The lock delete is best-effort re-confirmed: a
      // still-failing read leaves the file for breakWriterLease.
      val owns =
        try ownsDiskLock()
        catch {
          case e: Throwable =>
            held.remove(key, lease)
            try { if (ownsDiskLock()) f.delete(lock, false) }
            catch { case _: Throwable => () }
            throw e
        }
      if (!owns) {
        held.remove(key, lease)
        contended(writerLeaseHolder(spark, store)
          .map(p => s"lost the creation race; on-disk holder: ${p.trim}")
          .getOrElse("lost the creation race to another JVM"))
      }
      try body finally {
        held.remove(key, lease)
        // delete only OUR lock: after an (operator-error) break + foreign
        // re-acquire, the file holds the new writer's nonce — leave it
        if (ownsDiskLock()) f.delete(lock, false)
      }
    }
  }
}
