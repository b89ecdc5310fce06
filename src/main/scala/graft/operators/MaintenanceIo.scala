package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

/** Storage plumbing for the persisted-index lifecycle (IVF / quantized
  * assignments, LSH band table, exact-dedup Bloom artifact): a MANIFEST-
  * pointer layer that makes every mutation crash-safe and every reader
  * race-free, plus the maintenance lock that serializes writers.
  *
  * Layout of a versioned artifact root:
  * {{{
  *   root/
  *     MANIFEST            # epoch counter + table-name -> generation dir
  *     MANIFEST.prev       # the previous manifest (reader grace period)
  *     assignments.g0/     # parquet generation dirs, immutable once
  *     assignments.g1/     #   superseded (append-mode tables grow the
  *     tombstones.g0/      #   CURRENT generation in place)
  * }}}
  *
  * Every mutation runs under [[withMaintenanceLock]] (same-JVM monitor +
  * cross-process advisory `FileChannel` lock — the cachedBuild pattern)
  * and publishes by writing a NEW manifest via temp-file + atomic rename:
  * a crash at any point leaves the old manifest (and every directory it
  * references) fully intact, so readers never see a torn artifact and the
  * next writer simply retries. This retires the old delete-then-rename
  * `swapDir`, whose crash window could leave NO artifact at the
  * destination (round-12 advice) and whose delete raced in-flight reads.
  *
  * Readers resolve table paths through ONE manifest read ([[snapshot]]) —
  * a consistent view across tables (assignments + tombstones swap
  * together at compaction) — and [[gc]] retains every directory the
  * previous manifest references, so a reader that resolved just before a
  * compaction finishes its scan against the still-present old generation.
  * One grace generation bounds disk at ≤ 2× the live artifact.
  *
  * The manifest also carries the index's EPOCH counter — a monotonic
  * mutation stamp. Appended rows record the epoch that admitted them and
  * tombstones record the epoch that deleted them, so `row is live` is
  * `no tombstone for id, OR row.epoch > latest tombstone epoch for id`
  * — which makes append-after-delete work WITHOUT an intervening
  * compaction (round-12 verdict #5: the takedown-then-recrawl workflow).
  * Ties favor the delete (a crash can orphan an epoch bump, and the safe
  * direction is dead-stays-dead until re-appended at a later epoch).
  *
  * This is exactly the object-store deployment shape: generations are
  * immutable uploads, the manifest is the one small mutable object, and
  * the atomic-rename here maps to a conditional PUT there. Nothing below
  * relies on directory-rename atomicity.
  */
private[graft] object MaintenanceIo {

  /** Epoch counter + table-name -> generation-dir-name (relative). */
  final case class Manifest(epoch: Long, tables: Map[String, String])

  private val monitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Serialize index mutations on `root`: a per-root same-JVM monitor
    * (overlapping `FileLock`s within one process throw rather than
    * block) wrapping a cross-process advisory file lock. Readers never
    * take it — the manifest snapshot plus the grace generation make
    * reads lock-free.
    */
  def withMaintenanceLock[A](root: String)(f: => A): A = {
    val canon = Paths.get(root).toAbsolutePath.normalize.toString
    val monitor = monitors.computeIfAbsent(canon, _ => new Object)
    monitor.synchronized {
      Files.createDirectories(Paths.get(canon))
      val ch = java.nio.channels.FileChannel.open(
        Paths.get(canon, ".maintenance.lock"),
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      try {
        val lk = ch.lock()
        try f finally lk.release()
      } finally ch.close()
    }
  }

  def readManifest(root: String): Option[Manifest] =
    parseManifest(Paths.get(root, "MANIFEST"))

  private def parseManifest(p: Path): Option[Manifest] = {
    if (!Files.exists(p)) None
    else {
      val kv = Files.readAllLines(p).toArray(Array.empty[String])
        .filter(_.contains("=")).map { l =>
          val i = l.indexOf('='); (l.substring(0, i), l.substring(i + 1))
        }.toMap
      Some(Manifest(kv.getOrElse("epoch", "0").toLong,
        kv.view.filterKeys(_ != "epoch").toMap))
    }
  }

  /** The manifest a reader MUST find: absence means the root is not a
    * versioned artifact (never built, or a pre-manifest layout — rebuild
    * it; stale copies of the old layout are invalidated by the
    * cachedBuild signature salt).
    */
  def requireManifest(root: String): Manifest =
    readManifest(root).getOrElse(throw new IllegalStateException(
      s"$root has no MANIFEST — not a (current-layout) versioned " +
        "artifact; rebuild the index"))

  /** One consistent table-name -> absolute-path view. Resolve ALL tables
    * a query needs from a single snapshot — two separate reads could
    * straddle a compaction and mix generations.
    */
  def snapshot(root: String): Map[String, String] =
    requireManifest(root).tables.view
      .mapValues(g => s"$root/$g").toMap

  /** Publish a manifest mutation: save the current manifest as the grace
    * copy, land the new one by temp + atomic rename, then GC. Call only
    * under [[withMaintenanceLock]], AFTER the generation directories the
    * new manifest references are fully written. The current MANIFEST is
    * never absent at any instant — the grace copy lands first (its own
    * temp + rename), then the new manifest atomically REPLACES the
    * current one.
    */
  def publish(root: String, m: Manifest): Unit = {
    val dir = Paths.get(root)
    Files.createDirectories(dir)
    val cur = dir.resolve("MANIFEST")
    if (Files.exists(cur)) {
      val ptmp =
        dir.resolve(s"MANIFEST.prev.tmp.${ProcessHandle.current().pid()}")
      Files.copy(cur, ptmp, StandardCopyOption.REPLACE_EXISTING)
      Files.move(ptmp, dir.resolve("MANIFEST.prev"),
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    }
    val tmp = dir.resolve(s"MANIFEST.tmp.${ProcessHandle.current().pid()}")
    val body = (s"epoch=${m.epoch}" +:
      m.tables.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" })
      .mkString("", "\n", "\n")
    Files.writeString(tmp, body)
    Files.move(tmp, cur,
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    gc(root)
  }

  /** Next generation dir name for `table`: one past every `table.g<n>`
    * on disk (filesystem scan, not manifest — an orphaned generation
    * from a crashed writer must not be reused while it might be
    * half-written ... it is GC'd at the next successful publish).
    */
  def nextGen(root: String, table: String): String = {
    val re = s"""^${java.util.regex.Pattern.quote(table)}\\.g(\\d+)$$""".r
    val max = Option(new java.io.File(root).list()).getOrElse(Array.empty)
      .collect { case re(n) => n.toLong }
      .foldLeft(-1L)(math.max)
    s"$table.g${max + 1}"
  }

  /** Delete generation dirs referenced by NEITHER the current manifest
    * NOR the grace copy. Only `<table>.g<n>`, per-append
    * `<table>.a<seq>.e<epoch>`, and micro-batch `<table>.b<id>.e<epoch>`
    * names are candidates — the cachedBuild marker, lock files, and
    * unversioned side tables (centroids, ranges) are never touched.
    * Generations carrying an in-progress marker ([[reserveGen]]) are
    * exempt: a lock-free certification writes its cert generation BEFORE
    * taking the publish lock, and a concurrent writer's publish-time gc
    * must not reap that in-flight dir (round-18 advice: two concurrent
    * certifies — B's publish gc'd A's unreferenced-but-about-to-be-
    * published gen, and A then published a manifest pointing at a
    * deleted directory).
    */
  private def gc(root: String): Unit = {
    val keep =
      readManifest(root).map(_.tables.values.toSet).getOrElse(Set.empty) ++
        readPrev(root).map(_.tables.values.toSet).getOrElse(Set.empty)
    val genRe = """^[A-Za-z_]+\.(g\d+|[ab]\d+\.e\d+)$""".r
    Option(new java.io.File(root).list()).getOrElse(Array.empty)
      .filter(n => genRe.matches(n) && !keep.contains(n) &&
        !Files.exists(Paths.get(root, s"$n.inprogress")))
      .foreach(n => deleteDir(s"$root/$n"))
  }

  /** RESERVE a generation name for a LOCK-FREE writer (the certification
    * paths, which measure outside the lock so a corpus-scale audit never
    * stalls mutations): under a brief lock, claim the next `table`
    * generation by creating the (empty) dir plus an `.inprogress` marker
    * file. The dir claims the name against a concurrent [[nextGen]] scan
    * (two lock-free certifiers must never write into one dir); the marker
    * exempts it from every concurrent publish's [[gc]] until the owner
    * calls [[releaseGen]] — on success (the gen is manifest-referenced by
    * then) or on refusal (the owner deletes the orphan dir first). A hard
    * crash can strand one marker+dir pair; it is bounded (one dir per
    * crashed certifier) and harmless — the next certification reserves a
    * fresh name past it.
    */
  def reserveGen(root: String, table: String): String =
    withMaintenanceLock(root) {
      val gen = nextGen(root, table)
      Files.createDirectories(Paths.get(root, gen))
      Files.writeString(Paths.get(root, s"$gen.inprogress"), "")
      gen
    }

  /** Drop [[reserveGen]]'s in-progress marker (call in a finally). */
  def releaseGen(root: String, gen: String): Unit = {
    Files.deleteIfExists(Paths.get(root, s"$gen.inprogress"))
    ()
  }

  private def readPrev(root: String): Option[Manifest] =
    parseManifest(Paths.get(root, "MANIFEST.prev"))

  def deleteDir(path: String): Unit = {
    val p = Paths.get(path)
    if (Files.exists(p)) {
      def rec(f: Path): Unit = {
        if (Files.isDirectory(f)) {
          val s = Files.list(f)
          try s.forEach(rec(_)) finally s.close()
        }
        Files.delete(f)
      }
      rec(p)
    }
  }
}
