package graft.orchestrate

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._
import graft.query.QueryCompiler
import graft.update.UpdateCompiler

/** Executor-side registries for imperative migrations — reference
  * Environment op/processor registries (/root/reference/environment.go:
  * 167-252). Pure transforms should compile to Column expressions; these
  * registries exist only for manual/stream parity. Ops must be idempotent:
  * Spark task retries give at-least-once-per-partition execution, same
  * contract as the reference (README.rst:68-70).
  */
final class Registries extends Serializable {
  /** MigrationOperation analog (client/processor.go:15-21): row → row. */
  @transient private var ops = Map.empty[String, Row => Row]
  /** Processor analog (client/processor.go:9-13): whole-stream transform. */
  @transient private var processors = Map.empty[String, Iterator[Row] => Iterator[Row]]

  def registerOperation(name: String, op: Row => Row): Unit =
    synchronized { ops += name -> op }
  def registerProcessor(name: String, p: Iterator[Row] => Iterator[Row]): Unit =
    synchronized { processors += name -> p }
  def operation(name: String): Option[Row => Row] = ops.get(name)
  def processor(name: String): Option[Iterator[Row] => Iterator[Row]] =
    processors.get(name)
}

/** Result of one migration action. */
final case class MigrationResult(id: String, matched: Long, hasErrors: Boolean,
    error: Option[String] = None)

/** The migration application — reference Application
  * (/root/reference/anser.go:63-129). The reference's two-phase
  * generate-then-execute per-document job fan-out collapses into one
  * DataFrame transform per migration (SURVEY.md §2.9); what remains is:
  *   - dependency DAG validation + topo-layer scheduling,
  *   - DryRun (plan + match counts only, no writes — anser.go:107-110),
  *   - Limit (cap rows touched per migration — generator_simple.go:77-79),
  *   - the metadata ledger gate (dependency_manager.go:60-93): a migration
  *     runs only when every dependency's ledger row is satisfied.
  *
  * Tables live as parquet under `root`; results are written back via
  * atomic-rename directory swap (write to `<table>.parquet.tmp`, then swap)
  * so a failed write never corrupts the source.
  */
final class MigrationApp(
    spark: SparkSession,
    root: String,
    options: ApplicationOptions = ApplicationOptions(),
    registries: Registries = new Registries) {

  private val network = new DependencyNetwork
  private var specs = Map.empty[String, MigrationSpec]
  val ledger = new MetadataLedger(spark, s"$root/anser_migrations_metadata")
  private val appId = java.util.UUID.randomUUID().toString
  /** Serializes concurrent apps touching the same namespace — see
    * [[NamespaceLease]]. */
  val lease = new NamespaceLease(spark, root, appId, options.leaseWaitMs)

  /** reference Application.Setup (anser.go:63-84). */
  def setup(migrations: Seq[MigrationSpec]): this.type = {
    for (m <- migrations) {
      require(m.options.isValid, s"invalid migration options: ${m.options}")
      require(!specs.contains(m.id), s"duplicate migration id ${m.id}")
      specs += m.id -> m
      network.add(m.id, m.options.dependsOn)
    }
    network.validate().left.foreach(errs =>
      throw new IllegalArgumentException(errs.mkString("; ")))
    this
  }

  /** reference Application.Run (anser.go:86-129): topo layers with a barrier
    * between layers; per migration — dependency-ledger gate, dry-run/limit
    * handling, execute, record metadata. */
  def run(): Seq[MigrationResult] = {
    val results = collection.mutable.ListBuffer.empty[MigrationResult]
    for (layer <- network.topoLayers(); id <- layer) {
      val spec = specs(id)
      val blocked = spec.options.dependsOn.filterNot(ledger.satisfied)
      val res =
        if (blocked.nonEmpty)
          MigrationResult(id, 0, hasErrors = true,
            Some(s"blocked on unsatisfied dependencies: ${blocked.mkString(",")}"))
        else runOne(spec)
      if (!options.dryRun) ledger.record(
        MigrationMetadata(id, id, res.hasErrors, completed = true))
      results += res
    }
    results.toSeq
  }

  /** Count of documents still matching a migration's query — reference
    * PendingMigrationOperations (migration_helper_legacy.go:101-120). */
  def pendingMigrationOperations(spec: MigrationSpec): Long = {
    val df = graft.sources.Tables.load(spark, spec.options.ns.path(root))
    df.where(QueryCompiler.compile(spec.options.query)).count()
  }

  /** Dry runs only read — no lease. Real runs hold the namespace lease
    * across the whole read→transform→swap window, so two apps migrating
    * the same namespace serialize (or fail fast after leaseWaitMs) —
    * never interleave the directory swap. */
  private def runOne(spec: MigrationSpec): MigrationResult =
    if (options.dryRun) runOneInner(spec)
    else try lease.withLease(spec.options.ns)(runOneInner(spec))
    catch {
      case e: IllegalStateException => // lease acquisition failed fast
        MigrationResult(spec.id, 0, hasErrors = true, Some(e.getMessage))
    }

  private def runOneInner(spec: MigrationSpec): MigrationResult = {
    val opts = spec.options
    val path = opts.ns.path(root)
    var workListFrame: Option[DataFrame] = None
    try {
      if (!options.dryRun) recoverTornSwap(path)
      val raw = graft.sources.Tables.load(spark, path)
      // Limit semantics (generator_simple.go:77-79,127-129): cap the rows
      // migrated, selected deterministically (sorted work-list), marked via
      // a key join rather than a driver-side collect so it scales. The join
      // key must identify rows: workList keys are deduped so the left_outer
      // join can never multiply source rows (the corruption hazard); raw
      // keys that turn out non-unique only over-apply the limit, which the
      // matched-vs-worklist check below surfaces as an error result.
      val keyCol = opts.idColumn.getOrElse(raw.columns.head)
      var workListKeys = -1L
      val (df, pred) =
        if (opts.limit > 0) {
          val sortCols = graft.db.GraftQuery.parseSort(opts.sortBy) :+ col(keyCol)
          val workList = raw.where(QueryCompiler.compile(opts.query))
            .orderBy(sortCols: _*).limit(opts.limit)
            .select(col(keyCol)).dropDuplicates(keyCol)
            .withColumn("__hit", lit(true)).persist()
          workListFrame = Some(workList)
          workListKeys = workList.count()
          val marked = raw.join(broadcast(workList), Seq(keyCol), "left_outer")
          (marked, coalesce(col("__hit"), lit(false)))
        } else (raw, QueryCompiler.compile(opts.query))
      if (options.dryRun) {
        // dry-run's whole purpose is the match count — one counting scan
        val matched = df.where(pred).count()
        return MigrationResult(spec.id, matched, hasErrors = false)
      }

      // Non-dry-run: the match count is OBSERVED inside the write job
      // (CollectMetrics) rather than counted in a separate scan — one pass
      // over the table per migration (db/wrapper.go's ChangeInfo comes back
      // with the write for the same reason).
      val obs = org.apache.spark.sql.Observation()
      val out: DataFrame = spec match {
        case SimpleMigration(_, update) =>
          val observed = df.observe(obs,
            sum(when(pred, 1L).otherwise(0L)).as("matched"))
          UpdateCompiler.applyUpdate(observed, pred, update)
        case ManualMigration(_, opName) =>
          val op = registries.operation(opName).getOrElse(throw new
            IllegalArgumentException(s"operation $opName is not registered"))
          mapRows(df, pred, obs, it => it.map(op))
        case StreamMigration(_, procName) =>
          val proc = registries.processor(procName).getOrElse(throw new
            IllegalArgumentException(s"processor $procName is not registered"))
          mapRows(df, pred, obs, proc)
      }
      // the limit path validates AFTER the write (the matched count only
      // exists once the write job ran), so its pre-swap backup must outlive
      // writeBack: on validation failure the original table is restored —
      // a non-unique idColumn errors AND leaves the data un-migrated
      val keepBackup = workListKeys >= 0
      writeBack(out.drop("__hit"), path, keepBackup,
        fence = () => lease.verifyHeld(spec.options.ns))
      // blocking get: the write above executed the CollectMetrics node, the
      // listener delivers the row asynchronously moments later
      val matched = obs.get.get("matched") match {
        case Some(n: Number) => n.longValue()
        case _ => 0L
      }
      if (workListKeys >= 0 && matched > workListKeys) {
        restoreBackup(path)
        throw new IllegalStateException(
          s"limit work-list key '$keyCol' is not unique in ${opts.ns}: " +
            s"$matched rows matched ${workListKeys} work-list keys; " +
            "the original table was restored from backup; configure " +
            "GeneratorOptions.idColumn with a unique column")
      }
      if (keepBackup) deleteBackup(path)
      MigrationResult(spec.id, matched, hasErrors = false)
    } catch {
      case e: Exception =>
        MigrationResult(spec.id, 0, hasErrors = true, Some(e.getMessage))
    } finally workListFrame.foreach(_.unpersist(false))
  }

  /** Imperative path (manual/stream): matching rows pass through the user
    * function per partition; non-matching rows are preserved. Requires the
    * function to keep the schema. The matched count is observed on the
    * matching branch (before the user function, which may drop rows), so
    * the union's other branch never double-counts. */
  private def mapRows(df: DataFrame, pred: org.apache.spark.sql.Column,
      obs: org.apache.spark.sql.Observation,
      f: Iterator[Row] => Iterator[Row]): DataFrame = {
    val schema = df.schema
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val transformed = df.where(pred)
      .observe(obs, count(lit(1)).as("matched"))
      .mapPartitions(f)(enc)
    df.where(!coalesce(pred, lit(false))).unionByName(transformed)
  }

  // resolved from the ROOT path, not fs.defaultFS: the tmp/bak/commit
  // renames must run on the filesystem that actually holds the tables
  // (an s3a:// root under an hdfs:// default would otherwise swap the
  // wrong paths) — and the lease resolves the same way, keeping fence
  // and data path on one filesystem
  private def fs = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Atomic-ish write-back: write tmp dir, swap via rename. With
    * `keepBackup` the displaced original survives as `<path>.bak` so a
    * post-write validation failure can roll back via [[restoreBackup]].
    * `fence` runs after the (long) tmp write and immediately before the
    * first commit rename — the data-path fencing check
    * ([[NamespaceLease.verifyHeld]]): if the lease changed hands while
    * this app was paused or slow, the swap aborts with NOTHING mutated
    * (only the orphaned `.tmp` remains, and the next writeBack's
    * mode("overwrite") replaces it). */
  private def writeBack(df: DataFrame, path: String,
      keepBackup: Boolean = false, fence: () => Unit = () => ()): Unit = {
    val tmp = path + ".tmp"
    df.write.mode("overwrite").parquet(tmp)
    fence()
    val p = new org.apache.hadoop.fs.Path(path)
    val bak = new org.apache.hadoop.fs.Path(path + ".bak")
    if (fs.exists(bak)) fs.delete(bak, true)
    if (fs.exists(p)) fs.rename(p, bak)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), p)
    if (!keepBackup) fs.delete(bak, true)
  }

  /** Crash recovery for [[writeBack]]'s swap, run under the namespace
    * lease before touching the table. The only torn state a crash can
    * leave (every step is an atomic rename) is "table renamed away to
    * `.bak`, replacement not yet renamed in": roll BACK to the old table.
    * Roll-back, not roll-forward, because the metadata ledger records a
    * migration AFTER its writeBack — rolling the orphaned `.tmp` forward
    * would apply a migration the ledger still thinks is pending, and the
    * re-run would double-apply it. A stale-lease takeover therefore sees
    * either the old table or the new, never a torn directory. */
  private def recoverTornSwap(path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val bak = new org.apache.hadoop.fs.Path(path + ".bak")
    if (!fs.exists(p) && fs.exists(bak)) {
      org.apache.log4j.Logger.getLogger(getClass).warn(
        s"recovering torn swap at $path: restoring $bak (a previous app " +
          "crashed between the swap renames); the interrupted migration " +
          "remains pending and will re-run")
      fs.rename(bak, p)
      fs.delete(new org.apache.hadoop.fs.Path(path + ".tmp"), true)
    }
  }

  private def restoreBackup(path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val bak = new org.apache.hadoop.fs.Path(path + ".bak")
    if (fs.exists(bak)) { fs.delete(p, true); fs.rename(bak, p) }
  }

  private def deleteBackup(path: String): Unit =
    fs.delete(new org.apache.hadoop.fs.Path(path + ".bak"), true)
}

/** Per-namespace write lease making the atomic-swap write path safe under
  * CONCURRENT migration applications: two apps migrating the same
  * namespace would otherwise race the tmp/bak/rename directory swap
  * ([[MigrationApp.writeBack]]) and could tear the table. The lease is an
  * atomically-created file next to the metadata ledger (the reference
  * leans on per-document atomicity in its metadata collection instead;
  * migration_helper_iterator.go:80-107) — `FileSystem.create(overwrite =
  * false)` is atomic on HDFS and local filesystems alike.
  *
  * Semantics: acquire blocks up to `waitMs` (concurrent runs SERIALIZE),
  * then throws (fail fast — surfaced as an errored MigrationResult, never
  * a torn table). A lease older than `staleMs` is presumed abandoned by a
  * crashed app and is broken with a warning. Hardening against the
  * file-lock races:
  *
  *   - the HOLDER heartbeats (mtime refresh every staleMs/3, daemon
  *     thread) — a migration legitimately running longer than staleMs is
  *     never mistaken for a crash;
  *   - stale leases break via ATOMIC RENAME to a breaker-unique name
  *     (only one breaker's rename succeeds; a plain delete would let two
  *     waiters both "break" and both acquire). After the rename wins, the
  *     breaker re-checks the renamed file's age: if the holder refreshed
  *     between observation and rename (it was never stale), the file is
  *     renamed back and the breaker resumes waiting;
  *   - after create the acquirer reads the lease back and verifies its
  *     own token before proceeding — create-if-absent already guarantees
  *     exclusivity, the read-back catches a lease replaced underneath in
  *     the (now rename-narrowed) breaker window;
  *   - release deletes only a lease that still carries the owner token,
  *     so a usurped holder cannot free the usurper's lease.
  *
  * The advisory lock is backed by a data-path fencing check:
  * [[MigrationApp.writeBack]] calls [[verifyHeld]] after the
  * replacement data is written and immediately before the first commit
  * rename, on the SAME filesystem that holds the lease. A holder paused
  * past staleMs is usurped while asleep; on wake-up its commit is
  * preceded by the check, which observes the usurper's token and aborts
  * the publish (the migration surfaces as an errored result and re-runs
  * later — the usurper's writes are never clobbered). What remains is
  * the check→rename instruction window: only a pause landing exactly
  * inside those few milliseconds escapes, because true CAS publication
  * needs a primitive the Hadoop FileSystem API doesn't offer. */
final class NamespaceLease(spark: SparkSession, root: String,
    owner: String, waitMs: Long = 10000L,
    staleMs: Long = 30L * 60 * 1000) {
  import org.apache.hadoop.fs.Path

  // same root-path resolution as MigrationApp.fs: the lease must live
  // on the filesystem whose rename semantics the break/fence protocol
  // reasons about (copy-rename object stores included)
  private def fs = new Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def leasePath(ns: graft.model.Namespace): Path =
    new Path(s"$root/anser_migrations_metadata.leases/" +
      s"${ns.db}.${ns.collection}.lease")
  private val log = org.apache.log4j.Logger.getLogger(getClass)

  // one daemon heartbeat thread per held namespace
  private val heartbeats = new java.util.concurrent.ConcurrentHashMap[
    String, Thread]()

  def withLease[T](ns: graft.model.Namespace)(body: => T): T = {
    acquire(ns)
    try body finally release(ns)
  }

  private def readToken(p: Path): Option[String] =
    try {
      val in = fs.open(p)
      try Some(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8"))
      finally in.close()
    } catch { case _: java.io.IOException => None }

  /** [[readToken]] with bounded retries: a lease-protocol decision
    * (back off, stop heartbeating, skip release) must not ride on ONE
    * transient object-store read hiccup — None here means the file was
    * consistently unreadable/absent across the whole window. */
  private def readTokenRetry(p: Path, attempts: Int = 5,
      delayMs: Long = 200L): Option[String] = {
    var i = 0
    while (i < attempts) {
      readToken(p) match {
        case some @ Some(_) => return some
        case None => i += 1; if (i < attempts) Thread.sleep(delayMs)
      }
    }
    None
  }

  def acquire(ns: graft.model.Namespace): Unit = {
    val p = leasePath(ns)
    fs.mkdirs(p.getParent)
    val deadline = System.currentTimeMillis() + waitMs
    var acquired = false
    while (!acquired) {
      try {
        val out = fs.create(p, false) // atomic create-if-absent
        out.write(owner.getBytes("UTF-8"))
        out.close()
        // read-back: if a breaker replaced the file in the window, the
        // token differs and this acquirer backs off instead of running.
        // Retried reads: abandoning a SUCCEEDED create on one transient
        // read error would orphan this app's own lease (nothing else can
        // create over it, breakStale only fires after staleMs).
        if (readTokenRetry(p).contains(owner)) acquired = true
        else Thread.sleep(50)
      } catch {
        case _: java.io.IOException =>
          val age = try System.currentTimeMillis() -
            fs.getFileStatus(p).getModificationTime
          catch { case _: java.io.FileNotFoundException => 0L }
          if (age > staleMs) breakStale(p, age)
          else if (System.currentTimeMillis() > deadline)
            throw new IllegalStateException(
              s"namespace ${ns} is leased by another migration app " +
                s"(lease $p); waited ${waitMs}ms — serialize the apps or " +
                "raise ApplicationOptions.leaseWaitMs")
          else Thread.sleep(50)
      }
    }
    startHeartbeat(ns, p)
  }

  /** Break a presumed-stale lease. Atomic rename to a breaker-unique
    * name: of N waiters only ONE rename succeeds (the source vanishes
    * for the rest), and the age re-check catches the holder having
    * heartbeat-refreshed between this breaker's observation and its
    * rename.
    *
    * The re-check must NOT trust the post-rename mtime alone: on
    * object-store connectors (S3A/GCS) "rename" is a copy that stamps a
    * fresh mtime, which would make every re-check conclude the holder
    * is alive and restore the lease — genuinely stale leases could then
    * never be broken there. Instead the mtime observed immediately
    * BEFORE the rename decides staleness, and the post-rename value is
    * only consulted to detect a refresh that landed inside the
    * observation→rename window: `preMtime < postMtime < renameStart`
    * can only be a heartbeat (restore); `postMtime >= renameStart` is
    * indistinguishable from the rename itself stamping the copy, so the
    * pre-rename decision stands. That classification deliberately ERRS
    * TOWARD BREAKING: a heartbeat landing in the microseconds between
    * `renameStart` and the rename completing (or shifted across it by
    * filesystem-vs-local clock skew) is treated as the rename's own
    * stamp and the lease breaks anyway. The asymmetry is intentional —
    * a wrongly-restored lease on an object store is a LIVENESS failure
    * (stale leases never break, the advisor finding this replaced),
    * while a wrongly-broken live lease is now SAFE: the holder's
    * heartbeat detects the token change and logs, and the data path is
    * fenced ([[verifyHeld]] before writeBack's commit rename), so the
    * usurped holder cannot publish. */
  private def breakStale(p: Path, observedAge: Long): Unit = {
    // re-observe right before acting: the heartbeat refreshes every
    // staleMs/3, so "refreshed since the caller's observation" is the
    // common false-stale case — catch it without renaming at all
    val preMtime = try fs.getFileStatus(p).getModificationTime
      catch {
        case _: java.io.FileNotFoundException => return
        case _: java.io.IOException => return
      }
    if (System.currentTimeMillis() - preMtime <= staleMs) return
    val renameStart = System.currentTimeMillis()
    val moved = new Path(p.toString + ".breaking." +
      java.util.UUID.randomUUID().toString)
    val won = try fs.rename(p, moved)
      catch { case _: java.io.IOException => false }
    if (!won) return // another breaker (or the holder's release) got it
    val postMtime = try fs.getFileStatus(moved).getModificationTime
    catch { case _: java.io.FileNotFoundException => return }
    val refreshedInWindow =
      postMtime > preMtime && postMtime < renameStart
    if (!refreshedInWindow) {
      val age = System.currentTimeMillis() - preMtime
      log.warn(s"broke stale namespace lease $p (age ${age}ms > " +
        s"staleMs $staleMs — presumed abandoned by a crashed app)")
      fs.delete(moved, false)
    } else {
      // the holder was alive after all — put the lease back; if the
      // brief gap let someone create a fresh lease, leave both (the
      // restored copy under the unique name) and log loudly
      if (!fs.rename(moved, p)) {
        log.error(s"lease $p was re-created during a false stale-break; " +
          s"original preserved at $moved — two apps may be racing, " +
          "check staleMs vs real migration duration")
        fs.delete(moved, false)
      }
    }
  }

  private def startHeartbeat(ns: graft.model.Namespace, p: Path): Unit = {
    val interval = math.max(staleMs / 3, 100L)
    val t = new Thread(() => {
      try while (!Thread.interrupted()) {
        Thread.sleep(interval)
        // retried read + swallowed refresh errors: the heartbeat is the
        // only thing standing between a long migration and a stale-break
        // — it must survive transient store hiccups (a single failed
        // read or setTimes exiting this thread would silently re-open
        // the double-writer race it exists to close). It stops only on
        // CONSISTENT evidence the token changed hands.
        try {
          if (readTokenRetry(p).contains(owner))
            fs.setTimes(p, System.currentTimeMillis(), -1)
          else {
            log.error(s"namespace lease $p no longer carries this " +
              "app's token — lease was broken underneath a live " +
              "migration (staleMs too low for this workload?)")
            return
          }
        } catch {
          case _: InterruptedException => throw new InterruptedException
          case e: java.io.IOException =>
            log.warn(s"lease heartbeat refresh failed transiently on " +
              s"$p: $e — retrying next interval")
        }
      } catch { case _: InterruptedException => }
    }, s"graft-lease-heartbeat-${ns.db}.${ns.collection}")
    t.setDaemon(true)
    t.start()
    heartbeats.put(p.toString, t)
  }

  /** Data-path fencing check — throws unless the lease still carries
    * this app's token. [[MigrationApp.writeBack]] calls it immediately
    * before the commit rename: a holder paused past staleMs was usurped
    * while asleep, and this same-filesystem check makes its wake-up
    * commit abort instead of publishing over the usurper. Retried reads
    * (the protocol rule everywhere here): aborting a finished write on
    * one transient read hiccup would waste the whole migration. */
  def verifyHeld(ns: graft.model.Namespace): Unit =
    if (!readTokenRetry(leasePath(ns)).contains(owner))
      throw new IllegalStateException(
        s"namespace lease for ${ns.db}.${ns.collection} no longer " +
          "carries this app's token — it was usurped while this app " +
          "was paused or slow (staleMs too low for this workload?). " +
          "Aborting the table swap so the new holder's writes are not " +
          "overwritten; this migration stays pending and will re-run.")

  def release(ns: graft.model.Namespace): Unit = {
    val p = leasePath(ns)
    Option(heartbeats.remove(p.toString)).foreach { t =>
      t.interrupt(); t.join(2000)
    }
    // delete only our own lease — a usurped holder must not free the
    // usurper's (retried read: a transient miss here would orphan our
    // own lease until staleMs)
    if (readTokenRetry(p).contains(owner)) fs.delete(p, false)
  }
}

/** Migration metadata ledger — reference MigrationHelper.SaveMigrationEvent
  * + anser.migrations.metadata (migration_helper_iterator.go:56-107,
  * environment.go:26-29). Small state table, upserted by id. */
final class MetadataLedger(spark: SparkSession, path: String) {
  import spark.implicits._

  // resolved from the ledger path (not fs.defaultFS, not java.io) so
  // the ledger works on whatever filesystem the root names
  private def fs = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def all(): DataFrame =
    if (fs.exists(new org.apache.hadoop.fs.Path(path)))
      spark.read.parquet(path)
    else Seq.empty[MigrationMetadata].toDF()

  def record(m: MigrationMetadata): Unit = withLock {
    // tiny state table: rows bounded by the number of migrations, not the
    // data — collect + rewrite wholesale is the right scale trade-off.
    val existing = all().as[MigrationMetadata].collect().toSeq
      .filterNot(_._id == m._id)
    (existing :+ m).toDF().coalesce(1).write.mode("overwrite").parquet(path)
  }

  // the read-modify-write above is not atomic; a second app sharing the
  // ledger would lose updates. Guard with an atomically-created lock file
  // (reference relies on mongo's per-document atomicity instead).
  private def withLock[T](body: => T): T = {
    val lock = new org.apache.hadoop.fs.Path(path + ".lock")
    fs.mkdirs(lock.getParent)
    val deadline = System.currentTimeMillis() + 30000
    // create-if-absent. Hadoop's RawLocalFileSystem implements
    // create(overwrite=false) as exists-then-create — NOT O_EXCL — so
    // on file:// paths two local processes could both "win"; there we
    // go through java.nio Files.createFile, which IS an atomic
    // exclusive create. Elsewhere: atomic on HDFS (namenode CAS),
    // documented best-effort on object stores, where the namespace
    // lease is the real guard.
    val localLock: Option[java.nio.file.Path] =
      if ("file".equalsIgnoreCase(Option(fs.getUri.getScheme).getOrElse("")))
        Some(java.nio.file.Paths.get(lock.toUri.getPath))
      else None
    def tryCreate(): Unit = localLock match {
      case Some(p) => java.nio.file.Files.createFile(p)
      case None => fs.create(lock, false).close()
    }
    var acquired = false
    while (!acquired) {
      // Only CONTENTION (the lock file actually existing) waits; a
      // connectivity/permission IOException surfaces immediately
      // instead of masquerading as a 30s-stale lock
      try { tryCreate(); acquired = true }
      catch {
        case e: java.io.IOException =>
          val contended = e.isInstanceOf[
              java.nio.file.FileAlreadyExistsException] ||
            (try fs.exists(lock) catch { case _: java.io.IOException => false })
          if (!contended) throw e
          if (System.currentTimeMillis() > deadline)
            throw new IllegalStateException(
              s"ledger lock $lock held for >30s; remove it if stale")
          Thread.sleep(50)
      }
    }
    try body finally {
      try fs.delete(lock, false)
      catch { case _: java.io.IOException => () }
    }
  }

  /** dependency gate — reference Satisfied() model/metadata.go:12 +
    * processEdges dependency_manager.go:60-93. */
  def satisfied(id: String): Boolean =
    all().where(col("_id") === id && col("completed") && !col("has_errors"))
      .limit(1).count() > 0
}
