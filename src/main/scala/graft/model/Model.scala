package graft.model

/** Core model types, mirroring the reference's `model` package semantics
  * (see /root/reference/model/namespace.go, migrations.go, metadata.go,
  * generator.go) re-expressed as Scala case classes over Spark tables.
  *
  * A "namespace" (db, collection) maps to a parquet path `<root>/<collection>
  * .parquet` in the driver's test layout, or a catalog `db.table` in a real
  * deployment.
  */
final case class Namespace(db: String, collection: String) {
  /** reference: model/namespace.go:11 (`String() = db.coll`) */
  override def toString: String = s"$db.$collection"
  /** reference: model/namespace.go:14-33 — non-empty parts, db <= 64 chars. */
  def isValid: Boolean =
    db.nonEmpty && collection.nonEmpty && db.length <= 64
  /** Resolve to a parquet path under a root directory (driver test layout). */
  def path(root: String): String = s"$root/$collection.parquet"
}

/** reference: model/generator.go:6-13 (GeneratorOptions).
  * `idColumn` names the unique row key used by the Limit work-list join
  * (the reference keys work on Mongo's implicit `_id`); when unset the
  * first column is assumed unique and validated at run time. */
final case class GeneratorOptions(
    jobId: String,
    dependsOn: Seq[String] = Nil,
    ns: Namespace,
    query: Map[String, Any] = Map.empty,
    limit: Int = 0,
    sortBy: Seq[String] = Nil,
    idColumn: Option[String] = None) {
  /** reference: model/generator.go:15-33 (IsValid). */
  def isValid: Boolean = jobId.nonEmpty && ns.isValid
}

/** The three migration families — reference: model/migrations.go:10-69. */
sealed trait MigrationSpec {
  def options: GeneratorOptions
  def id: String = options.jobId
}

/** Declarative migration: a MongoDB-style update document applied to every
  * matching row. reference: model/migrations.go:10-34 (Simple). */
final case class SimpleMigration(
    options: GeneratorOptions,
    update: Map[String, Any]) extends MigrationSpec

/** Imperative per-row migration: a registered operation name resolved from
  * the environment registry. reference: model/migrations.go:36-50 (Manual). */
final case class ManualMigration(
    options: GeneratorOptions,
    operationName: String) extends MigrationSpec

/** Whole-stream migration: a registered processor consumes the full matching
  * stream. reference: model/migrations.go:52-69 (Stream). */
final case class StreamMigration(
    options: GeneratorOptions,
    processorName: String) extends MigrationSpec

/** Migration bookkeeping ledger row — reference: model/metadata.go:4-12.
  * Persisted per migration id; `satisfied` gates dependent migrations
  * (dependency_manager.go:60-93). */
final case class MigrationMetadata(
    _id: String,
    migration: String,
    has_errors: Boolean,
    completed: Boolean) {
  def satisfied: Boolean = completed && !has_errors
}

/** reference: model/config.go:7-37 (Configuration / ConfigurationOptions).
  * `leaseWaitMs` bounds how long a migration waits for another app's
  * namespace write lease before failing fast (0 = never wait). */
final case class ApplicationOptions(dryRun: Boolean = false, limit: Int = 0,
    leaseWaitMs: Long = 10000L)

final case class Configuration(
    options: ApplicationOptions = ApplicationOptions(),
    simpleMigrations: Seq[SimpleMigration] = Nil,
    manualMigrations: Seq[ManualMigration] = Nil,
    streamMigrations: Seq[StreamMigration] = Nil)
