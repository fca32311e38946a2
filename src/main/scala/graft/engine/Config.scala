package graft.engine

/** Env-driven typed configuration with up-front validation — the
  * reference's settings dataclasses re-expressed (reference:
  * src/config/settings.py:7-50 reads the POSTGRES_, SPARK_ and DATA_
  * env-var families into dataclasses and raises on missing critical
  * values at import time). Differences, deliberate:
  *
  *  - Validation returns `Either` instead of throwing at class-load
  *    (settings.py crashes the whole process on a missing var even for
  *    code paths that never touch Postgres).
  *  - The JDBC block is optional as a unit: absent = no JDBC sink
  *    configured (fine); PARTIALLY present = a configuration error caught
  *    before the first write, not a connect-time failure on an executor.
  *  - Env names are engine-prefixed (`GRAFT_*`) so a deployment can host
  *    both engines side by side without variable collisions.
  */
object Config {

  final case class Jdbc(host: String, port: Int, database: String,
                        user: String, password: String,
                        urlOverride: Option[String] = None) {
    /** Spark-ready JDBC url — the postgres form settings.py builds, or
      * `GRAFT_JDBC_URL` verbatim for any other dialect (embedded Derby in
      * tests, say). */
    def url: String = urlOverride.getOrElse(s"jdbc:postgresql://$host:$port/$database")
  }

  final case class Engine(
      master: String,
      appName: String,
      shufflePartitions: Int,
      batchSize: Int,
      dataDir: String,
      outDir: String,
      jdbc: Option[Jdbc],
      guard: PlanGuard.Policy = PlanGuard.Policy.default)

  /** Parse + validate. Pass a custom map in tests; defaults mirror the
    * reference's (batch 100000 — .env.example:15; shuffle partitions
    * actually applied, unlike the reference — SURVEY.md §4.1). */
  def fromEnv(env: Map[String, String] = sys.env): Either[String, Engine] = {
    def int(key: String, dflt: Int): Either[String, Int] =
      env.get(key) match {
        case None => Right(dflt)
        case Some(v) => v.toIntOption.filter(_ > 0)
          .toRight(s"$key must be a positive integer, got '$v'")
      }

    // GRAFT_JDBC_URL alone is a complete configuration (the urlOverride
    // path for non-Postgres dialects needs no host/db); without it, the
    // postgres-form triple must be complete as a unit.
    val jdbcKeys = Seq("GRAFT_JDBC_HOST", "GRAFT_JDBC_DB", "GRAFT_JDBC_USER")
    val present = jdbcKeys.filter(env.contains)
    val jdbc: Either[String, Option[Jdbc]] =
      if (present.isEmpty && !env.contains("GRAFT_JDBC_URL")) Right(None)
      else if (!env.contains("GRAFT_JDBC_URL") && present.size < jdbcKeys.size)
        Left(s"partial JDBC config: missing ${jdbcKeys.diff(present).mkString(", ")}")
      else int("GRAFT_JDBC_PORT", 5432).map { port =>
        Some(Jdbc(env.getOrElse("GRAFT_JDBC_HOST", ""), port,
          env.getOrElse("GRAFT_JDBC_DB", ""),
          env.getOrElse("GRAFT_JDBC_USER", ""),
          env.getOrElse("GRAFT_JDBC_PASSWORD", ""),
          env.get("GRAFT_JDBC_URL")))
      }

    // PlanGuard thresholds, env-tunable per deployment (MiB units — the
    // values are logical-plan size estimates, see PlanGuard's scaladoc);
    // GRAFT_GUARD_FORBID_UDFS holds ad-hoc queries to the engine's own
    // zero-UDF bar. The write-funnel cap of the same family,
    // GRAFT_GUARD_MAX_WRITE_PARTITIONS, is read at the sink seam by
    // [[WriteGuard.maxWritePartitionsFromEnv]] (the sinks take no policy
    // object to thread it through) with the same fail-loud validation.
    // bounded above so `_ << 20` can't wrap: a silently-negative threshold
    // would reject every plan with no configuration error to explain why
    def mib(key: String, dfltBytes: Long): Either[String, Long] =
      env.get(key) match {
        case None => Right(dfltBytes)
        case Some(v) => v.toLongOption
          .filter(n => n > 0 && n <= (Long.MaxValue >> 20)).map(_ << 20)
          .toRight(s"$key must be a positive integer (MiB, ≤ ${Long.MaxValue >> 20}), got '$v'")
      }
    def bool(key: String, dflt: Boolean): Either[String, Boolean] =
      env.get(key) match {
        case None => Right(dflt)
        case Some(v) => v.toLowerCase match {
          case "true" | "1"  => Right(true)
          case "false" | "0" => Right(false)
          case other => Left(s"$key must be true/false, got '$other'")
        }
      }
    val dflt = PlanGuard.Policy.default
    val guard: Either[String, PlanGuard.Policy] = for {
      loop <- mib("GRAFT_GUARD_MAX_LOOP_BUILD_MB", dflt.maxLoopBuildBytes)
      win <- mib("GRAFT_GUARD_MAX_GLOBAL_WINDOW_MB", dflt.maxGlobalWindowBytes)
      sort <- mib("GRAFT_GUARD_MAX_GLOBAL_SORT_MB", dflt.maxGlobalSortBytes)
      expand <- mib("GRAFT_GUARD_MAX_EXPAND_MB", dflt.maxExpandBytes)
      udfs <- bool("GRAFT_GUARD_FORBID_UDFS", dflt.forbidUdfs)
      expandFatal <- bool("GRAFT_GUARD_EXPAND_FATAL", dflt.expandFatal)
      aggSlivers <- bool("GRAFT_GUARD_ASSUME_AGG_SLIVERS", dflt.assumeAggSlivers)
    } yield PlanGuard.Policy(loop, win, sort, expand, udfs, expandFatal, aggSlivers)

    for {
      parts <- int("GRAFT_SHUFFLE_PARTITIONS",
        Runtime.getRuntime.availableProcessors())
      batch <- int("GRAFT_BATCH_SIZE", 100000)
      j <- jdbc
      g <- guard
    } yield Engine(
      master = env.getOrElse("GRAFT_MASTER", s"local[*]"),
      appName = env.getOrElse("GRAFT_APP_NAME", "graft"),
      shufflePartitions = parts,
      batchSize = batch,
      dataDir = env.getOrElse("GRAFT_DATA_DIR", "/root/testdata/sf0.001"),
      outDir = env.getOrElse("GRAFT_OUT_DIR", "/tmp/graft-out"),
      jdbc = j,
      guard = g)
  }
}
