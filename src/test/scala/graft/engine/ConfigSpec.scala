package graft.engine

import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  test("defaults apply with an empty environment; JDBC absent is valid") {
    val c = Config.fromEnv(Map.empty).toOption.get
    assert(c.batchSize == 100000 && c.jdbc.isEmpty && c.shufflePartitions > 0)
  }

  test("full JDBC block parses and builds a Spark-ready url") {
    val c = Config.fromEnv(Map(
      "GRAFT_JDBC_HOST" -> "db.internal", "GRAFT_JDBC_DB" -> "warehouse",
      "GRAFT_JDBC_USER" -> "etl", "GRAFT_JDBC_PASSWORD" -> "s3cret")).toOption.get
    assert(c.jdbc.get.url == "jdbc:postgresql://db.internal:5432/warehouse")
  }

  test("partial JDBC config is an error naming the missing keys, not a runtime surprise") {
    val e = Config.fromEnv(Map("GRAFT_JDBC_HOST" -> "db")).swap.toOption.get
    assert(e.contains("GRAFT_JDBC_DB") && e.contains("GRAFT_JDBC_USER"))
  }

  test("GRAFT_JDBC_URL alone is a complete configuration (urlOverride dialect path)") {
    val c = Config.fromEnv(Map(
      "GRAFT_JDBC_URL" -> "jdbc:derby:/data/wh;create=true")).toOption.get
    assert(c.jdbc.get.url == "jdbc:derby:/data/wh;create=true")
  }

  test("non-numeric and non-positive ints are rejected with the offending key") {
    assert(Config.fromEnv(Map("GRAFT_BATCH_SIZE" -> "lots")).isLeft)
    assert(Config.fromEnv(Map("GRAFT_SHUFFLE_PARTITIONS" -> "0")).isLeft)
  }

  test("GRAFT_GUARD_* family parses into a PlanGuard policy; defaults otherwise") {
    val dflt = Config.fromEnv(Map.empty).toOption.get.guard
    assert(dflt == PlanGuard.Policy.default)
    val c = Config.fromEnv(Map(
      "GRAFT_GUARD_MAX_LOOP_BUILD_MB" -> "1",
      "GRAFT_GUARD_MAX_GLOBAL_WINDOW_MB" -> "16",
      "GRAFT_GUARD_MAX_GLOBAL_SORT_MB" -> "128",
      "GRAFT_GUARD_FORBID_UDFS" -> "true")).toOption.get.guard
    assert(c == PlanGuard.Policy(1L << 20, 16L << 20, 128L << 20, forbidUdfs = true))
    val bad = Config.fromEnv(Map("GRAFT_GUARD_MAX_LOOP_BUILD_MB" -> "big"))
    assert(bad.swap.toOption.get.contains("GRAFT_GUARD_MAX_LOOP_BUILD_MB"))
    assert(Config.fromEnv(Map("GRAFT_GUARD_FORBID_UDFS" -> "maybe")).isLeft)
  }

  test("config wires into the session factory (the settings->builder link the reference dropped)") {
    val c = Config.fromEnv(Map("GRAFT_SHUFFLE_PARTITIONS" -> "8",
      "GRAFT_APP_NAME" -> "cfg-smoke")).toOption.get
    Sessions.fromConfig(c) // builder constructs; shared test session stays untouched
  }
}
