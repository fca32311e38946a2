package graft.ops

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Weekly cohort retention: Monday bucketing, offset arithmetic, distinct
  * counting within a cell. */
class RetentionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // 2024-01-01 is a Monday
  private def t(s: String) = Timestamp.valueOf(s)

  test("cohort = Monday of first activity; offsets count whole weeks; users distinct per cell") {
    val log = Seq(
      // u1: first Wed of week 0, active again twice in week 2
      (1L, t("2024-01-03 10:00:00")),
      (1L, t("2024-01-16 09:00:00")), (1L, t("2024-01-17 09:00:00")),
      // u2: first Sunday of week 0 (still cohort 2024-01-01), active week 1
      (2L, t("2024-01-07 23:59:59")), (2L, t("2024-01-08 00:00:01")),
      // u3: cohort week 1 only
      (3L, t("2024-01-10 12:00:00"))
    ).toDF("user_id", "ts")
    val got = Retention.weeklyCohorts(log)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("2024-01-01", 0L) -> 2L, // u1 + u2 in their own cohort week
      ("2024-01-01", 1L) -> 1L, // u2
      ("2024-01-01", 2L) -> 1L, // u1 (two events, one distinct user)
      ("2024-01-08", 0L) -> 1L  // u3
    ))
  }
}
