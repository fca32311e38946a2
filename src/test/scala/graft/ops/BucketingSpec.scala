package graft.ops

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.model.Tables

class BucketingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("co-bucketed join plans with zero Exchange (shuffle-free fact join)") {
    val dir = Files.createTempDirectory("graft-bucket").toString
    // at smoke scale Catalyst would just broadcast the 1500-row orders
    // table (also shuffle-free, but not what's under test) — disable the
    // threshold to simulate two broadcast-ineligible facts
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        Tables.lineitem(spark, TestSpark.sfDir), "li_bkt", s"$dir/li", "l_orderkey", 8)
      Bucketing.writeBucketed(
        Tables.orders(spark, TestSpark.sfDir), "ord_bkt", s"$dir/ord", "o_orderkey", 8)

      val joined = Bucketing.cooperativeJoin(spark, "li_bkt", "ord_bkt", "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.sparkPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")

      // and it is still a correct join
      val li = Tables.lineitem(spark, TestSpark.sfDir)
      val ord = Tables.orders(spark, TestSpark.sfDir)
      val expected = li.join(ord, li("l_orderkey") === ord("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      Seq("li_bkt", "ord_bkt").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
