package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DecontamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // eval doc 100 leaks verbatim into train doc 1 (one shared 5-gram run);
  // train doc 2 shares only short (<5-gram) overlap; doc 3 is disjoint
  private def train = Seq(
    (1L, "alpha beta gamma delta epsilon zeta unrelated tail words here"),
    (2L, "alpha beta gamma completely different suffix tokens now follow"),
    (3L, "totally disjoint vocabulary with no overlap at all present")).toDF("doc_id", "text")

  private def evalSet = Seq(
    (100L, "alpha beta gamma delta epsilon zeta"),
    (101L, "another benchmark item with its own words")).toDF("doc_id", "text")

  test("contamination flags only docs sharing a full 5-gram with the eval set") {
    val byDoc = Decontam.contamination(train, evalSet, k = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byDoc.keySet == Set(1L))
    // "alpha beta gamma delta epsilon" and "beta gamma delta epsilon zeta"
    assert(byDoc(1L) == ((1L, 2L)))
  }

  test("hashed production form matches the string form on the real corpus") {
    val docs = graft.model.Tables.documents(spark, TestSpark.sfDir)
    val tr = docs.filter(col("doc_id") % 20 =!= 7)
    val ev = docs.filter(col("doc_id") % 20 === 7)
    val exact = Decontam.contamination(tr, ev, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hashed = Decontam.contaminationHashed(tr, ev, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(hashed == exact)
    assert(exact.nonEmpty) // the corpus's planted near-dups guarantee hits
  }

  test("decontaminated = train minus flagged ids; short docs fall back to whole-text match") {
    val survivors = Decontam.decontaminated(train, evalSet, k = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(2L, 3L))
    // totality rule: a <5-token eval doc contaminates an identical train doc
    val shortTrain = Seq((10L, "tiny leaked item")).toDF("doc_id", "text")
    val shortEval = Seq((200L, "tiny leaked item")).toDF("doc_id", "text")
    assert(Decontam.contamination(shortTrain, shortEval, k = 5).count() == 1L)
  }
}
