package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TextOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def one[T](df: org.apache.spark.sql.DataFrame): T =
    df.collect()(0).getAs[T](0)

  test("token stats: count, type-token ratio, mean token length") {
    val df = Seq("aa bb aa cccc").toDF("text")
    assert(one[Long](df.select(TextOps.tokenCount(col("text")))) == 4L)
    assert(one[Double](df.select(TextOps.typeTokenRatio(col("text")))) == 0.75)
    assert(one[Double](df.select(TextOps.avgTokenLen(col("text")))) == 10.0 / 4)
  }

  test("stopwordRatio preserves multiplicity (repeated stopwords count)") {
    val df = Seq("the the cat").toDF("text")
    assert(one[Double](df.select(TextOps.stopwordRatio(col("text"), Seq("the")))) == 2.0 / 3)
  }

  test("qualityScore ∈ [0,100]: stopword-free long doc scores 100, all-stopword doc 0") {
    val long = Seq(Seq.fill(60)("word").mkString(" ")).toDF("text")
    assert(one[Double](long.select(TextOps.qualityScore(col("text"), Seq("the")))) == 100.0)
    val allStop = Seq(Seq.fill(60)("the").mkString(" ")).toDF("text")
    assert(one[Double](allStop.select(TextOps.qualityScore(col("text"), Seq("the")))) == 0.0)
    val short = Seq("word word").toDF("text") // length factor 2/50
    assert(one[Double](short.select(TextOps.qualityScore(col("text"), Seq("the")))) == 4.0)
  }

  test("bpeishTokens: contractions split, digit/letter/punct runs separate") {
    val got = Seq("Don't pay $1,234.56 twice!!").toDF("text")
      .select(TextOps.bpeishTokens(col("text")).as("t"))
      .as[Seq[String]].collect()(0)
    assert(got == Seq("Don", "'t", "pay", "$", "1", ",", "234", ".", "56", "twice", "!!"))
    val counts = Seq("Don't pay $1,234.56 twice!!", "   ", "", "plain words here")
      .toDF("text").select(TextOps.bpeishTokenCount(col("text")).as("n"))
      .as[Long].collect().toSeq
    assert(counts == Seq(11L, 0L, 0L, 3L)) // whitespace yields no subword tokens
  }

  test("langId: marker argmax, 'und' for no or tied evidence") {
    val df = Seq(
      "the cat of a house and a dog is here",
      "der hund und die katze ist da",
      "le chat et la maison est grande",
      "xyzzy qwerty",
      "la la la").toDF("text") // 'la' hits es AND fr equally → tie → und
    val got = df.select(TextOps.langId(col("text")).as("l")).as[String].collect().toSeq
    assert(got == Seq("en", "de", "fr", "und", "und"))
  }

  test("charBigrams + n-gram langId: natural text classifies by character profile") {
    val df = Seq(
      "the weather here is rather interesting and warm",
      "ich scheue die schlechten geschichten und steige ein",
      "xqxq zzzz").toDF("text")
    val got = df.select(TextOps.charBigrams(col("text")).as("bg"))
      .select(TextOps.langIdNgram(col("bg")).as("l")).as[String].collect().toSeq
    assert(got(0) == "en" && got(1) == "de" && got(2) == "und")
    val bg = df.limit(1).select(TextOps.charBigrams(col("text")).as("b"))
      .as[Seq[String]].collect()(0)
    assert(bg.contains("th") && bg.contains("he") && !bg.exists(_.length > 2))
  }

  test("langIdNgramScan == langIdNgram(charBigrams) on fixtures and the real corpus") {
    val fixtures = Seq(
      "the weather here is rather interesting and warm",
      "ich scheue die schlechten geschichten und steige ein",
      "le dessin que vous aimez est pour moi",
      "xqxq zzzz", "", "a").toDF("text")
    val corpus = graft.model.Tables.documents(spark, graft.TestSpark.sfDir)
      .select(col("text"))
    for (df <- Seq(fixtures, corpus)) {
      val both = df.select(
        TextOps.langIdNgramScan(col("text")).as("scan"),
        TextOps.langIdNgram(TextOps.charBigrams(col("text"))).as("arr"))
      assert(both.filter(col("scan") =!= col("arr")).count() == 0)
    }
  }

  test("positionalShingles keeps duplicates and document order") {
    val got = Seq("a b a b a").toDF("text")
      .select(TextOps.positionalShingles(col("text"), 2).as("s"))
      .as[Seq[String]].collect()(0)
    assert(got == Seq("a b", "b a", "a b", "b a"))
  }

  test("winnowFromHashes: sliding window minima, dedup'd; short arrays → global min") {
    val df = Seq(Tuple1(Seq("d", "c", "b", "a", "e"))).toDF("hashes")
    val got = df.select(TextOps.winnowFromHashes(col("hashes"), w = 2).as("f"))
      .as[Seq[String]].collect()(0)
    assert(got == Seq("c", "b", "a")) // windows: dc→c, cb→b, ba→a, ae→a
    val short = Seq(Tuple1(Seq("z", "m"))).toDF("hashes")
    assert(short.select(TextOps.winnowFromHashes(col("hashes"), w = 4).as("f"))
      .as[Seq[String]].collect()(0) == Seq("m"))
  }

  test("docSegments: fixed-width windows, short tail kept, one segment per short doc") {
    val docs = Seq((1L, "a b c d e"), (2L, "x")).toDF("doc_id", "text")
    val got = TextOps.docSegments(docs, "doc_id", "text", segTokens = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(got == Set((1L, 0, "a b"), (1L, 1, "c d"), (1L, 2, "e"), (2L, 0, "x")))
  }

  test("removeBoilerplate: shared segments drop everywhere, unique ones survive in order") {
    val docs = Seq(
      (1L, "copy right one two"),  // "copy right" shared with docs 2,3
      (2L, "copy right three four"),
      (3L, "copy right copy right")) // reduces to nothing
      .toDF("doc_id", "text")
    val rows = TextOps.removeBoilerplate(docs, "doc_id", "text", segTokens = 2, minDocs = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(rows(1L) == ((2L, 1L, "one two")))
    assert(rows(2L) == ((2L, 1L, "three four")))
    assert(rows(3L) == ((2L, 2L, "")))   // fully-boilerplate doc stays, empty
  }

  test("removeBoilerplate: hashed-key production plan equals the string-key plan on the corpus") {
    val docs = graft.model.Tables.documents(spark, TestSpark.sfDir)
    def canon(hashed: Boolean) =
      TextOps.removeBoilerplate(docs, "doc_id", "text", 8, 2, hashedKeys = hashed)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(canon(hashed = true) == canon(hashed = false))
  }

  test("canonicalizeUrl: scheme/case/port/query/fragment/slash variants collapse; idempotent") {
    val cases = Seq(
      "HTTP://WWW.Example.COM/A/b"            -> "https://www.example.com/A/b",
      "https://example.com:443/x/"            -> "https://example.com/x",
      "http://example.com:80/x?utm_source=a"  -> "https://example.com/x",
      "https://example.com/x#frag"            -> "https://example.com/x",
      "https://example.com/x///"              -> "https://example.com/x",
      "https://example.com:8080/x"            -> "https://example.com:8080/x", // non-default port kept
      "https://example.com"                   -> "https://example.com")
    val got = cases.map(_._1).toDF("url")
      .select(TextOps.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._2))
    // idempotence: canonical(canonical(u)) == canonical(u)
    val twice = cases.map(_._1).toDF("url")
      .select(TextOps.canonicalizeUrl(TextOps.canonicalizeUrl(col("url"))).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(twice == got)
  }

  test("removeBoilerplate guards: minDocs < 2 and segTokens < 1 rejected") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      TextOps.removeBoilerplate(docs, "doc_id", "text", 2, 1))
    intercept[IllegalArgumentException](
      TextOps.docSegments(docs, "doc_id", "text", 0))
  }
}
