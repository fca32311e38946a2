package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.ops.{Cleaning, Features, Quality}
import graft.ops.Cleaning.RangeRule

/** ScalaCheck invariants (SURVEY.md §5.2.3). Each case runs a real local
  * Spark job on a small frame, so the case count is kept deliberately low. */
object InvariantProps extends Properties("graft") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val values = Gen.listOfN(40, Gen.chooseNum(-100.0, 100.0))

  property("cleaning output ⊆ input and satisfies every rule") =
    forAll(values, Gen.chooseNum(-50.0, 0.0), Gen.chooseNum(0.0, 50.0)) { (xs, lo, hi) =>
      val df = xs.toDF("x")
      val rules = Seq(RangeRule("x", Some(lo), Some(hi)))
      val out = Cleaning.applyRules(df, rules).as[Double].collect()
      out.forall(v => v > lo && v < hi) && out.length <= xs.length
    }

  property("bucketize is total and order-preserving") =
    forAll(values) { xs =>
      val labels = Seq("a", "b", "c")
      val splits = Seq(-10.0, 10.0)
      val got = xs.toDF("x")
        .select(col("x"), Features.bucketize(col("x"), splits, labels).as("b"))
        .collect().map(r => (r.getDouble(0), r.getString(1)))
      val rank = labels.zipWithIndex.toMap
      got.forall { case (_, b) => rank.contains(b) } &&
        got.sortBy(_._1).map(r => rank(r._2)).toSeq.sliding(2).forall {
          case Seq(p, n) => p <= n
          case _ => true
        }
    }

  property("quality score ∈ [0,100]") =
    forAll(values) { xs =>
      val df = xs.toDF("x")
      val rules = Seq(Quality.Rule("neg", col("x") < 0))
      val s = Quality.report(df, Seq("x"), rules).qualityScore
      s >= 0.0 && s <= 100.0
    }

  property("cosine similarity is bounded in [-1, 1] and reflexive") =
    forAll(Gen.listOfN(8, Gen.chooseNum(-10.0f, 10.0f)).suchThat(_.exists(_ != 0f))) { xs =>
      val df = Seq((xs.toArray, xs.toArray)).toDF("a", "b")
      val self = df.select(graft.ops.Similarity.cosine(col("a"), col("b"))).as[Double].collect()(0)
      math.abs(self - 1.0) < 1e-9
    }

  property("df-cap keeps exactly the shingles at or under the cap") =
    forAll(Gen.listOfN(30, Gen.zip(Gen.chooseNum(0L, 5L), Gen.oneOf("s1", "s2", "s3", "s4"))),
      Gen.chooseNum(1L, 5L)) { (pairs, cap) =>
      val sh = pairs.distinct.toDF("doc_id", "shingle")
      val df = pairs.distinct.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val kept = graft.ops.Dedup.capDocumentFrequency(sh, cap)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      kept == pairs.distinct.filter(p => df(p._2) <= cap).toSet
    }

  property("CentroidAgg merge is commutative and finish is the per-position mean") =
    forAll(Gen.listOfN(5, Gen.listOfN(3, Gen.chooseNum(-10.0f, 10.0f))),
      Gen.listOfN(5, Gen.listOfN(2, Gen.chooseNum(-10.0f, 10.0f)))) { (xs, ys) =>
      import graft.expressions.CentroidAgg
      val bx = xs.map(_.toArray).foldLeft(CentroidAgg.zero)(CentroidAgg.reduce)
      val by = ys.map(_.toArray).foldLeft(CentroidAgg.zero)(CentroidAgg.reduce)
      val ab = CentroidAgg.finish(CentroidAgg.merge(bx, by)).toSeq
      val ba = CentroidAgg.finish(CentroidAgg.merge(by, bx)).toSeq
      val all = xs ++ ys
      val expect = (0 until 3).map { i =>
        val have = all.filter(_.length > i).map(_(i).toDouble)
        have.sum / have.size
      }
      ab == ba && ab.zip(expect).forall { case (a, e) => math.abs(a - e) < 1e-9 }
    }

  property("scan-based n-gram language ID equals the array form on random text") =
    forAll(Gen.listOfN(12, Gen.oneOf(
      Gen.alphaLowerStr.map(_.take(20)),
      Gen.oneOf("the rather", "ich scheue", "le dessin", "", "a", "zz")))) { texts =>
      val df = texts.toDF("text")
      val both = df.select(
        graft.ops.TextOps.langIdNgramScan(col("text")).as("scan"),
        graft.ops.TextOps.langIdNgram(
          graft.ops.TextOps.charBigrams(col("text"))).as("arr"))
      both.collect().forall(r => r.getString(0) == r.getString(1))
    }

  property("asofBackward equals the brute-force per-row definition") =
    forAll(
      Gen.listOfN(12, Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0L, 50L))),
      Gen.listOfN(12, Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0L, 50L)))) { (ls, rs) =>
      val left = ls.toDF("k", "lts")
      val right = rs.toDF("k", "rts")
      val got = graft.ops.AsOf.asofBackward(left, right, "k", "lts", "rts")
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          Option(r.get(2)).map(_.asInstanceOf[Long])).toMap
      // brute force: greatest right ts <= left ts within the key
      ls.forall { case (k, lt) =>
        val expect = rs.filter(r => r._1 == k && r._2 <= lt)
          .map(_._2).maxOption
        got((k, lt)) == expect
      }
    }

  property("winnowFromHashes equals the naive sliding-window minimum") =
    forAll(Gen.listOfN(10, Gen.alphaLowerStr.map(s => s.take(6) + "x"))) { hs =>
      val got = Seq(Tuple1(hs)).toDF("hashes")
        .select(graft.ops.TextOps.winnowFromHashes(col("hashes"), w = 4).as("f"))
        .as[Seq[String]].collect()(0)
      val expect =
        if (hs.length >= 4) hs.sliding(4).map(_.min).toSeq.distinct
        else Seq(hs.min)
      got == expect
    }

  property("group counts sum to total count") =
    forAll(Gen.listOfN(40, Gen.oneOf("a", "b", "c"))) { ks =>
      val df = ks.toDF("k")
      val grouped = df.groupBy("k").count().agg(sum("count")).as[Long].collect()(0)
      grouped == ks.length.toLong
    }

  property("distributed prefix sum equals the sequential scan on random data") =
    forAll(Gen.listOfN(25, Gen.chooseNum(0L, 50L)), Gen.chooseNum(2, 7)) { (vs, parts) =>
      val rows = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val got = graft.ops.Packing.prefixSum(rows.toDF("k", "v"), "k", "v", parts)
        .select("k", "__prior")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expect = rows.sortBy(_._1).map(_._2).scanLeft(0L)(_ + _)
      rows.indices.forall(i => got(i.toLong) == expect(i))
    }

  property("chunkHashes equals the per-block md5 reference (order, dedup, empty)") =
    forAll(Gen.listOfN(3, Gen.oneOf(
      // random text (never collides) AND repeated aligned blocks (forces
      // the dedup path — random alphanumerics alone would leave
      // array_distinct untested)
      Gen.chooseNum(0, 150).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString)),
      Gen.chooseNum(2, 4).map(k => "x" * 64 * k),
      Gen.chooseNum(1, 3).map(k => ("ab" * 32) * k + "tail")))) { texts =>
      val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("media_id", "text")
        .select(col("media_id"), col("text").cast("binary").as("payload"))
        .select(col("media_id"), graft.ops.Multimodal.chunkHashes(col("payload")).as("ch"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      def md5hex(b: Array[Byte]): String =
        java.security.MessageDigest.getInstance("MD5").digest(b)
          .map("%02x".format(_)).mkString
      texts.zipWithIndex.forall { case (t, i) =>
        val expect = t.getBytes("UTF-8").grouped(64).map(md5hex).toSeq.distinct
        got(i.toLong) == expect
      }
    }

  property("contamination equals the brute-force shingle-set intersection") =
    forAll(
      Gen.listOfN(6, Gen.listOfN(8, Gen.oneOf("a", "b", "c", "d"))),
      Gen.listOfN(2, Gen.listOfN(8, Gen.oneOf("a", "b", "c", "d")))) { (trainToks, evalToks) =>
      val k = 3
      def shingles(ts: List[String]): Set[String] =
        if (ts.length >= k) ts.sliding(k).map(_.mkString(" ")).toSet
        else Set(ts.mkString(" "))
      val train = trainToks.zipWithIndex.map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
      val ev = evalToks.zipWithIndex.map { case (ts, i) => (100L + i, ts.mkString(" ")) }
      val got = graft.ops.Decontam.contamination(
        train.toDF("doc_id", "text"), ev.toDF("doc_id", "text"), k = k)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val evSh = ev.map { case (id, t) => id -> shingles(t.split(" ").toList) }
      train.forall { case (id, t) =>
        val sh = shingles(t.split(" ").toList)
        val hitDocs = evSh.filter(e => (sh & e._2).nonEmpty)
        val sharedShingles = sh & evSh.flatMap(_._2).toSet
        if (hitDocs.isEmpty) !got.contains(id)
        else got.get(id).contains((hitDocs.size.toLong, sharedShingles.size.toLong))
      }
    }

  property("applyChangeLog equals the in-memory MERGE semantics on random changelogs") =
    forAll(
      Gen.listOfN(10, Gen.zip(Gen.chooseNum(0L, 6L), Gen.chooseNum(0, 99))),
      Gen.listOfN(10, Gen.zip(Gen.zip(Gen.chooseNum(0L, 8L), Gen.chooseNum(0, 99)),
        Gen.zip(Gen.oneOf("upsert", "delete"), Gen.chooseNum(1L, 5L))))) { (tgt, chs) =>
      val target = tgt.groupBy(_._1).view.mapValues(_.head._2).toSeq
        .map { case (k, v) => (k, v) } // unique keys
      val changes = chs.zipWithIndex.map { case (((k, v), (op, seq)), i) =>
        // make (key, seq) unique per the contract: spread seq by index
        (k, v, op, seq * 100L + i)
      }
      val got = graft.ops.Merge.applyChangeLog(
        target.toDF("k", "v"), changes.toDF("k", "v", "op", "seq"), Seq("k"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val latest = changes.groupBy(_._1).view.mapValues(_.maxBy(_._4)).toMap
      val expect = (target.map(t => t._1 -> t._2).toMap ++
        latest.collect { case (k, (_, v, "upsert", _)) => k -> v })
        .removedAll(latest.collect { case (k, (_, _, "delete", _)) => k })
      got == expect
    }

  property("retractStats equals the direct recompute over survivors on random deletes") =
    forAll(
      Gen.listOfN(24, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.chooseNum(-50, 50))),
      Gen.listOfN(24, Gen.oneOf(true, false))) { (rows, mask0) =>
      val data = rows.zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v.toDouble) }
      val mask = mask0.padTo(data.size, false)
      val deletes = data.zip(mask).collect { case (r, true) => r }
      val remaining = data.zip(mask).collect { case (r, false) => r }
      val keys = Seq("g")
      def fin(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), Option(r.get(2)), Option(r.get(4)), Option(r.get(5))))).toMap
      val got = fin(graft.ops.Merge.finalizeStats(
        graft.ops.Merge.retractStats(
          graft.ops.Merge.partialStats(data.toDF("id", "g", "v"), keys, "v"),
          deletes.toDF("id", "g", "v"), remaining.toDF("id", "g", "v"), keys, "v"),
        keys))
      val direct = fin(graft.ops.Merge.finalizeStats(
        graft.ops.Merge.partialStats(remaining.toDF("id", "g", "v"), keys, "v"), keys))
      got == direct
    }

  property("sessionize equals the sequential per-user fold") =
    forAll(Gen.listOfN(20,
      Gen.zip(Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 8000L)))) { evs =>
      val gap = 1000L
      val rows = evs.zipWithIndex.map { case ((u, t), i) => (i.toLong, u, t) }
      val df = rows.toDF("event_id", "user_id", "us")
        .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      val got = graft.ops.Funnel.sessionize(df, gapMicros = gap)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      // reference: per user, walk events in (t, id) order and split on gap
      val expect = rows.groupBy(_._2).flatMap { case (u, es) =>
        val ordered = es.sortBy(e => (e._3, e._1))
        val sessions = ordered.foldLeft(List.empty[List[(Long, Long, Long)]]) {
          case (Nil, e) => List(List(e))
          case (cur :: done, e) =>
            if (e._3 - cur.head._3 > gap) List(e) :: cur :: done
            else (e :: cur) :: done
        }.reverse.map(_.reverse)
        sessions.zipWithIndex.map { case (s, i) =>
          (u, (i + 1).toLong) -> (s.size.toLong, s.last._3 - s.head._3)
        }
      }
      got == expect
    }

  private val ivSide = Gen.listOfN(10,
    Gen.zip(Gen.chooseNum(0L, 2L), Gen.chooseNum(0.0, 40.0), Gen.chooseNum(0.0, 15.0)))

  property("intervalOverlap equals the naive overlap join for random keyed intervals and widths") =
    forAll(ivSide, ivSide, Gen.oneOf(0.5, 3.0, 10.0, 100.0)) { (ls, rs, w) =>
      // len 0 yields EMPTY intervals — the half-open boundary case
      val left = ls.zipWithIndex.map { case ((k, lo, len), i) => (i.toLong, k, lo, lo + len) }
      val right = rs.zipWithIndex.map { case ((k, lo, len), i) => (i.toLong, k, lo, lo + len) }
      val got = graft.ops.RangeJoin.intervalOverlap(
        left.toDF("lid", "lk", "llo", "lhi"), right.toDF("rid", "rk", "rlo", "rhi"),
        "llo", "lhi", "rlo", "rhi", w, keys = Seq("lk" -> "rk"))
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val expect = (for {
        (li, lk, llo, lhi) <- left
        (ri, rk, rlo, rhi) <- right
        if lk == rk && math.max(llo, rlo) < math.min(lhi, rhi)
      } yield (li, ri)).sorted
      got == expect // Seq equality: exactly-once emission, not just the same set
    }

  property("triangles equals the naive wedge enumeration on random graphs") =
    forAll(Gen.listOfN(25, Gen.zip(Gen.chooseNum(0L, 12L), Gen.chooseNum(0L, 12L)))) { es =>
      val got = graft.ops.Graph.triangles(es.toDF("id1", "id2"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val e = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter { case (a, b) => a != b }.toSet
      val expect = for {
        (a, b) <- e; (b2, c) <- e if b2 == b; if e.contains((a, c))
      } yield (a, b, c)
      got == expect
    }

  property("bloom probe never false-negatives on random inserted values") =
    forAll(Gen.listOfN(20, Gen.identifier)) { vs =>
      val rows = vs.map(("g", _)).toDF("g", "val")
      val pos = graft.ops.Merge.bloomPositionsFast(col("val"), 512L, 2)
      val state = graft.ops.Merge.bloomState(rows, Seq("g"), pos)
      graft.ops.Merge.bloomProbe(state, rows, Seq("g"), pos)
        .filter(!col("maybe_member")).count() == 0L
    }

  property("saltedJoinHot == plain join on random skewed tables, any hot-key set") =
    forAll(
      // a skew-prone key domain (0-3) so duplicates and hot keys occur,
      // plus an arbitrary subset of keys declared hot — INCLUDING keys
      // absent from either side and sets that are wrong about the skew
      Gen.listOfN(30, Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0, 99))),
      Gen.listOfN(6, Gen.zip(Gen.chooseNum(0L, 4L), Gen.identifier)),
      Gen.someOf(0L, 1L, 2L, 3L, 4L),
      Gen.chooseNum(1, 7)) { (bigRows, smallRows, hot, salts) =>
      val big = bigRows.toDF("k", "payload")
      val small = smallRows.toDF("k", "name")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("k", "payload", "name").collect()
          .map(_.toSeq.mkString("|")).sorted.toSeq
      val inner = rows(graft.ops.Skew.saltedJoinHot(big, small, "k", hot.toSeq, salts)) ==
        rows(big.join(small, Seq("k")))
      val left = rows(graft.ops.Skew.saltedJoinHot(big, small, "k", hot.toSeq, salts,
        joinType = "left")) == rows(big.join(small, Seq("k"), "left"))
      inner && left
    }
}
