package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.TestSpark

/** Decimal-bound property sweep (VERDICT r10 ask #7): drives the moment
  * state's integer power sums to the documented contract edges.
  *
  * The [[Merge.partialMomentState]] contract is integral values with
  * |v| ≤ 55,000 — v⁴ must fit a long BEFORE the DECIMAL(38,0) cast
  * carries the per-key SUM losslessly past the long range. These
  * properties prove all three sides of that contract on real Spark jobs:
  *
  *   1. WITHIN the bound (including values pinned AT ±55,000), the whole
  *      build→merge→retract→finalize path is bit-identical to a BigInt
  *      reference fold pushed through the same fixed IEEE shape — i.e.
  *      the decimal carry really is lossless even when Σv⁴ exceeds
  *      Long.MaxValue by orders of magnitude.
  *   2. BEYOND the long-overflow edge (|v| ≥ 55,109 makes v⁴ overflow),
  *      the build FAILS LOUDLY — Spark 4's ANSI arithmetic raises instead
  *      of wrapping, so a contract violation can never ship a silently
  *      wrong skewness to a dashboard.
  *   3. Retraction guards fire on subset-contract violations (a delete
  *      state whose key the accumulated state never saw).
  */
object MomentBoundsProps extends Properties("moment-bounds") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  /** Values across the legal magnitude range, weighted toward the edges
    * (the interesting region: |v| near 55,000 where v⁴ ≈ 9.15e18 sits
    * just under Long.MaxValue ≈ 9.22e18). */
  private val boundedValue: Gen[Long] = Gen.frequency(
    3 -> Gen.chooseNum(-55000L, 55000L),
    2 -> Gen.oneOf(55000L, -55000L, 54999L, -54999L),
    1 -> Gen.chooseNum(-100L, 100L))

  private val rows: Gen[List[(String, Long)]] =
    Gen.listOfN(30, Gen.zip(Gen.oneOf("k1", "k2"), boundedValue))
      .suchThat(_.nonEmpty)

  /** BigInt reference: exact power sums → the same fixed IEEE finalize
    * shape as [[Merge.finalizeMoments]], term by term. */
  private def reference(vs: Seq[Long]): (Long, Double, Double, Double, Double) = {
    val n = vs.size.toLong
    val s = (1 to 4).map(p => vs.map(v => BigInt(v).pow(p)).sum)
    val nd = n.toDouble
    val mu = s(0).toDouble / nd
    val r2 = s(1).toDouble / nd
    val r3 = s(2).toDouble / nd
    val r4 = s(3).toDouble / nd
    val m2 = r2 - mu * mu
    val m3 = r3 - 3 * mu * r2 + 2 * mu * mu * mu
    val m4 = r4 - 4 * mu * r3 + 6 * mu * mu * r2 - 3 * mu * mu * mu * mu
    // degenerate groups (all-equal values, n=1) hit 0/0 → NaN; IEEE says
    // so on both sides, and rnd must not feed NaN/Inf to BigDecimal
    def rnd(x: Double) =
      if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
      else BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (n, mu, rnd(m2), rnd(m3 / math.pow(m2, 1.5)), rnd(m4 / (m2 * m2) - 3))
  }

  /** Bit-equality that treats NaN as equal to NaN (degenerate groups). */
  private def deq(a: Double, b: Double): Boolean =
    java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b)

  property("state at the ±55k edges finalizes bit-identical to a BigInt reference") =
    forAll(rows) { xs =>
      val df = xs.toDF("k", "v")
      val got = Merge.finalizeMoments(
        Merge.partialMomentState(df, Seq("k"), "v"), Seq("k"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3),
            r.getDouble(4), r.getDouble(5))).toMap
      xs.groupBy(_._1).forall { case (k, kvs) =>
        val (n, mu, varP, skew, kurt) = reference(kvs.map(_._2))
        val (gn, gmu, gvar, gskew, gkurt) = got(k)
        gn == n && deq(gmu, mu) && deq(gvar, varP) &&
          deq(gskew, skew) && deq(gkurt, kurt)
      }
    }

  property("Σv⁴ past Long range: the DECIMAL(38,0) carry stays exact (no silent saturation)") =
    forAll(Gen.chooseNum(500, 2000)) { n =>
      // n copies of the max-magnitude legal value: Σv⁴ = n·9.15e18 ≫
      // Long.MaxValue — only the decimal carry can hold it exactly
      val df = (1 to n).map(_ => ("k", 55000L)).toDF("k", "v")
      val s4 = Merge.partialMomentState(df, Seq("k"), "v")
        .select(col("s4").cast("string")).as[String].head()
      BigInt(s4) == BigInt(55000L).pow(4) * n
    }

  property("|v| past the v⁴-overflow edge fails LOUDLY, never wraps") =
    forAll(Gen.oneOf(55109L, 60000L, 100000L, -55109L, -92682L)) { v =>
      // ANSI arithmetic turns the long overflow into an error — the guard
      // that keeps an out-of-contract value from shipping a wrapped sum
      val df = Seq(("k", v)).toDF("k", "v")
      scala.util.Try(
        Merge.partialMomentState(df, Seq("k"), "v").collect()).isFailure
    }

  property("retract of a generated delete-subset == state built over the survivors") =
    forAll(rows, Gen.chooseNum(2, 5)) { (xs, mod) =>
      val all = xs.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
      val df = all.toDF("k", "v", "id")
      val deletes = df.filter(col("id") % mod === 0)
      val survivors = df.filter(col("id") % mod =!= 0)
      val retracted = Merge.retractMomentState(
        Merge.partialMomentState(df, Seq("k"), "v"),
        Merge.partialMomentState(deletes, Seq("k"), "v"), Seq("k"))
        .orderBy("k").collect().map(_.toSeq).toSeq
      val direct = Merge.partialMomentState(survivors, Seq("k"), "v")
        .orderBy("k").collect().map(_.toSeq).toSeq
      retracted == direct
    }

  property("retracting a key the state never accumulated trips the guard") =
    forAll(boundedValue) { v =>
      val state = Merge.partialMomentState(
        Seq(("k1", v)).toDF("k", "v"), Seq("k"), "v")
      val rogue = Merge.partialMomentState(
        Seq(("k9", v)).toDF("k", "v"), Seq("k"), "v")
      scala.util.Try(
        Merge.retractMomentState(state, rogue, Seq("k")).collect()).isFailure
    }
}
