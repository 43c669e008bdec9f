package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import graft.functions.SafeCasts

/** Property-based laws (SURVEY §5): coercions vs executable models of
  * transform.py:19-47, decimal-sum order independence, merge idempotency
  * under arbitrary batches. Driver-free ScalaCheck over local evaluation
  * where possible (collect-once per property batch for speed).
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def checkProp(p: Prop, min: Int = 15): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(min), p)
    assert(r.passed, r.status.toString)
  }

  /** Model of reference safe_bool restricted to string/None inputs —
    * the shape our engine receives post-JSON-extraction. */
  private def modelSafeBool(s: Option[String]): Option[Boolean] =
    s.map(v => Set("true", "1", "yes").contains(v.toLowerCase))

  private def modelSafeNumeric(s: Option[String]): Option[Double] =
    s.flatMap(v => try Some(v.trim.toDouble) catch { case _: Throwable => None })

  test("safeBool law: engine == model over arbitrary strings") {
    val gen = Gen.listOfN(60, Gen.option(Gen.oneOf(
      Gen.alphaNumStr, Gen.oneOf("true", "TRUE", "1", "yes", "Yes", "no", "0", ""))))
    checkProp(forAll(gen) { inputs =>
      val got = inputs.toDF("s").select(SafeCasts.safeBool(col("s")))
        .as[Option[Boolean]].collect().toList
      got == inputs.map(modelSafeBool)
    })
  }

  test("safeNumeric law: engine == model over numeric-ish strings") {
    val numish = Gen.oneOf(
      Gen.chooseNum(-1e6, 1e6).map(_.toString),
      Gen.chooseNum(-1000000L, 1000000L).map(_.toString),
      Gen.alphaStr, Gen.const("3.5"), Gen.const("1e3"), Gen.const(""))
    checkProp(forAll(Gen.listOfN(60, Gen.option(numish))) { inputs =>
      val got = inputs.toDF("s").select(SafeCasts.safeNumeric(col("s")))
        .as[Option[Double]].collect().toList
      got == inputs.map(modelSafeNumeric)
    })
  }

  test("decimalSum is invariant under permutation and partitioning") {
    val gen = for {
      xs <- Gen.listOfN(200, Gen.chooseNum(-1e5, 1e5))
      parts <- Gen.chooseNum(1, 13)
    } yield (xs, parts)
    checkProp(forAll(gen) { case (xs, parts) =>
      val a = xs.toDF("v").repartition(parts)
        .agg(SafeCasts.decimalSum(col("v"))).as[Option[Double]].head()
      val b = scala.util.Random.shuffle(xs).toDF("v").repartition(1)
        .agg(SafeCasts.decimalSum(col("v"))).as[Option[Double]].head()
      a == b
    })
  }

  test("merge idempotency: applying any batch twice == once (M1, M3)") {
    val rowGen = for {
      k <- Gen.chooseNum(0, 20); status <- Gen.oneOf("a", "b", "c")
      note <- Gen.alphaStr.map(_.take(8))
    } yield (s"k$k", status, note)
    val gen = Gen.listOfN(30, rowGen)
    checkProp(forAll(gen) { rows =>
      val dirs = Seq(tmpDir("p-m1"), tmpDir("p-m3"))
      val df = rows.toDF("k", "status", "note")
      graft.merge.MergeSink.upsertPartial(spark, dirs(0), df, Seq("k"), Seq("status"),
        orderCols = Seq("note"))
      val once1 = spark.read.parquet(dirs(0)).collect().toSet
      graft.merge.MergeSink.upsertPartial(spark, dirs(0), df, Seq("k"), Seq("status"),
        orderCols = Seq("note"))
      val twice1 = spark.read.parquet(dirs(0)).collect().toSet
      graft.merge.MergeSink.insertIfAbsent(spark, dirs(1), df, Seq("k"))
      val once3 = spark.read.parquet(dirs(1)).collect().toSet
      graft.merge.MergeSink.insertIfAbsent(spark, dirs(1), df, Seq("k"))
      val twice3 = spark.read.parquet(dirs(1)).collect().toSet
      once1 == twice1 && once3 == twice3
    }, min = 6)
  }
}
