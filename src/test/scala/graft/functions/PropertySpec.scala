package graft.functions

import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec
import graft.functions.HousePrice._

/** Property-based specs (SURVEY §5.2) using ScalaCheck generators with a
  * fixed seed, evaluated through actual Spark plans in one batch per
  * property: ROC↔ISO round-trip, repair idempotence, HALF_UP rounding vs
  * the BigDecimal oracle. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[List[A]]): List[A] =
    g.apply(Gen.Parameters.default, Seed(42L)).get

  test("property: ROC round-trip — every valid date survives encode→decode") {
    val start = LocalDate.of(1912, 1, 1).toEpochDay
    val end = LocalDate.of(2099, 12, 31).toEpochDay
    val dates = (start to end by 173).map(LocalDate.ofEpochDay(_).toString)
    val bad = dates.toDF("iso")
      .withColumn("d", col("iso").cast("date"))
      // ROC convention zero-pads the year to at least 2 digits (NB: lpad
      // would TRUNCATE 3-digit years — pad conditionally)
      .withColumn("ry", (year(col("d")) - 1911).cast("string"))
      .withColumn("roc", concat(
        when(length(col("ry")) === 1, concat(lit("0"), col("ry"))).otherwise(col("ry")),
        lpad(month(col("d")).cast("string"), 2, "0"),
        lpad(dayofmonth(col("d")).cast("string"), 2, "0")))
      .withColumn("back", rocToDate(col("roc")))
      .filter(!(col("back") <=> col("d")))
    val samples = bad.select("iso", "roc").limit(5).collect().mkString("; ")
    assert(bad.count() === 0, s"failing samples: $samples")
  }

  test("property: invalid month/day strings always yield NULL") {
    val bads = (for {
      y <- 80 to 150 by 7
      m <- 13 to 99 by 11
    } yield f"$y$m%02d15") ++ (for {
      y <- 80 to 150 by 7
      d <- 32 to 99 by 13
    } yield f"${y}07$d%02d") ++ Seq("1110229" /* 2022 not leap */, "1130431")
    val n = bads.toDF("roc").select(rocToDate(col("roc")).as("d"))
      .filter(col("d").isNotNull).count()
    assert(n === 0)
  }

  test("property: leap-day handling matches the calendar") {
    // ROC 113 = 2024 (leap): valid; ROC 111 = 2022: invalid
    val out = Seq("1130229", "1110229").toDF("roc")
      .select(rocToDate(col("roc")).cast("string").as("d"))
      .collect().map(r => Option(r.getString(0)))
    assert(out(0) === Some("2024-02-29"))
    assert(out(1) === None)
  }

  test("property: E5 repair is idempotent and only fires on zero") {
    val rows = sample(Gen.listOfN(500, for {
      unit <- Gen.oneOf(Gen.const(0.0), Gen.choose(1.0, 99999.0))
      total <- Gen.choose(1.0, 1e9)
      area <- Gen.oneOf(Gen.const(0.0), Gen.choose(1.0, 1e4))
    } yield (unit, total, area)))
    val df = rows.toDF("unit", "total", "area")
    val once = df.withColumn("r1",
      repairUnitPrice(col("unit"), col("total"), nullif(col("area"), lit(0.0))))
    val twice = once.withColumn("r2",
      repairUnitPrice(col("r1"), col("total"), nullif(col("area"), lit(0.0))))
    // idempotent: repaired values are never 0 again (total ≥ 1 ⇒ ratio > 0)
    assert(twice.filter(!(col("r1") <=> col("r2"))).count() === 0)
    // non-zero units pass through untouched
    assert(once.filter(col("unit") =!= 0.0)
      .filter(!(col("r1") <=> col("unit"))).count() === 0)
  }

  test("property: Spark round == BigDecimal shortest-repr HALF_UP oracle") {
    val doubles = sample(Gen.listOfN(2000, Gen.choose(-1e6, 1e6)))
    val got = doubles.toDF("x").select(round(col("x"), 2).as("r"))
      .as[Double].collect()
    doubles.zip(got).foreach { case (x, r) =>
      val expect = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r === expect, s"x=$x")
    }
  }

  test("property: winnow kernel == from-scratch derivation on random strings") {
    import graft.functions.TextKernels
    // mixed alphabets force every kernel path: ASCII runs (long shared
    // k-grams), digits, spaces (normalization-shaped), repeats (tied
    // minima in the deque), and supplementary code points (char-count 2)
    val alpha = Gen.frequency(
      8 -> Gen.alphaLowerChar.map(_.toString),
      2 -> Gen.numChar.map(_.toString),
      2 -> Gen.const(" "),
      1 -> Gen.const("aa"),          // repetition → hash ties
      1 -> Gen.const("😀")) // 😀 — supplementary pair
    val strs = sample(Gen.listOfN(300,
      Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, alpha).map(_.mkString))))
    def ref(s: String, k: Int, w: Int): Seq[Long] = {
      val cps = s.codePoints().toArray
      if (cps.length < k) return Seq.empty
      val hs = (0 to cps.length - k).map { i =>
        (i until i + k).foldLeft(0L)((a, j) => (a * 257 + cps(j)) % 1000000007L)
      }
      val nWin = math.max(hs.length - w + 1, 1)
      (0 until nWin).map(i => hs.slice(i, math.min(i + w, hs.length)).min)
        .distinct.sorted
    }
    // several (k, w) operating points, including w=1 (every hash selected)
    // and k=1 (single-char grams)
    Seq((8, 4), (5, 9), (1, 3), (3, 1)).foreach { case (k, w) =>
      val got = strs.toDF("t")
        .select(TextKernels.winnowFingerprints(col("t"), k, w).as("fps"))
        .collect().map(_.getAs[scala.collection.Seq[Long]]("fps").toSeq)
      strs.zip(got).foreach { case (s, g) =>
        assert(g === ref(s, k, w), s"k=$k w=$w s='$s'")
      }
    }
  }

  test("typed Dataset surface: pipeline rows encode as BuildingTxn") {
    import graft.schema.BuildingTxn
    val dir = graft.fixtures.RawCsvFixture.writeDefault()
    val ds = graft.operators.Pipelines.building(spark, dir + "/*_a.csv")
      .as[BuildingTxn]
    val rows = ds.collect()
    assert(rows.length === 4)
    assert(rows.exists(r => r.total_price.contains(5000000000L)))
    assert(rows.exists(r => r.total_price.isEmpty)) // the garbage row
  }
}
