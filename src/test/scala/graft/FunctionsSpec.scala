package graft

import graft.functions.{GeoFunctions, TextFunctions, VectorExpr, VectorFunctions}
import org.apache.spark.sql.functions._

class GeoFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def hav(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double =
    Seq((lat1, lon1, lat2, lon2)).toDF("lat1", "lon1", "lat2", "lon2")
      .select(GeoFunctions.haversineKm(col("lat1"), col("lon1"), col("lat2"), col("lon2")))
      .head().getDouble(0)

  test("haversine matches a known geodesic (NYC→LA ≈ 3936 km)") {
    val d = hav(40.7128, -74.0060, 34.0522, -118.2437)
    assert(math.abs(d - 3936) < 10, s"got $d")
  }

  test("haversine is symmetric and zero on identical points") {
    assert(hav(40.0, -74.0, 41.0, -73.0) === hav(41.0, -73.0, 40.0, -74.0))
    assert(hav(40.5, -74.2, 40.5, -74.2) === 0.0)
  }

  test("bearing: due north is 0°, due east is ~90°") {
    def brg(lat1: Double, lon1: Double, lat2: Double, lon2: Double) =
      Seq((lat1, lon1, lat2, lon2)).toDF("lat1", "lon1", "lat2", "lon2")
        .select(GeoFunctions.bearingDeg(col("lat1"), col("lon1"), col("lat2"), col("lon2")))
        .head().getDouble(0)
    assert(math.abs(brg(40.0, -74.0, 41.0, -74.0) - 0.0) < 1e-9)
    assert(math.abs(brg(0.0, 0.0, 0.0, 1.0) - 90.0) < 1e-9)
  }

  test("manhattan distance upper-bounds the straight-line haversine") {
    val rows = Seq((40.1, -74.1, 40.9, -73.8), (40.5, -74.25, 40.6, -73.75))
    rows.foreach { case (a, b, c, d) =>
      val m = Seq((a, b, c, d)).toDF("lat1", "lon1", "lat2", "lon2")
        .select(GeoFunctions.manhattanKm(col("lat1"), col("lon1"), col("lat2"), col("lon2")))
        .head().getDouble(0)
      assert(m >= hav(a, b, c, d) * 0.95, "L1 must dominate L2 (within lat-scaling tolerance)")
    }
  }
}

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("hash64 equals first 15 md5 hex digits (the DuckDB contract)") {
    val got = Seq("hello", "spark").toDF("s")
      .select(TextFunctions.hash64(col("s"))).as[Long].collect()
    def expected(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    assert(got.toSeq === Seq(expected("hello"), expected("spark")))
  }

  test("shingles produce n-grams in order; short docs yield empty") {
    val sh = Seq("a b c d").toDF("t")
      .select(TextFunctions.shingles(TextFunctions.tokens(col("t")), 3))
      .as[Seq[String]].head()
    assert(sh === Seq("a b c", "b c d"))
    val empty = Seq("a b").toDF("t")
      .select(TextFunctions.shingles(TextFunctions.tokens(col("t")), 3))
      .as[Seq[String]].head()
    assert(empty.isEmpty)
  }

  // The native loop form must produce the SAME strings as the HOF form —
  // every shingle oracle reproduces the HOF/concat_ws output, so any drift
  // here is a driver hash mismatch.
  test("native word_shingles is identical to the HOF form") {
    val docs = Seq("a b c d e", "x y", "", "one two three",
      (1 to 40).map(i => s"w$i").mkString(" ")).toDF("t")
    val both = docs.select(
      TextFunctions.shingles(TextFunctions.tokens(col("t")), 3).as("hof"),
      graft.functions.ShingleExpr.shinglesNative(
        TextFunctions.tokens(col("t")), 3).as("native"))
    assert(both.filter(not(col("hof") === col("native"))).count() === 0)
    // And via the interpreted path (no codegen): Literal input forces eval.
    val sh = graft.functions.ShingleMath.wordShingles(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array("a", "b", "c", "d").map(org.apache.spark.unsafe.types.UTF8String.fromString)), 3)
    assert(sh.numElements() === 2)
    assert(sh.getUTF8String(0).toString === "a b c")
    assert(sh.getUTF8String(1).toString === "b c d")
  }

  test("minhash signature match fraction estimates Jaccard") {
    // Two near-identical token sets (J = 18/22 ≈ 0.82) vs two disjoint sets.
    val a = (1 to 20).map(i => s"tok$i").mkString(" ")
    val b = (3 to 24).map(i => s"tok$i").mkString(" ")
    val c = (100 to 120).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("id", "t")
      .select(col("id"), TextFunctions.minhashSignature(
        array_distinct(TextFunctions.tokens(col("t"))), 64).as("sig"))
    val sigs = df.as[(Long, Seq[Long])].collect().toMap
    def frac(x: Seq[Long], y: Seq[Long]) = x.zip(y).count { case (p, q) => p == q } / 64.0
    assert(frac(sigs(1L), sigs(2L)) > 0.6, "similar sets must collide often")
    assert(frac(sigs(1L), sigs(3L)) < 0.2, "disjoint sets must rarely collide")
  }

  test("simhash: identical docs collide, unrelated docs differ") {
    val df = Seq((1L, "spark fast query engine"), (2L, "spark fast query engine"),
      (3L, "completely different words entirely")).toDF("id", "t")
      .select(col("id"), TextFunctions.simhash(TextFunctions.tokens(col("t")), 16).as("sh"))
    val m = df.as[(Long, Long)].collect().toMap
    assert(m(1L) === m(2L))
    assert(m(1L) !== m(3L))
  }
}

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("dot and cosine match hand computation") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, -5.0f, 6.0f))).toDF("a", "b")
    val dot = df.select(VectorFunctions.dot(col("a"), col("b"))).head().getDouble(0)
    assert(dot === (4.0 - 10.0 + 18.0))
    val cos = df.select(VectorFunctions.cosine(col("a"), col("a"))).head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
  }

  test("lsh bucket is deterministic and separates orthogonal-ish vectors") {
    val v1 = Array.tabulate(64)(i => if (i < 32) 1.0f else 0.0f).toSeq
    val v2 = v1
    val df = Seq((1L, v1), (2L, v2)).toDF("id", "e")
      .select(col("id"), VectorFunctions.lshBucket(col("e"), 8, 64).as("b"))
    val m = df.as[(Long, Int)].collect().toMap
    assert(m(1L) === m(2L), "identical vectors must share a bucket")
    assert(m(1L) >= 0 && m(1L) < 256)
  }

  test("vec_seq_sum / word_shingles are callable from SQL (registry + extensions)") {
    val s = spark.sql("SELECT vec_seq_sum(array(1.5D, 2.5D, -1.0D))").head().getDouble(0)
    assert(s === 3.0)
    val sh = spark.sql("SELECT word_shingles(array('a','b','c'), 2)")
      .head().getSeq[String](0)
    assert(sh === Seq("a b", "b c"))
  }

  test("vec_cosine / vec_hyperplane_dots are callable from SQL (registry + extensions)") {
    val cos = spark.sql(
      "SELECT vec_cosine(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))").head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
    val dots = spark.sql(
      "SELECT vec_hyperplane_dots(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), 4)")
      .head().getSeq[Double](0)
    assert(dots.size === 4)
  }

  // The native loop expressions must be BIT-identical to the HOF forms —
  // the oracle SQL reproduces the HOF fold order, so any drift here is an
  // oracle hash mismatch at the driver.
  test("native vecCosine/vecHyperplaneDots are bit-identical to HOF forms") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)(
      (Seq.fill(64)(rnd.nextFloat() - 0.5f), Seq.fill(64)(rnd.nextFloat() - 0.5f)))
    val df = rows.toDF("a", "b")
    val cos = df.select(
      VectorExpr.vecCosine(col("a"), col("b")).as("fast"),
      VectorFunctions.cosine(col("a"), col("b")).as("hof"))
      .as[(Double, Double)].collect()
    cos.foreach { case (f, h) =>
      assert(java.lang.Double.doubleToLongBits(f) ===
        java.lang.Double.doubleToLongBits(h))
    }
    val dots = df.select(
      VectorExpr.vecHyperplaneDots(col("a"), 32).as("fast"),
      VectorFunctions.hyperplaneDots(col("a"), 32, 64).as("hof"))
      .as[(Seq[Double], Seq[Double])].collect()
    dots.foreach { case (f, h) =>
      assert(f.size === 32 && h.size === 32)
      f.zip(h).foreach { case (x, y) =>
        assert(java.lang.Double.doubleToLongBits(x) ===
          java.lang.Double.doubleToLongBits(y))
      }
    }
  }

  test("native vecSeqSumD is bit-identical to the aggregate fold") {
    val rnd = new scala.util.Random(11)
    val df = Seq.fill(60)(Seq.fill(rnd.nextInt(9))(rnd.nextDouble() * 1e3 - 500))
      .toDF("a")
    val got = df.select(
      VectorExpr.vecSeqSumD(col("a")).as("fast"),
      aggregate(col("a"), lit(0.0), (acc, v) => acc + v).as("hof"))
      .as[(Double, Double)].collect()
    got.foreach { case (f, h) =>
      assert(java.lang.Double.doubleToLongBits(f) ===
        java.lang.Double.doubleToLongBits(h))
    }
  }
}
