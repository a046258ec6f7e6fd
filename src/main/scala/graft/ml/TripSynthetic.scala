package graft.ml

import graft.functions.GeoFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic trip-shaped synthetic for the lab-2 capability target
  * (reference corpus: 1,458,644 NYC taxi trips,
  * 实习二/…taxi_travel_time_prediction.ipynb:73; recorded validation metrics
  * MAE 216.66 s / RMSE 377.02 s / log-RMSE 0.4025 / R² 0.7301 at :8152-8158).
  *
  * duration = (haversine distance ÷ hour-and-zone-dependent speed) scaled by
  * LOG-NORMAL noise — the reference models log1p(duration) precisely because
  * taxi durations are multiplicative-noise-shaped. All randomness is
  * affine-hash uniforms off the row id (no RNG state), so the corpus is
  * bit-reproducible at any n and the generation is a pure projection —
  * spark.range(n) parallelizes it with no shuffle at all.
  */
object TripSynthetic {

  private val P = 2147483647L // Mersenne prime 2^31-1

  /** Uniform [0,1) from the id under an affine hash keyed by `k`. */
  private def u(k: Long) =
    pmod(col("id") * lit(k) + lit(k * 7919 + 13), lit(P)).cast("double") / lit(P.toDouble)

  /** Gaussian-ish noise: Irwin-Hall(3) centered, std 1 after scaling. */
  private def gauss(k1: Long, k2: Long, k3: Long) =
    (u(k1) + u(k2) + u(k3) - lit(1.5)) * lit(2.0)

  /** n synthetic trips: endpoints, start hour/dow, zone, and duration_s. */
  def trips(spark: SparkSession, n: Long): DataFrame = {
    spark.range(n)
      .withColumn("plon", lit(-74.06) + u(2654435761L) * lit(0.09))
      .withColumn("plat", lit(40.68) + u(2246822519L) * lit(0.09))
      // Trip length: quadratic radius law (many short hops, a heavy long
      // tail — the real taxi distance shape) + uniform bearing; the
      // endpoints stay the features, so the distance signal is recoverable.
      .withColumn("rad", lit(0.006) + pow(u(3266489917L), 2) * lit(0.095))
      .withColumn("ang", u(668265263L) * lit(2 * math.Pi))
      .withColumn("dlon", col("plon") + col("rad") * cos(col("ang")))
      .withColumn("dlat", col("plat") + col("rad") * sin(col("ang")))
      .drop("rad", "ang")
      .withColumn("hour", floor(u(374761393L) * 24).cast("int"))
      .withColumn("dow", floor(u(285262883L) * 7).cast("int"))
      .withColumn("zone", floor(u(97002151L) * 8).cast("int"))
      .withColumn("hav_km", GeoFunctions.haversineKm(
        col("plat"), col("plon"), col("dlat"), col("dlon")))
      // Speed (km/h): free-flow 24, rush-hour dips at 8h and 17-18h, per-zone
      // offset, weekend lift. The model must RECOVER these from (hour, zone,
      // dow) — they are the learnable signal beyond distance.
      .withColumn("speed_kmh",
        lit(27.0)
          - lit(11.0) * exp(-pow((col("hour") - lit(8.0)) / lit(2.5), 2))
          - lit(9.0) * exp(-pow((col("hour") - lit(17.5)) / lit(2.5), 2))
          + (col("zone") - lit(3.5)) * lit(1.2)
          + when(col("dow") >= 5, lit(4.0)).otherwise(lit(0.0)))
      // 90 s fixed pickup overhead; multiplicative log-normal noise.
      .withColumn("duration_s",
        greatest(lit(45.0),
          (lit(90.0) + col("hav_km") / col("speed_kmh") * lit(3600.0)) *
            exp(gauss(15485863L, 32452843L, 49979687L) * lit(0.40))))
      .drop("speed_kmh")
  }

  /** The lab-2 feature set over [[trips]] (mirrors the reference's
    * engineered features: distance, time components, zone). */
  val features: Seq[String] =
    Seq("hav_km", "hour", "dow", "zone", "plon", "plat", "dlon", "dlat")
}
