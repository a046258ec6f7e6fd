package graft

import graft.functions.UtmMath
import graft.spatial.ConvexHull
import graft.spatial.ConvexHull.Pt
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck property suites (SURVEY.md §5.4) for the pure-math kernels —
  * run by sbt's native ScalaCheck framework alongside the ScalaTest specs. */
object UtmProperties extends Properties("UtmMath") {

  // Zone 18 interior, away from zone edges where the series still holds.
  private val lon = Gen.choose(-77.5, -72.5)
  private val lat = Gen.choose(0.5, 83.5)

  property("roundTrip") = forAll(lon, lat) { (lo, la) =>
    val Array(e, n) = UtmMath.forward(lo, la, 18)
    val Array(lo2, la2) = UtmMath.inverse(e, n, 18)
    math.abs(lo2 - lo) < 1e-7 && math.abs(la2 - la) < 1e-7
  }

  property("northingMonotoneInLatitude") = forAll(lon, Gen.choose(1.0, 80.0)) { (lo, la) =>
    UtmMath.forward(lo, la + 0.1, 18)(1) > UtmMath.forward(lo, la, 18)(1)
  }

  property("eastingSymmetricAboutCentralMeridian") = forAll(Gen.choose(0.1, 2.5), lat) { (d, la) =>
    val e1 = UtmMath.forward(-75.0 - d, la, 18)(0)
    val e2 = UtmMath.forward(-75.0 + d, la, 18)(0)
    math.abs((500000.0 - e1) - (e2 - 500000.0)) < 1e-6
  }
}

/** Pure-JVM kernels behind the native loop expressions: same math as the
  * interpreted HOF forms, provable without a SparkSession. */
object NativeKernelProperties extends Properties("NativeKernels") {
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.unsafe.types.UTF8String

  private val doubles = Gen.listOf(Gen.choose(-1e6, 1e6))

  property("seqSumDMatchesLeftFold") = forAll(doubles) { ds =>
    val got = graft.functions.VectorMath.seqSumD(
      ArrayData.toArrayData(ds.toArray))
    java.lang.Double.doubleToLongBits(got) ==
      java.lang.Double.doubleToLongBits(ds.foldLeft(0.0)(_ + _))
  }

  private val words = Gen.listOf(Gen.identifier.map(_.take(6)))

  property("shinglesMatchSlidingJoin") = forAll(words, Gen.choose(1, 4)) { (ws, n) =>
    val arr = ArrayData.toArrayData(ws.map(UTF8String.fromString).toArray)
    val got = graft.functions.ShingleMath.wordShingles(arr, n)
    val expect =
      if (ws.size < n) Seq.empty
      else ws.sliding(n).map(_.mkString(" ")).toSeq
    (0 until got.numElements()).map(got.getUTF8String(_).toString) == expect
  }
}

object ConvexHullProperties extends Properties("ConvexHull") {

  private val pt = for {
    x <- Gen.choose(-100.0, 100.0)
    y <- Gen.choose(-100.0, 100.0)
  } yield Pt(x, y)
  private val pts = Gen.listOfN(40, pt)

  property("hullVerticesComeFromInput") = forAll(pts) { ps =>
    ConvexHull.hull(ps).forall(ps.contains)
  }

  property("idempotent") = forAll(pts) { ps =>
    val h = ConvexHull.hull(ps)
    ConvexHull.hull(h).toSet == h.toSet
  }

  property("containsAllPoints") = forAll(pts) { ps =>
    val h = ConvexHull.hull(ps)
    h.size < 3 || {
      // Counter-clockwise hull ⇒ every input point lies left of (or on)
      // every directed hull edge (tolerance for FP collinearity).
      ps.forall { p =>
        h.indices.forall { i =>
          val a = h(i); val b = h((i + 1) % h.size)
          (b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x) >= -1e-7
        }
      }
    }
  }

  property("areaNonNegativeAndBounded") = forAll(pts) { ps =>
    val area = ConvexHull.shoelaceArea(ConvexHull.hull(ps))
    area >= 0.0 && area <= 200.0 * 200.0
  }

  property("subsetHullNoLarger") = forAll(pts) { ps =>
    val area = ConvexHull.shoelaceArea(ConvexHull.hull(ps))
    val subArea = ConvexHull.shoelaceArea(ConvexHull.hull(ps.take(20)))
    subArea <= area + 1e-9
  }
}
