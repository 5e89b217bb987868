package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

class GeoSpec extends AnyFunSuite {
  test("forward/inverse UTM round-trips to sub-millimeter over Rio") {
    // Maracanã-ish point in UTM 23S
    val (e0, n0) = (683000.0, 7465000.0)
    val (lat, lon) = Geo.utmToLatLon(e0, n0, -45.0, southern = true)
    assert(lat > -23.2 && lat < -22.6, lat)   // Rio latitude band
    assert(lon > -43.8 && lon < -42.9, lon)   // Rio longitude band
    val (e1, n1) = Geo.latLonToUtm(lat, lon, -45.0, southern = true)
    assert(math.abs(e1 - e0) < 1e-3, e1 - e0)
    assert(math.abs(n1 - n0) < 1e-3, n1 - n0)
  }
}

class GeoColumnSpec extends SparkSpec {
  test("column API reprojects EPSG:31983 → lat/lon") {
    import spark.implicits._
    val df = Seq((683000.0, 7465000.0)).toDF("e", "n")
      .select(Geo.latFromUtm23S(col("e"), col("n")).as("lat"),
        Geo.lonFromUtm23S(col("e"), col("n")).as("lon"))
    val r = df.collect().head
    assert(r.getDouble(0) > -23.2 && r.getDouble(0) < -22.6)
    assert(r.getDouble(1) > -43.8 && r.getDouble(1) < -42.9)
  }

  test("codegen, interpreted eval, and direct Scala agree bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.DoubleType
    val points = Seq((683000.0, 7465000.0), (660123.45, 7450987.65),
      (700000.0, 7480000.0))
    // codegen path (whole-stage generated Java calling the static method)
    val viaCodegen = points.toDF("e", "n")
      .select(Geo.latFromUtm23S(col("e"), col("n")),
        Geo.lonFromUtm23S(col("e"), col("n")))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    // interpreted path (Expression.eval) and the plain Scala function
    val viaEval = points.map { case (e, n) =>
      (Utm23SToGeo(Literal(e), Literal(n), lat = true)
        .eval(InternalRow.empty).asInstanceOf[Double],
        Utm23SToGeo(Literal(e), Literal(n), lat = false)
          .eval(InternalRow.empty).asInstanceOf[Double])
    }
    val direct = points.map { case (e, n) =>
      Geo.utmToLatLon(e, n, -45.0, southern = true) }
    // bit-parity, not epsilon: all three run the identical double sequence
    assert(viaCodegen == direct && viaEval == direct)
    // null-safe: a null operand yields null, not an exception
    val withNull = Seq((Some(683000.0), None: Option[Double])).toDF("e", "n")
      .select(Geo.latFromUtm23S(col("e"), col("n"))).collect().head
    assert(withNull.isNullAt(0))
    // integer inputs implicit-cast to double (ImplicitCastInputTypes)
    val fromInts = Seq((683000, 7465000)).toDF("e", "n")
      .select(Geo.latFromUtm23S(col("e"), col("n"))).collect().head.getDouble(0)
    assert(fromInts == direct.head._1)
  }
}

class DatesSpec extends SparkSpec {
  import spark.implicits._

  test("parseDateMulti handles both formats, null for garbage") {
    val df = Seq("2024-02-29", "29/02/2024", "nope").toDF("s")
      .select(Dates.parseDateMulti(col("s")).cast("string").as("d"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("2024-02-29"), Some("2024-02-29"), None))
  }

  test("ageYears subtracts one before the birthday") {
    val df = Seq(
      ("2000-08-12", "2026-08-11"), // day before 26th birthday
      ("2000-08-12", "2026-08-12"), // on the birthday
      ("2000-12-31", "2026-01-01")) // early in year
      .toDF("b", "a")
      .select(Dates.ageYears(to_date(col("b")), to_date(col("a"))).as("age"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(25, 26, 25))
  }
}
