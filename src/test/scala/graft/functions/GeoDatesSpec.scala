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
