package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.graftbridge.Bridge

/** Geodesy for the reference's coordinate pipeline: point reprojection from
  * SIRGAS 2000 / UTM zone 23S (EPSG:31983 — Rio de Janeiro) to geographic
  * WGS84-compatible lat/lon (EPSG:4326) (reference:
  * coordenadas_estabelecimentos_pgeo3/tasks.py:183-211, which shells out to
  * GeoPandas). SIRGAS 2000 and WGS84 share the GRS80/WGS84 ellipsoid to
  * centimeter level, so the transform is the inverse Transverse Mercator
  * (Krüger series) — pure math, no native proj dependency.
  *
  * Implemented as codegen'd Catalyst expressions ([[Utm23SToGeo]], the
  * Cpf/VectorKernels pattern) rather than Scala UDFs: the generated code
  * calls a static double→double method, so the per-row trig stays inside
  * whole-stage codegen with primitive doubles — no boxing, no closure
  * dispatch, no codegen fence splitting the surrounding projection. On a
  * geo-heavy 100 TB scan that is the difference between fused
  * scan→reproject→filter and three interpreted stages.
  */
object Geo {

  // GRS80 ellipsoid (SIRGAS2000); WGS84 differs only in 1e-10 flattening
  private val a = 6378137.0
  private val f = 1.0 / 298.257222101
  private val k0 = 0.9996
  private val e2 = f * (2 - f)
  private val ep2 = e2 / (1 - e2)

  /** Inverse Transverse Mercator: (easting, northing, lon0 deg, southern)
    * → (lat, lon) degrees.
    */
  def utmToLatLon(easting: Double, northing: Double, lon0Deg: Double,
      southern: Boolean): (Double, Double) = {
    val x = easting - 500000.0
    val y = if (southern) northing - 10000000.0 else northing
    val m = y / k0
    val mu = m / (a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256))
    val e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    // footprint latitude (series in e1)
    val phi1 = mu +
      (3 * e1 / 2 - 27 * math.pow(e1, 3) / 32) * math.sin(2 * mu) +
      (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
      (151 * math.pow(e1, 3) / 96) * math.sin(6 * mu) +
      (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
    val sin1 = math.sin(phi1); val cos1 = math.cos(phi1); val tan1 = sin1 / cos1
    val c1 = ep2 * cos1 * cos1
    val t1 = tan1 * tan1
    val n1 = a / math.sqrt(1 - e2 * sin1 * sin1)
    val r1 = a * (1 - e2) / math.pow(1 - e2 * sin1 * sin1, 1.5)
    val d = x / (n1 * k0)
    val lat = phi1 - (n1 * tan1 / r1) * (
      d * d / 2 -
        (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * math.pow(d, 4) / 24 +
        (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ep2 - 3 * c1 * c1) * math.pow(d, 6) / 720)
    val lon = math.toRadians(lon0Deg) + (
      d -
        (1 + 2 * t1 + c1) * math.pow(d, 3) / 6 +
        (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ep2 + 24 * t1 * t1) * math.pow(d, 5) / 120) / cos1
    (math.toDegrees(lat), math.toDegrees(lon))
  }

  /** Forward Transverse Mercator (for round-trip tests and reverse ETL). */
  def latLonToUtm(latDeg: Double, lonDeg: Double, lon0Deg: Double,
      southern: Boolean): (Double, Double) = {
    val lat = math.toRadians(latDeg)
    val dLon = math.toRadians(lonDeg - lon0Deg)
    val sinLat = math.sin(lat); val cosLat = math.cos(lat); val tanLat = sinLat / cosLat
    val n = a / math.sqrt(1 - e2 * sinLat * sinLat)
    val t = tanLat * tanLat
    val c = ep2 * cosLat * cosLat
    val aa = cosLat * dLon
    val m = a * ((1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * math.pow(e2, 3) / 256) * lat -
      (3 * e2 / 8 + 3 * e2 * e2 / 32 + 45 * math.pow(e2, 3) / 1024) * math.sin(2 * lat) +
      (15 * e2 * e2 / 256 + 45 * math.pow(e2, 3) / 1024) * math.sin(4 * lat) -
      (35 * math.pow(e2, 3) / 3072) * math.sin(6 * lat))
    val easting = 500000.0 + k0 * n * (aa +
      (1 - t + c) * math.pow(aa, 3) / 6 +
      (5 - 18 * t + t * t + 72 * c - 58 * ep2) * math.pow(aa, 5) / 120)
    val northing0 = k0 * (m + n * tanLat * (aa * aa / 2 +
      (5 - t + 9 * c + 4 * c * c) * math.pow(aa, 4) / 24 +
      (61 - 58 * t + t * t + 600 * c - 330 * ep2) * math.pow(aa, 6) / 720))
    val northing = if (southern) northing0 + 10000000.0 else northing0
    (easting, northing)
  }

  /** Static primitive entry points for generated code (EPSG:31983: UTM 23S,
    * central meridian 45°W, southern hemisphere). A standalone Scala object
    * emits static forwarders, so codegen calls these exactly like a Java
    * static — primitive in, primitive out.
    */
  def utmLat23S(easting: Double, northing: Double): Double =
    utmToLatLon(easting, northing, -45.0, southern = true)._1
  def utmLon23S(easting: Double, northing: Double): Double =
    utmToLatLon(easting, northing, -45.0, southern = true)._2

  /** EPSG:31983 → EPSG:4326 latitude, codegen'd. The wrapper casts to
    * double here (AbstractDataType/ImplicitCastInputTypes is private[sql],
    * so the expression itself declares no coercion).
    */
  def latFromUtm23S(easting: Column, northing: Column): Column =
    Bridge.column(Utm23SToGeo(Bridge.expression(easting.cast("double")),
      Bridge.expression(northing.cast("double")), lat = true))

  /** EPSG:31983 → EPSG:4326 longitude, codegen'd. */
  def lonFromUtm23S(easting: Column, northing: Column): Column =
    Bridge.column(Utm23SToGeo(Bridge.expression(easting.cast("double")),
      Bridge.expression(northing.cast("double")), lat = false))
}

/** `(easting, northing) → lat|lon` degrees for EPSG:31983→4326 — null-safe,
  * codegen'd via a static-method call so the Krüger-series trig fuses into
  * the surrounding whole-stage-generated code.
  */
case class Utm23SToGeo(left: Expression, right: Expression, lat: Boolean)
    extends BinaryExpression {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (double, double), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(e: Any, n: Any): Any =
    if (lat) Geo.utmLat23S(e.asInstanceOf[Double], n.asInstanceOf[Double])
    else Geo.utmLon23S(e.asInstanceOf[Double], n.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (lat) "utmLat23S" else "utmLon23S"
    defineCodeGen(ctx, ev, (e, n) => s"graft.functions.Geo.$fn($e, $n)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Utm23SToGeo =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = if (lat) "utm23s_lat" else "utm23s_lon"
}
