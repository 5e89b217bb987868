package graft.sources

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.operators.Relational

/** Mongo sliced extraction — the engine half of the reference's
  * minhasaude flow (reference:
  * pipelines/datalake/extract_load/minhasaude_mongodb/tasks.py:44-300):
  * min/max of the slice variable → fixed-size ranges → per-range
  * `find({slice_var: {$gte, $lte}})` cursor drained through a bounded
  * buffer that flushes every `FlushThreshold` docs, then a ±5% total
  * validation. The TRANSPORT (MongoClient) stays a caller seam — the
  * `find` lambda — exactly like the JDBC reader's connection factory; the
  * semantics this object owns are the reference's:
  *
  *  - slices are `[atual, atual+size]` with the NEXT slice starting at the
  *    previous END (tasks.py:74-105) — boundary values intentionally land
  *    in two slices, which is why every flush dedups by `_id` keep-last
  *    (tasks.py:121-127: idempotence under overlap and retry);
  *  - a flush failure propagates with the buffer intact so the slice can
  *    be retried whole (tasks.py:140-148);
  *  - the per-slice sent counts must reconcile with the collection count
  *    within ±5% (tasks.py:262-300, via [[Relational.reconcileCount]]).
  */
object MongoSliceReader {

  /** Reference flush/batch size (tasks.py:36-37). */
  val FlushThreshold: Int = 10000

  /** The reference's slice generator (tasks.py:74-105): fixed-size
    * inclusive ranges where each slice STARTS at the previous slice's end
    * (overlapping boundaries), the last clipped to `max`.
    *
    * Deliberate divergence: the reference raises when `min >= max`, which
    * also rejects the legitimate single-distinct-value window (every doc
    * in the range shares one slice-var value — e.g. a one-day window on a
    * date key). That window is drainable by the single inclusive slice
    * `[min, max]`, so `min == max` yields exactly that instead of failing
    * the whole extraction; only an inverted range errors.
    */
  def slices(min: Long, max: Long, sliceSize: Long): Seq[(Long, Long)] = {
    require(sliceSize > 0, "sliceSize must be positive")
    require(min <= max, s"min $min must not exceed max $max")
    if (min == max) return Seq((min, max))
    val out = Seq.newBuilder[(Long, Long)]
    var atual = min
    while (atual < max) {
      val fim = math.min(atual + sliceSize, max)
      out += ((atual, fim))
      if (fim == atual) atual = max // safety against a zero-width tail
      else atual = fim
    }
    out.result()
  }

  /** The slice find-filter document: base equality query (if any) merged
    * with `{sliceVar: {"$gte": gte, "$lte"|"$lt": upper}}`
    * (tasks.py:225-227). With `isDate` the bounds travel as the typed
    * `{"$date": ms}` sentinel ([[Bson.date]]) so the wire client re-encodes
    * them as BSON type 0x09 — MongoDB's type bracketing never matches Date
    * fields against int64 bounds, so numeric bounds against a Date-keyed
    * collection would drain ZERO docs from every slice.
    *
    * `upperInclusive = false` emits `$lt` — the DATETIME path uses it for
    * every slice but the last: day-stepped ranges put their boundaries
    * exactly ON the midnight instants where date-only collections hold all
    * their mass, so inclusive-both-ends ranges would extract every
    * boundary cohort TWICE (inflating sent counts past the ±5%
    * reconciliation). Numeric slices keep the reference's inclusive
    * overlap (boundary dupes are incidental there and per-flush `_id`
    * dedup plus the tolerance absorb them).
    */
  def sliceFilterJson(baseQuery: Option[String], sliceVar: String,
      gte: Long, lte: Long, isDate: Boolean = false,
      upperInclusive: Boolean = true): String = {
    val base = baseQuery.map(JsonMethods.parse(_)) match {
      case Some(JObject(fields)) => fields
      case None => Nil
      case Some(other) =>
        throw new IllegalArgumentException(s"base query must be an object, got $other")
    }
    def bound(v: Long): JValue = if (isDate) Bson.date(v) else JLong(v)
    val upperOp = if (upperInclusive) "$lte" else "$lt"
    JsonMethods.compact(JsonMethods.render(JObject(
      base :+ (sliceVar -> (JObject(
        "$gte" -> bound(gte), upperOp -> bound(lte)): JValue)))))
  }

  private def idOf(doc: String, idField: String): String =
    (JsonMethods.parse(doc) \ idField) match {
      case JString(s) => s
      case JInt(n) => n.toString
      case JLong(n) => n.toString
      case other => JsonMethods.compact(JsonMethods.render(other))
    }

  /** Keep-last dedup by the id field — the reference's
    * `drop_duplicates(subset="_id", keep="last")` applied per flush
    * (tasks.py:121-127), preserving first-seen order of the surviving key.
    */
  private[sources] def dedupKeepLast(docs: Seq[String], idField: String): Seq[String] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
    docs.foreach(d => m.update(idOf(d, idField), d))
    m.values.toSeq
  }

  final case class SliceResult(sent: Long, flushes: Int)

  /** Drain one slice's cursor through the bounded buffer: every
    * `flushThreshold` docs the buffer is deduped by `idField` (keep-last)
    * and handed to `flush`; the residual flushes at the end. A `flush`
    * exception propagates immediately — the buffer is NOT cleared and no
    * further cursor reads happen, so a caller retry re-runs the slice
    * whole (idempotent downstream thanks to the id dedup).
    */
  def extractSlice(cursor: Iterator[String], flush: Seq[String] => Unit,
      idField: String = "_id",
      flushThreshold: Int = FlushThreshold): SliceResult = {
    require(flushThreshold > 0, "flushThreshold must be positive")
    var sent = 0L
    var flushes = 0
    val buffer = scala.collection.mutable.ArrayBuffer.empty[String]
    def doFlush(): Unit = if (buffer.nonEmpty) {
      val batch = dedupKeepLast(buffer.toSeq, idField)
      flush(batch) // on throw: buffer stays intact for the caller's retry
      sent += batch.size
      flushes += 1
      buffer.clear()
    }
    cursor.foreach { doc =>
      buffer += doc
      if (buffer.size >= flushThreshold) doFlush()
    }
    doFlush()
    SliceResult(sent, flushes)
  }

  /** Post-extraction total validation (tasks.py:262-300): the summed
    * per-slice sent counts must sit within ±`tolerance` of the source
    * collection count. Zero expected validates trivially (the reference
    * logs and returns).
    */
  def validateTotal(expected: Long, sentPerSlice: Seq[Long],
      tolerance: Double = 0.05): Unit =
    if (expected > 0)
      Relational.reconcileCount(sentPerSlice.sum, expected, tolerance)

  private def baseFilter(baseQuery: Option[String]): JValue =
    baseQuery.map(JsonMethods.parse(_)).getOrElse(JObject())

  /** One extreme of the slice variable over the WIRE (the reference's
    * `_get_extreme_value`, tasks.py:183-186): find(filter) sorted by the
    * slice var, limit 1. None = empty collection/window.
    */
  /** Close a cursor without masking an in-flight exception: killCursors
    * over a socket that just died throws from the finally block and
    * REPLACES the original error (the actual failing page) with a cleanup
    * artifact — log and swallow instead.
    */
  private def closeQuietly(c: AutoCloseable): Unit =
    try c.close()
    catch { case e: Exception =>
      System.err.println(s"[mongo] cursor close failed: ${e.getMessage}") }

  /** A slice-variable extreme with its BSON type preserved: `isDate` marks
    * a value decoded from BSON UTC datetime (the `{"$date": ms}` sentinel),
    * which must go back onto the wire as type 0x09 in slice filters.
    */
  final case class Extreme(value: Long, isDate: Boolean)

  def extremeValue(client: MongoWireClient, db: String, coll: String,
      baseQuery: Option[String], sliceVar: String, direction: Int): Option[Long] =
    typedExtreme(client, db, coll, baseQuery, sliceVar, direction).map(_.value)

  def typedExtreme(client: MongoWireClient, db: String, coll: String,
      baseQuery: Option[String], sliceVar: String, direction: Int): Option[Extreme] = {
    val cursor = client.find(db, coll, baseFilter(baseQuery),
      sort = Some(sliceVar -> direction), limit = Some(1L), batchSize = 1)
    try {
      if (!cursor.hasNext) None
      else JsonMethods.parse(cursor.next()) \ sliceVar match {
        case JLong(l) => Some(Extreme(l, isDate = false))
        case JInt(i) => Some(Extreme(i.toLong, isDate = false))
        // double extremes round OUTWARD: floor(min) / ceil(max), so the
        // slice range COVERS fractional extremes — plain toLong would
        // lower the max and silently exclude docs in (floor(max), max]
        case JDouble(d) => Some(Extreme(
          if (direction >= 0) math.floor(d).toLong else math.ceil(d).toLong,
          isDate = false))
        // BSON UTC datetime travels as the typed sentinel — the reference's
        // PRIMARY minhasaude case (tasks.py slices datetimes by timedelta)
        case JObject(("$date", JLong(ms)) :: Nil) =>
          Some(Extreme(ms, isDate = true))
        case JObject(("$date", JInt(ms)) :: Nil) if ms.isValidLong =>
          Some(Extreme(ms.toLong, isDate = true))
        case other => throw new IllegalArgumentException(
          s"slice var $sliceVar is not numeric or datetime: $other")
      }
    } finally closeQuietly(cursor)
  }

  private val MillisPerDay = 86400000L

  /** The reference's whole flow over the REAL wire protocol
    * (tasks.py:161-300 — `gerar_faixas_de_fatiamento` +
    * `extrair_fatia_para_datalake` per range + `validar_total_documentos`):
    * extremes and count via OP_MSG commands, per-slice find cursors
    * drained through the bounded flush buffer (getMore under the hood),
    * cursors closed even on failure, final ±tolerance reconciliation.
    * Returns the per-slice results.
    *
    * When the slice variable is a BSON UTC datetime, `sliceSize` is in
    * DAYS — the reference slices datetime vars by `timedelta(days=
    * slice_size)` (tasks.py:74-105) — and the slice bounds travel back as
    * type 0x09 so type bracketing matches. Numeric slice variables keep
    * `sliceSize` in the variable's own unit.
    */
  def extractAll(client: MongoWireClient, db: String, coll: String,
      baseQuery: Option[String], sliceVar: String, sliceSize: Long,
      flush: Seq[String] => Unit, idField: String = "_id",
      flushThreshold: Int = FlushThreshold, batchSize: Int = 1000,
      tolerance: Double = 0.05): Seq[SliceResult] = {
    val expected = client.count(db, coll, baseFilter(baseQuery))
    val minOpt = typedExtreme(client, db, coll, baseQuery, sliceVar, 1)
    val maxOpt = typedExtreme(client, db, coll, baseQuery, sliceVar, -1)
    val results = (minOpt, maxOpt) match {
      case (Some(min), Some(max)) =>
        require(min.isDate == max.isDate,
          s"slice var $sliceVar mixes datetime and numeric values " +
            s"(min isDate=${min.isDate}, max isDate=${max.isDate})")
        val step = if (min.isDate) {
          require(sliceSize <= Long.MaxValue / MillisPerDay,
            s"sliceSize $sliceSize days overflows epoch millis")
          sliceSize * MillisPerDay // days → ms, like timedelta(days=n)
        } else sliceSize
        slices(min.value, max.value, step).map { case (gte, lte) =>
          // datetime slices are half-open except the last (see
          // sliceFilterJson: midnight-valued Date collections would
          // otherwise double-extract every boundary cohort)
          val filter = JsonMethods.parse(
            sliceFilterJson(baseQuery, sliceVar, gte, lte,
              isDate = min.isDate,
              upperInclusive = !min.isDate || lte == max.value))
          val cursor = client.find(db, coll, filter, batchSize = batchSize)
          // releases a live cursor if a flush threw, without masking the
          // flush/transport error with a cleanup failure
          try extractSlice(cursor, flush, idField, flushThreshold)
          finally closeQuietly(cursor)
        }
      case _ => Nil // empty window: validate against the (zero) count below
    }
    validateTotal(expected, results.map(_.sent), tolerance)
    results
  }
}
