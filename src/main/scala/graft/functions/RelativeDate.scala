package graft.functions

import java.time.{LocalDate, LocalDateTime, ZoneId}
import java.time.format.DateTimeFormatter

/** Relative-date resolution for incremental windows. The reference resolves
  * strings like `D-7`, `M-1`, `Y-1`, `today`, `yesterday` into concrete dates
  * at flow start (reference: pipelines/utils/time.py:15-36,
  * pipelines/datalake/utils/data_transformations.py:25-46,
  * pipelines/utils/basics.py:30-51). Resolution is driver-side and pure: the
  * anchor date is an explicit parameter (never `now()`) so plans stay
  * deterministic and cache/AQE-friendly.
  */
object RelativeDate {

  private val Dn = """(?i)d-(\d+)""".r
  private val Mn = """(?i)m-(\d+)""".r
  private val Yn = """(?i)y-(\d+)""".r
  private val Iso = """(\d{4})-(\d{2})-(\d{2})""".r

  /** Resolve a relative-date token against an anchor date.
    * `D-n` = n days back; `M-n` = first day of the month, n months back;
    * `Y-n` = first day of the year, n years back; `today`/`yesterday`;
    * ISO dates pass through.
    */
  def resolve(token: String, anchor: LocalDate): LocalDate = token.trim match {
    case Dn(n)        => anchor.minusDays(n.toLong)
    case Mn(n)        => anchor.minusMonths(n.toLong).withDayOfMonth(1)
    case Yn(n)        => anchor.minusYears(n.toLong).withDayOfYear(1)
    case t if t.equalsIgnoreCase("today")     => anchor
    case t if t.equalsIgnoreCase("yesterday") => anchor.minusDays(1)
    case Iso(y, m, d) => LocalDate.of(y.toInt, m.toInt, d.toInt)
    case other =>
      throw new IllegalArgumentException(s"unparseable relative date: $other")
  }

  /** Inclusive [start, end] working range resolved from two tokens
    * (reference: pipelines/utils/time.py:39-93 — its TZ-localized
    * start/end ± interval computation, with the TZ an explicit argument).
    */
  def range(startToken: String, endToken: String, anchor: LocalDate): (LocalDate, LocalDate) = {
    val s = resolve(startToken, anchor)
    val e = resolve(endToken, anchor)
    require(!s.isAfter(e), s"start $s after end $e")
    (s, e)
  }

  /** Split [start, end] into consecutive tumbling windows of `days` days —
    * the reference's year→N-day-window generator
    * (reference: pipelines/datalake/extract_load/vitai_db/tasks.py:32-56).
    * Used to parameterize incremental scans; data-side windows use
    * `functions.window` instead.
    */
  def tumblingWindows(start: LocalDate, end: LocalDate, days: Int): Seq[(LocalDate, LocalDate)] = {
    require(days > 0, "window must be positive")
    Iterator.iterate(start)(_.plusDays(days.toLong))
      .takeWhile(!_.isAfter(end))
      .map(s => (s, Seq(s.plusDays(days.toLong - 1), end).min(Ordering.by((d: LocalDate) => d))))
      .toSeq
  }

  private val isoFmt = DateTimeFormatter.ISO_LOCAL_DATE

  /** Current date in a named zone — the single sanctioned `now` accessor;
    * callers thread the result through as the anchor parameter. */
  def todayIn(zone: String): LocalDate = LocalDate.now(ZoneId.of(zone))

  def fmt(d: LocalDate): String = d.format(isoFmt)
}
