package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Business-day duration (SURVEY.md §2.6 F10) as pure column math —
  * no UDF, no per-row calendar iteration, so it stays inside
  * whole-stage codegen and scales to arbitrary row counts.
  *
  * Reference semantics (datasets/create_yougile_dataset.ipynb cell 7,
  * `workdays_diff`): fractional working days between two timestamps,
  * workday 08:00-17:00 (9h), RU holiday calendar, partial first/last
  * days clipped, same-day case, result rounded to 2dp, null when
  * either endpoint is null. Non-working days contribute 0.
  */
object Workdays {

  /** Monday anchor: 1970-01-05 was a Monday. */
  private val mondayEpoch = to_date(lit("1970-01-05"))

  /** Number of weekdays (Mon-Fri) in [mondayEpoch, d) — closed form,
    * valid for dates before the anchor too (floor division).
    */
  private def weekdayIndex(d: Column): Column = {
    val n = datediff(d, mondayEpoch).cast(LongType)
    val weeks = floor(n.cast(DoubleType) / 7.0).cast(LongType)
    val rem = n - weeks * 7 // 0..6, Monday-based
    weeks * 5 + least(rem, lit(5L))
  }

  /** Weekdays (Mon-Fri) in the half-open date interval [a, b);
    * negative when b < a.
    */
  def weekdaysBetween(a: Column, b: Column): Column =
    weekdayIndex(b) - weekdayIndex(a)

  /** Mon-Fri test (Spark dayofweek: 1=Sunday .. 7=Saturday). */
  def isWeekday(d: Column): Column = dayofweek(d).between(2, 6)

  /** is_working_day: weekday and not in the holiday set. */
  def isWorkingDay(d: Column, holidays: Column): Column =
    isWeekday(d) && !coalesce(array_contains(holidays, d), lit(false))

  /** workalendar `get_working_days_delta(d1, d2)`: working days in the
    * half-open interval (d1, d2]. Holiday subtraction is an O(|H|)
    * array scan per row — |H| is ~10/yr so this beats a join/explode
    * at any scale.
    */
  def workingDaysDelta(d1: Column, d2: Column, holidays: Column): Column = {
    val weekdays = weekdaysBetween(date_add(d1, 1), date_add(d2, 1))
    val holidayHits = size(filter(holidays,
      h => h > d1 && h <= d2 && isWeekday(h)))
    weekdays - coalesce(holidayHits, lit(0))
  }

  private val dayStart = 8.0
  private val dayEnd = 17.0
  private val workHours = dayEnd - dayStart

  /** Fractional hour-of-day (hour + minute/60), reference precision. */
  private def hourOf(ts: Column): Column =
    hour(ts).cast(DoubleType) + minute(ts).cast(DoubleType) / 60.0

  private def clip(c: Column, lo: Double, hi: Double): Column =
    least(greatest(c, lit(lo)), lit(hi))

  /** Fractional working days between two (already-local) timestamps.
    *
    * @param holidays array<date> column (use `typedlit(dates)`); pass
    *                 `lit(Array.empty)` typed as dates for weekday-only.
    */
  def workdaysDiff(start: Column, end: Column, holidays: Column): Column = {
    val sDate = to_date(start)
    val eDate = to_date(end)

    val multiDay = {
      val between = greatest(
        workingDaysDelta(sDate, eDate, holidays) - 1, lit(0L)
      ).cast(DoubleType)
      val firstPart = when(
        isWorkingDay(sDate, holidays),
        clip(lit(dayEnd) - greatest(hourOf(start), lit(dayStart)), 0, workHours) / workHours
      ).otherwise(0.0)
      val lastPart = when(
        isWorkingDay(eDate, holidays),
        clip(least(hourOf(end), lit(dayEnd)) - lit(dayStart), 0, workHours) / workHours
      ).otherwise(0.0)
      between + firstPart + lastPart
    }

    val sameDay = when(
      isWorkingDay(sDate, holidays),
      clip(least(hourOf(end), lit(dayEnd)) - greatest(hourOf(start), lit(dayStart)),
        0, workHours) / workHours
    ).otherwise(0.0)

    when(start.isNull || end.isNull, lit(null).cast(DoubleType))
      .when(sDate < eDate, round(multiDay, 2))
      .otherwise(round(sameDay, 2))
  }

  /** Russian federal holidays for a year range (public calendar: New
    * Year week Jan 1-8, Defender Day Feb 23, Women's Day Mar 8, Spring
    * and Labour Day May 1, Victory Day May 9, Russia Day Jun 12, Unity
    * Day Nov 4). Observed-date shifts are intentionally NOT modeled —
    * the reference's workalendar dependency only counts the statutory
    * dates for `is_working_day`.
    */
  def ruHolidays(fromYear: Int, toYear: Int): Seq[String] =
    (fromYear to toYear).flatMap { y =>
      Seq(f"$y-01-01", f"$y-01-02", f"$y-01-03", f"$y-01-04", f"$y-01-05",
        f"$y-01-06", f"$y-01-07", f"$y-01-08", f"$y-02-23", f"$y-03-08",
        f"$y-05-01", f"$y-05-09", f"$y-06-12", f"$y-11-04")
    }

  /** The holiday fixture as an array<date> literal column. */
  def ruHolidayColumn(fromYear: Int = 2020, toYear: Int = 2026): Column =
    Holidays.toDateArray(ruHolidays(fromYear, toYear))

  /** JVM mirror of `workdaysDiff` for the SQL-registered UDF path
    * (SURVEY.md §7.4: the one irreducible UDF). Column math is the
    * primary implementation; parity between the two is asserted in
    * WorkdaysSpec.
    */
  def workdaysDiffScala(start: java.time.LocalDateTime,
      end: java.time.LocalDateTime,
      holidays: Set[java.time.LocalDate]): java.lang.Double = {
    import java.time.LocalDate
    if (start == null || end == null) return null
    val anchor = LocalDate.of(1970, 1, 5)
    def isWeekday(d: LocalDate) = d.getDayOfWeek.getValue <= 5
    def isWorking(d: LocalDate) = isWeekday(d) && !holidays(d)
    def hourOf(t: java.time.LocalDateTime) = t.getHour + t.getMinute / 60.0
    def clip(x: Double) = math.min(math.max(x, 0.0), 9.0)
    def wi(d: LocalDate) = {
      val n = d.toEpochDay - anchor.toEpochDay
      val weeks = Math.floorDiv(n, 7)
      weeks * 5 + math.min(n - weeks * 7, 5)
    }
    val sD = start.toLocalDate
    val eD = end.toLocalDate
    val res =
      if (sD.isBefore(eD)) {
        val weekdays = wi(eD.plusDays(1)) - wi(sD.plusDays(1))
        val holHits = holidays.count(h =>
          h.isAfter(sD) && !h.isAfter(eD) && isWeekday(h))
        val between = math.max(weekdays - holHits - 1, 0).toDouble
        val first =
          if (isWorking(sD)) clip(17.0 - math.max(hourOf(start), 8.0)) / 9.0 else 0.0
        val last =
          if (isWorking(eD)) clip(math.min(hourOf(end), 17.0) - 8.0) / 9.0 else 0.0
        between + first + last
      } else if (isWorking(sD))
        clip(math.min(hourOf(end), 17.0) - math.max(hourOf(start), 8.0)) / 9.0
      else 0.0
    math.round(res * 100).toDouble / 100
  }
}

object Holidays {
  /** Build an array<date> literal from ISO date strings. */
  def toDateArray(dates: Seq[String]): Column =
    array(dates.map(d => to_date(lit(d))): _*)
}
