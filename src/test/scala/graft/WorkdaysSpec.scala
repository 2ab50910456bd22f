package graft

import graft.functions.{Holidays, Workdays}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Business-day duration (SURVEY.md §2.6 F10) vs hand-computed cases:
  * 08:00-17:00 workday, same-day, weekend span, holidays, clipping,
  * nulls. Reference: datasets/create_yougile_dataset.ipynb cell 7.
  */
class WorkdaysSpec extends SparkSpec {

  private val holidays = Holidays.toDateArray(Seq("2024-01-16"))
  private val noHolidays = array().cast("array<date>")

  private def diff(start: String, end: String, hol: org.apache.spark.sql.Column): Option[Double] = {
    val row = spark.range(1)
      .select(Workdays.workdaysDiff(
        to_timestamp(lit(start)), to_timestamp(lit(end)), hol).as("d"))
      .head()
    if (row.isNullAt(0)) None else Some(row.getDouble(0))
  }

  test("same working day: 3 of 9 hours") {
    // 2024-01-10 is a Wednesday
    assert(diff("2024-01-10 09:00:00", "2024-01-10 12:00:00", noHolidays).contains(0.33))
  }

  test("same day fully clipped: before 08:00 to after 17:00 is one day") {
    assert(diff("2024-01-10 06:00:00", "2024-01-10 18:30:00", noHolidays).contains(1.0))
  }

  test("same day on a weekend is zero") {
    // 2024-01-13 is a Saturday
    assert(diff("2024-01-13 09:00:00", "2024-01-13 16:00:00", noHolidays).contains(0.0))
  }

  test("adjacent weekdays with partial edges") {
    // Mon 10:00 → Tue 12:00: (17-10)/9 + (12-8)/9 = 0.7778 + 0.4444
    assert(diff("2024-01-15 10:00:00", "2024-01-16 12:00:00", noHolidays).contains(1.22))
  }

  test("span over a weekend counts only the weekday edges") {
    // Fri 16:00 → Mon 09:00: 1/9 + 1/9
    assert(diff("2024-01-12 16:00:00", "2024-01-15 09:00:00", noHolidays).contains(0.22))
  }

  test("holiday inside the span contributes zero") {
    // Mon 09:00 → Wed 12:00 with Tue 2024-01-16 a holiday:
    // first (17-9)/9 + between 0 + last (12-8)/9 = 0.8889 + 0.4444
    assert(diff("2024-01-15 09:00:00", "2024-01-17 12:00:00", holidays).contains(1.33))
    // without the holiday the in-between Tuesday adds 1.0
    assert(diff("2024-01-15 09:00:00", "2024-01-17 12:00:00", noHolidays).contains(2.33))
  }

  test("null endpoints yield null") {
    val row = spark.range(1)
      .select(Workdays.workdaysDiff(
        lit(null).cast("timestamp"), to_timestamp(lit("2024-01-10 12:00:00")),
        noHolidays).as("d"))
      .head()
    assert(row.isNullAt(0))
  }

  test("weekdaysBetween matches per-day iteration over a 3-year range") {
    import java.time.{DayOfWeek, LocalDate}
    val base = LocalDate.of(2023, 1, 1)
    val df = spark.range(0, 1000)
      .select(col("id"),
        Workdays.weekdaysBetween(
          to_date(lit(base.toString)),
          date_add(to_date(lit(base.toString)), col("id").cast("int"))).as("wd"))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 1000).foreach { n =>
      val expected = (0 until n).count { i =>
        val d = base.plusDays(i).getDayOfWeek
        d != DayOfWeek.SATURDAY && d != DayOfWeek.SUNDAY
      }
      assert(got(n.toLong) == expected, s"weekdays in [base, base+$n)")
    }
  }
}
