package graft.core

/** CF non-standard calendar arithmetic (the cftime.num2date/date2num
  * semantics the reference inherits wherever a time coordinate carries
  * `units` + `calendar` encoding attrs — aggregation.py:193-196
  * materializes a cftime epoch value for exactly these variables, and
  * xarray's decode_times would otherwise produce cftime object arrays
  * this engine's integer-exact model deliberately avoids).
  *
  * Everything here is EXACT integer arithmetic in microseconds — no
  * floating-point date math — so the DuckDB oracle can replicate the
  * same divisions verbatim (q35's SQL does) and a round trip is
  * bit-identical by construction.
  *
  * Calendars (CF conventions §4.4.1):
  *  - `360_day`: every year 360 days, every month 30 days.
  *  - `noleap` / `365_day`: fixed month lengths, never a leap year.
  *  - `all_leap` / `366_day`: fixed month lengths, always a leap year.
  *  - `proleptic_gregorian`: Gregorian rules extended indefinitely
  *    backwards (what java.time / DuckDB DATE arithmetic uses).
  *  - `julian`: every 4th year leap, indefinitely.
  *  - `standard` / `gregorian`: the REAL mixed calendar — Gregorian from
  *    1582-10-15, Julian through 1582-10-04, with the ten dropped days
  *    (1582-10-05..14 do not exist). Day numbers are continuous across
  *    the gap (JDN 2299160 = 1582-10-04 Julian is followed by
  *    JDN 2299161 = 1582-10-15 Gregorian).
  *
  * Day-number epoch: like astronomy's Julian Day Number we count days on
  * a calendar-specific axis; only (units, calendar) pairs ever mix, so
  * the axes never need to agree with each other — cftime behaves the
  * same way (a 360_day date and a standard date are incomparable).
  */
object CfCalendar {

  final case class DateTime(year: Long, month: Int, day: Int,
                            hour: Int = 0, minute: Int = 0, second: Int = 0,
                            micro: Int = 0) {
    require(month >= 1 && month <= 12, s"month $month out of range")
    require(day >= 1 && day <= 31, s"day $day out of range")
  }

  /** Parsed `units` attribute: microseconds per step + the epoch. */
  final case class Units(stepMicros: Long, epoch: DateTime)

  private val MicrosPerDay = 86400000000L

  private val UnitMicros: Map[String, Long] = {
    val base = Map(
      "microseconds" -> 1L,
      "milliseconds" -> 1000L,
      "seconds" -> 1000000L,
      "minutes" -> 60000000L,
      "hours" -> 3600000000L,
      "days" -> MicrosPerDay)
    val aliases = Map(
      "microsecond" -> 1L, "usec" -> 1L, "usecs" -> 1L, "us" -> 1L,
      "millisecond" -> 1000L, "msec" -> 1000L, "msecs" -> 1000L, "ms" -> 1000L,
      "second" -> 1000000L, "sec" -> 1000000L, "secs" -> 1000000L, "s" -> 1000000L,
      "minute" -> 60000000L, "min" -> 60000000L, "mins" -> 60000000L,
      "hour" -> 3600000000L, "hr" -> 3600000000L, "hrs" -> 3600000000L, "h" -> 3600000000L,
      "day" -> MicrosPerDay, "d" -> MicrosPerDay)
    base ++ aliases
  }

  private val UnitsRe =
    """(?i)^\s*(\w+)\s+since\s+(-?\d{1,6})-(\d{1,2})-(\d{1,2})""" +
      """(?:[ tT](\d{1,2}):(\d{1,2})(?::(\d{1,2})(?:\.(\d{1,6}))?)?)?""" +
      """(?:\s*(?:Z|UTC|[+-]0{1,2}:?0{0,2}))?\s*$"""

  private val UnitsPattern = UnitsRe.r

  /** Parse a CF `units` string, e.g. "days since 2000-01-01",
    * "seconds since 1970-01-01 00:00:00". Non-UTC zone offsets are
    * rejected by name (cftime shifts the epoch; nothing in the test
    * corpus nor the reference feedstocks carries one). */
  def parseUnits(units: String): Units = units match {
    case UnitsPattern(unit, y, mo, d, h, mi, s, frac) =>
      val step = UnitMicros.getOrElse(unit.toLowerCase,
        throw new IllegalArgumentException(
          s"cf-calendar: unsupported time unit '$unit' in units '$units'"))
      val micro = Option(frac).map(f => (f + "0" * (6 - f.length)).toInt).getOrElse(0)
      Units(step, DateTime(y.toLong, mo.toInt, d.toInt,
        Option(h).map(_.toInt).getOrElse(0),
        Option(mi).map(_.toInt).getOrElse(0),
        Option(s).map(_.toInt).getOrElse(0), micro))
    case _ =>
      throw new IllegalArgumentException(
        s"cf-calendar: cannot parse units '$units' (want '<unit> since Y-M-D[ h:m:s]')")
  }

  /** True when `units` looks like a CF time encoding (cheap probe used by
    * the opt-in decodeTimes pass to pick candidate variables). */
  def isTimeUnits(units: String): Boolean =
    UnitsPattern.findFirstIn(units).isDefined

  // -------------------------------------------------------------- fixed
  private val Cum365 = Array(0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334)
  private val Cum366 = Array(0, 31, 60, 91, 121, 152, 182, 213, 244, 274, 305, 335)
  private val Len365 = Array(31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)
  private val Len366 = Array(31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)

  private def floorDiv(a: Long, b: Long): Long = Math.floorDiv(a, b)
  private def floorMod(a: Long, b: Long): Long = Math.floorMod(a, b)

  /** Canonical calendar names (aliases folded). */
  def canonical(calendar: String): String = calendar.toLowerCase match {
    case "360_day" => "360_day"
    case "noleap" | "365_day" => "noleap"
    case "all_leap" | "366_day" => "all_leap"
    case "proleptic_gregorian" => "proleptic_gregorian"
    case "julian" => "julian"
    case "standard" | "gregorian" | "" => "standard"
    case other =>
      throw new IllegalArgumentException(
        s"cf-calendar: unsupported calendar '$other'")
  }

  /** Days from year 0, month 1, day 1 of the given calendar to (y,m,d).
    * For julian/gregorian/standard this is an offset JDN (continuous,
    * floor-division exact for any year incl. negatives). */
  def dayNumber(cal: String, y: Long, m: Int, d: Int): Long = canonical(cal) match {
    case "360_day" =>
      require(d >= 1 && d <= 30, s"360_day: day $d out of 1..30")
      y * 360L + (m - 1) * 30L + (d - 1)
    case "noleap" =>
      require(d >= 1 && d <= Len365(m - 1), s"noleap: day $d invalid for month $m")
      y * 365L + Cum365(m - 1) + (d - 1)
    case "all_leap" =>
      require(d >= 1 && d <= Len366(m - 1), s"all_leap: day $d invalid for month $m")
      y * 366L + Cum366(m - 1) + (d - 1)
    case "proleptic_gregorian" => gregorianDays(y, m, d)
    case "julian" => julianDays(y, m, d)
    case "standard" =>
      // the gap: 1582-10-05..14 don't exist; ≥ 1582-10-15 is Gregorian
      val greg = y > 1582 || (y == 1582 && (m > 10 || (m == 10 && d >= 15)))
      if (greg) gregorianDays(y, m, d)
      else {
        val n = julianDays(y, m, d)
        require(y != 1582 || m != 10 || d <= 4 || d >= 15,
          s"standard calendar: 1582-10-$d does not exist (Gregorian reform gap)")
        n
      }
  }

  /** Inverse of [[dayNumber]]. */
  def fromDayNumber(cal: String, n: Long): (Long, Int, Int) = canonical(cal) match {
    case "360_day" =>
      (floorDiv(n, 360), (floorMod(n, 360) / 30).toInt + 1,
        floorMod(n, 30).toInt + 1)
    case "noleap" =>
      val y = floorDiv(n, 365); val doy = floorMod(n, 365).toInt
      val m = monthOf(doy, Cum365)
      (y, m, doy - Cum365(m - 1) + 1)
    case "all_leap" =>
      val y = floorDiv(n, 366); val doy = floorMod(n, 366).toInt
      val m = monthOf(doy, Cum366)
      (y, m, doy - Cum366(m - 1) + 1)
    case "proleptic_gregorian" => gregorianFromDays(n)
    case "julian" => julianFromDays(n)
    case "standard" =>
      if (n >= StandardReformDay) gregorianFromDays(n) else julianFromDays(n)
  }

  private def monthOf(doy: Int, cum: Array[Int]): Int = {
    var m = 12
    while (cum(m - 1) > doy) m -= 1
    m
  }

  /** Day number of 1582-10-15 Gregorian — the first Gregorian day of the
    * mixed calendar (pinned by spec: JDN 2299161; our axis differs from
    * JDN by the fixed offset of the year-0 epoch). */
  private val StandardReformDay: Long = gregorianDays(1582, 10, 15)

  /** Howard Hinnant's civil-from-days / days-from-civil (public domain
    * algorithm), shifted so day 0 = 0000-01-01 proleptic Gregorian. */
  private def gregorianDays(y0: Long, m: Int, d: Int): Long = {
    val y = if (m <= 2) y0 - 1 else y0
    val era = floorDiv(y, 400)
    val yoe = y - era * 400 // [0, 399]
    val doy = (153 * (if (m > 2) m - 3 else m + 9) + 2) / 5 + d - 1 // [0, 365]
    val doe = yoe * 365 + yoe / 4 - yoe / 100 + doy // [0, 146096]
    // +60 shifts the epoch from 0000-03-01 (the March-based algorithm's
    // zero) back to 0000-01-01 (Jan+Feb of leap year 0 = 60 days)
    era * 146097 + doe + 60
  }

  private def gregorianFromDays(n: Long): (Long, Int, Int) = {
    val z = n - 60
    val era = floorDiv(z, 146097)
    val doe = z - era * 146097 // [0, 146096]
    val yoe = (doe - doe / 1460 + doe / 36524 - doe / 146096) / 365 // [0, 399]
    val y = yoe + era * 400
    val doy = doe - (365 * yoe + yoe / 4 - yoe / 100) // [0, 365]
    val mp = (5 * doy + 2) / 153 // [0, 11]
    val d = (doy - (153 * mp + 2) / 5 + 1).toInt // [1, 31]
    val m = (if (mp < 10) mp + 3 else mp - 9).toInt // [1, 12]
    (if (m <= 2) y + 1 else y, m, d)
  }

  /** Julian calendar: same month shapes, leap every 4th year (no century
    * rule). Same era decomposition with a 4-year cycle of 1461 days,
    * epoch aligned so the two axes agree where they must (the mixed
    * calendar is continuous at the 1582 reform, 10 calendar days apart:
    * julianDays(1582,10,4) + 1 == gregorianDays(1582,10,15)). */
  private def julianDays(y0: Long, m: Int, d: Int): Long = {
    val y = if (m <= 2) y0 - 1 else y0
    val era = floorDiv(y, 4)
    val yoe = y - era * 4 // [0, 3]
    val doy = (153 * (if (m > 2) m - 3 else m + 9) + 2) / 5 + d - 1
    val doe = yoe * 365 + doy
    // +58 = +60 (same March→January epoch shift) - 2 (Julian 0000-01-01
    // lies 2 days BEFORE proleptic-Gregorian 0000-01-01 on the one
    // continuous day axis both calendars share in the mixed calendar —
    // this constant is what pins julianDays(1582,10,4) + 1 ==
    // gregorianDays(1582,10,15), asserted in CFCodingSpec)
    era * 1461 + doe + 58
  }

  private def julianFromDays(n: Long): (Long, Int, Int) = {
    val z = n - 58
    val era = floorDiv(z, 1461)
    val doe = z - era * 1461 // [0, 1460]
    val yoe = (doe - doe / 1460) / 365 // [0, 3]
    val y = yoe + era * 4
    val doy = doe - 365 * yoe
    val mp = (5 * doy + 2) / 153
    val d = (doy - (153 * mp + 2) / 5 + 1).toInt
    val m = (if (mp < 10) mp + 3 else mp - 9).toInt
    (if (m <= 2) y + 1 else y, m, d)
  }

  // ------------------------------------------------------------ num<->date

  private def epochMicros(cal: String, e: DateTime): Long =
    Math.addExact(
      Math.multiplyExact(dayNumber(cal, e.year, e.month, e.day), MicrosPerDay),
      ((e.hour * 3600L + e.minute * 60L + e.second) * 1000000L + e.micro))

  /** cftime.num2date: decode one encoded value. The value must be
    * integral (exact-arithmetic contract; a fractional step count fails
    * by name rather than rounding silently). */
  def num2date(num: Long, units: Units, calendar: String): DateTime = {
    val cal = canonical(calendar)
    val total = Math.addExact(epochMicros(cal, units.epoch),
      Math.multiplyExact(num, units.stepMicros))
    val dayN = floorDiv(total, MicrosPerDay)
    val rem = floorMod(total, MicrosPerDay)
    val (y, m, d) = fromDayNumber(cal, dayN)
    val secOfDay = rem / 1000000L
    DateTime(y, m, d, (secOfDay / 3600).toInt, ((secOfDay % 3600) / 60).toInt,
      (secOfDay % 60).toInt, (rem % 1000000L).toInt)
  }

  /** cftime.date2num: the exact inverse (requires the instant to land on
    * a whole step of `units`, else fails by name — exact round trip or
    * nothing). */
  def date2num(dt: DateTime, units: Units, calendar: String): Long = {
    val cal = canonical(calendar)
    val total = Math.addExact(
      Math.multiplyExact(dayNumber(cal, dt.year, dt.month, dt.day), MicrosPerDay),
      ((dt.hour * 3600L + dt.minute * 60L + dt.second) * 1000000L + dt.micro))
    val delta = Math.subtractExact(total, epochMicros(cal, units.epoch))
    require(delta % units.stepMicros == 0,
      s"cf-calendar: $dt is not a whole number of steps from the epoch " +
        s"(delta $delta µs, step ${units.stepMicros} µs)")
    delta / units.stepMicros
  }

  /** Flat (y, m, d, h, mi, s, µs) decode for the codegen'd SQL kernel. */
  def num2dateParts(num: Long, units: String, calendar: String): Array[Long] = {
    val dt = num2date(num, parseUnits(units), calendar)
    Array(dt.year, dt.month.toLong, dt.day.toLong, dt.hour.toLong,
      dt.minute.toLong, dt.second.toLong, dt.micro.toLong)
  }

  /** Units/calendar parsed ONCE at plan build; the per-row decode the
    * codegen'd `cf_num2date` expression calls (one virtual call + integer
    * divisions per row — no string parsing in the loop). */
  final class PartsKernel(units: String, calendar: String) extends Serializable {
    private val u = parseUnits(units)
    private val cal = canonical(calendar)
    def parts(num: Long): Array[Long] = {
      val dt = num2date(num, u, cal)
      Array(dt.year, dt.month.toLong, dt.day.toLong, dt.hour.toLong,
        dt.minute.toLong, dt.second.toLong, dt.micro.toLong)
    }
  }
}
