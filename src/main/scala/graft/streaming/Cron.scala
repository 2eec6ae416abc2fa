package graft.streaming

import java.time.{LocalDate, LocalDateTime}

/** Classic 5-field cron expression (minute hour day-of-month month
  * day-of-week) — the CRON member of the reference's schedule-trigger
  * triad (nexus/mixins/schedule.py:46-131; its APScheduler CronTrigger
  * keyword fields map onto the same five columns, which is the form
  * every external scheduler speaks).
  *
  * Supported per field: `*`, lists `a,b,c`, ranges `a-b`, slash
  * steps over a star or range (every n-th value), month names
  * (jan..dec) and weekday names (sun..sat),
  * day-of-week 0-7 with both 0 and 7 meaning Sunday. Vintage-cron OR
  * semantics: when BOTH day-of-month and day-of-week are restricted,
  * a date matching EITHER fires.
  *
  * `next` is a pure function of the probe time — schedulers call it
  * with the real clock, tests with a fake one.
  */
final case class Cron(
    minutes: Set[Int],
    hours: Set[Int],
    daysOfMonth: Set[Int],
    months: Set[Int],
    daysOfWeek: Set[Int],
    domRestricted: Boolean,
    dowRestricted: Boolean) {

  private val minuteOfDay: Seq[Int] =
    for (h <- hours.toSeq.sorted; m <- minutes.toSeq.sorted) yield h * 60 + m

  def dateMatches(d: LocalDate): Boolean =
    months.contains(d.getMonthValue) && {
      val domOk = daysOfMonth.contains(d.getDayOfMonth)
      val dowOk = daysOfWeek.contains(d.getDayOfWeek.getValue % 7) // Sun=0
      (domRestricted, dowRestricted) match {
        case (false, false) => true
        case (true, false)  => domOk
        case (false, true)  => dowOk
        case (true, true)   => domOk || dowOk // vintage-cron OR
      }
    }

  /** The first fire time STRICTLY after `after`, to minute precision. */
  def next(after: LocalDateTime): LocalDateTime = {
    var t = after.plusMinutes(1).withSecond(0).withNano(0)
    var guard = 0
    // bound: any satisfiable date (incl. Feb 29) recurs within 8 years
    while (guard <= 366 * 8) {
      if (dateMatches(t.toLocalDate)) {
        val cur = t.getHour * 60 + t.getMinute
        minuteOfDay.find(_ >= cur) match {
          case Some(md) => return t.toLocalDate.atTime(md / 60, md % 60)
          case None     => ()
        }
      }
      t = t.toLocalDate.plusDays(1).atStartOfDay()
      guard += 1
    }
    throw new IllegalArgumentException(
      s"cron expression never fires (e.g. day 31 of a 30-day month only)")
  }
}

object Cron {
  private val monthNames = Seq("jan", "feb", "mar", "apr", "may", "jun",
    "jul", "aug", "sep", "oct", "nov", "dec").zipWithIndex
    .map { case (n, i) => n -> (i + 1) }.toMap
  private val dayNames = Seq("sun", "mon", "tue", "wed", "thu", "fri",
    "sat").zipWithIndex.toMap

  def parse(expr: String): Cron = {
    val parts = expr.trim.toLowerCase.split("\\s+")
    require(parts.length == 5,
      s"cron '$expr' must have 5 fields (minute hour dom month dow), " +
        s"got ${parts.length}")
    val Array(mi, h, dom, mo, dow) = parts
    Cron(
      minutes = field("minute", mi, 0, 59),
      hours = field("hour", h, 0, 23),
      daysOfMonth = field("day-of-month", dom, 1, 31),
      months = field("month", mo, 1, 12, monthNames),
      daysOfWeek = field("day-of-week", dow, 0, 7, dayNames)
        .map(d => if (d == 7) 0 else d), // 7 == Sunday == 0
      domRestricted = dom != "*",
      dowRestricted = dow != "*")
  }

  private def field(
      name: String, spec: String, lo: Int, hi: Int,
      names: Map[String, Int] = Map.empty): Set[Int] = {
    def err(msg: String) = throw new IllegalArgumentException(
      s"cron $name field '$spec': $msg")
    def num(s: String): Int =
      names.getOrElse(s,
        try s.toInt catch { case _: NumberFormatException =>
          err(s"'$s' is not a number or name") })
    def one(tok: String): Seq[Int] = {
      val (body, step) = tok.split("/", -1) match {
        case Array(b)     => (b, 1)
        case Array(b, st) =>
          val v = try st.toInt catch {
            case _: NumberFormatException => err(s"bad step '$st'") }
          if (v < 1) err(s"step must be >= 1, got $v")
          (b, v)
        case _ => err("at most one '/' allowed")
      }
      val range: Seq[Int] = body match {
        case "*" => lo to hi
        case r if r.contains("-") =>
          r.split("-", -1) match {
            case Array(a, b) =>
              val (av, bv) = (num(a), num(b))
              if (av > bv) err(s"range $av-$bv is inverted")
              av to bv
            case _ => err("at most one '-' allowed")
          }
        // "5/15" == "5-max/15" (vixie-cron behavior)
        case v if tok.contains("/") => num(v) to hi
        case v => Seq(num(v))
      }
      range.filter(x => (x - range.head) % step == 0)
    }
    val vals = spec.split(",", -1).toSeq.flatMap {
      case ""  => err("empty list element")
      case tok => one(tok)
    }.toSet
    vals.find(v => v < lo || v > hi)
      .foreach(v => err(s"value $v outside [$lo, $hi]"))
    if (vals.isEmpty) err("matches nothing")
    vals
  }
}
