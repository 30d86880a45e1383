package graft.finance.ops

import java.time.LocalDateTime
import java.time.temporal.ChronoUnit

/** Backup schedule computation — the engine-side twin of the reference's
  * APScheduler-backed backup scheduler (`ui/backend/api/backup_scheduler.py:
  * 21-78`): a 5-field cron (minute hour day month day_of_week), an enabled
  * flag, and the "next run" timestamp the UI persists. Pure time
  * arithmetic — actually firing the job belongs to whatever orchestrator
  * hosts it.
  *
  * Semantics follow APScheduler's CronTrigger, which the reference builds
  * field-by-field and which DIFFERS from classic cron in two ways this
  * object inherits deliberately: day-of-month and day-of-week are ANDed
  * (classic cron ORs them when both are restricted), and day_of_week
  * 0 = Monday (classic cron: 0 = Sunday; also matches the pipeline's
  * Mon=0 date features, SURVEY P5). Numeric fields only — the reference
  * passes raw numbers through.
  */
object BackupSchedule {

  /** The persisted schedule shape (`load_schedule` defaults: disabled
    * schedules keep their cron; retention default 7 days). */
  final case class Schedule(
      enabled: Boolean,
      cron: String = "0 2 * * *",
      retentionDays: Int = 7)

  /** One cron field → matching value set. Supports `*`, `a`, `a-b`,
    * `*‍/step`, `a-b/step`, and comma lists of those; None = invalid. */
  private[ops] def fieldValues(field: String, min: Int, max: Int): Option[Set[Int]] = {
    def element(e: String): Option[Seq[Int]] = {
      val (rangePart, step) = e.split("/") match {
        case Array(r) => (r, 1)
        case Array(r, s) if s.matches("\\d+") && s.toInt > 0 => (r, s.toInt)
        case _ => return None
      }
      val bounds = rangePart match {
        case "*" => Some((min, max))
        case r if r.matches("\\d+") =>
          val v = r.toInt
          // a bare value with a step means "from v to max" (cron convention)
          if (step == 1) Some((v, v)) else Some((v, max))
        case r if r.matches("\\d+-\\d+") =>
          val Array(a, b) = r.split("-").map(_.toInt)
          Some((a, b))
        case _ => None
      }
      bounds.filter { case (a, b) => a >= min && b <= max && a <= b }
        .map { case (a, b) => a to b by step }
    }
    val parts = field.split(",").toSeq
    if (parts.isEmpty) return None
    val elems = parts.map(element)
    if (elems.exists(_.isEmpty)) None else Some(elems.flatten.flatten.toSet)
  }

  private final case class Parsed(
      minute: Set[Int], hour: Set[Int], day: Set[Int], month: Set[Int], dow: Set[Int])

  private def parse(cron: String): Option[Parsed] = {
    val parts = cron.trim.split("\\s+")
    // <5 fields: reference warns and keeps no job. >5 fields: the
    // reference reads parts[0..4] and IGNORES the rest — a pasted 6-field
    // seconds-style cron is silently reinterpreted. Inherited deliberately
    // (this module's charter is reference parity), documented here.
    if (parts.length < 5) return None
    for {
      mi <- fieldValues(parts(0), 0, 59)
      h <- fieldValues(parts(1), 0, 23)
      d <- fieldValues(parts(2), 1, 31)
      mo <- fieldValues(parts(3), 1, 12)
      dw <- fieldValues(parts(4), 0, 6)
    } yield Parsed(mi, h, d, mo, dw)
  }

  /** First fire time STRICTLY after `after`, or None when the cron is
    * invalid or never fires within the 4-year search horizon (e.g. Feb 30).
    * Minute-stepping scan: a control-plane call, not a data-plane one —
    * clarity over cleverness. */
  def nextRun(cron: String, after: LocalDateTime): Option[LocalDateTime] =
    parse(cron).flatMap { p =>
      val horizon = after.plusYears(4)
      var t = after.truncatedTo(ChronoUnit.MINUTES).plusMinutes(1)
      while (t.isBefore(horizon)) {
        val matches = p.minute(t.getMinute) && p.hour(t.getHour) &&
          p.day(t.getDayOfMonth) && p.month(t.getMonthValue) &&
          p.dow(t.getDayOfWeek.getValue - 1) // APScheduler: Mon=0
        if (matches) return Some(t)
        t = t.plusMinutes(1)
      }
      None
    }

  /** `update_schedule`: a disabled schedule persists no next run; an
    * enabled one persists the cron's next fire time (None if invalid —
    * the reference logs the error and leaves no job scheduled). */
  def nextRunFor(schedule: Schedule, now: LocalDateTime): Option[LocalDateTime] =
    if (!schedule.enabled) None else nextRun(schedule.cron, now)
}
