package graft.finance

import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** Connection-health inference from the latest SimpleFIN poll — a direct
  * port of `ui/backend/services/connection_health.py:27-123` (SURVEY §7.1
  * step 4). Pure per-account logic applied on top of
  * [[Serving.accountHealth]]'s aggregates; driver-side or inside a
  * `Dataset.map`, no Spark dependency.
  */
object ConnectionHealth {

  /** Days until oldest stored history hits the rolling window edge. */
  val LossWarningDays = 30
  val LossUnhealthyDays = 14

  final case class Health(
      lookbackDays: Option[Int],
      bufferDays: Option[Int],
      daysSinceLastLoad: Option[Int],
      daysSinceLatestTransaction: Option[Int],
      healthStatus: String,
      healthMessage: String)

  private val formats = Seq(
    DateTimeFormatter.ofPattern("yyyy-MM-dd"),
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss"),
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))

  /** Lenient date parse, as the reference accepts several serializations. */
  def parseDate(value: Option[String]): Option[LocalDate] =
    value.map(_.trim).filter(_.nonEmpty).flatMap { raw =>
      val head = raw.take(19)
      formats.view.flatMap { f =>
        try Some(LocalDate.parse(head, f))
        catch {
          case _: Exception =>
            try Some(java.time.LocalDateTime.parse(head, f).toLocalDate)
            catch { case _: Exception => None }
        }
      }.headOption
    }

  def compute(
      lastSuccessfulLoad: Option[String],
      pollEarliestTransactionDate: Option[String],
      pollLatestTransactionDate: Option[String],
      oldestStoredTransactionDate: Option[String],
      today: LocalDate): Health = {
    import java.time.temporal.ChronoUnit.DAYS
    val pollDate = parseDate(lastSuccessfulLoad)
    val pollEarliest = parseDate(pollEarliestTransactionDate)
    val pollLatest = parseDate(pollLatestTransactionDate)
    val oldestStored = parseDate(oldestStoredTransactionDate)

    def daysBetween(a: LocalDate, b: LocalDate): Int = DAYS.between(a, b).toInt

    val daysSinceLoad = pollDate.map(daysBetween(_, today))
    val daysSinceLatestTxn = pollLatest.map(daysBetween(_, today))

    val lookbackDays = (pollEarliest, pollLatest, pollDate) match {
      case (Some(e), Some(l), _) => Some(math.max(daysBetween(e, l), 0))
      case (Some(e), None, Some(p)) => Some(math.max(daysBetween(e, p), 0))
      case _ => None
    }

    val daysUntilLoss = for (lb <- lookbackDays; os <- oldestStored)
      yield daysBetween(today.minusDays(lb.toLong), os)

    val (status, message) = healthStatus(lookbackDays, daysUntilLoss, daysSinceLoad, daysSinceLatestTxn)
    Health(lookbackDays, daysUntilLoss, daysSinceLoad, daysSinceLatestTxn, status, message)
  }

  private def plural(n: Int): String = if (n != 1) "s" else ""

  private def healthStatus(
      lookbackDays: Option[Int],
      daysUntilLoss: Option[Int],
      daysSinceLoad: Option[Int],
      daysSinceLatestTxn: Option[Int]): (String, String) = {
    daysUntilLoss match {
      case Some(d) if d > 0 && d <= LossUnhealthyDays =>
        return ("unhealthy",
          s"Only $d day${plural(d)} before stored transactions start falling off " +
            s"the ~${lookbackDays.getOrElse(0)}-day window.")
      case Some(d) if d > 0 && d <= LossWarningDays =>
        return ("warning",
          s"$d day${plural(d)} before stored transactions approach " +
            s"the ~${lookbackDays.getOrElse(0)}-day window edge.")
      case _ =>
    }
    if (lookbackDays.isEmpty)
      return ("warning", "Could not infer lookback from the latest poll. Run ingest to refresh.")
    daysSinceLatestTxn match {
      case Some(d) if d > 30 =>
        return ("warning", s"Latest transaction is $d days old. Account may be inactive.")
      case _ =>
    }
    daysUntilLoss match {
      case Some(d) if d > LossWarningDays =>
        ("healthy", s"$d days until history loss (~${lookbackDays.get}-day inferred window).")
      case Some(d) if d <= 0 =>
        ("healthy", s"History already stored locally (${math.abs(d)} days past window edge, " +
          s"~${lookbackDays.get}-day inferred window).")
      case _ =>
        ("healthy", s"~${lookbackDays.get}-day window inferred from latest poll.")
    }
  }
}
