package graft.finance.serving

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, Row}

/** Minimal JSON writer for serving responses — only what the façade's
  * response shapes need (objects, arrays, strings, numbers, booleans,
  * null, SQL date/timestamp as ISO strings). Hand-rolled because the
  * build is dependency-frozen; the value space is closed (Spark SQL
  * external types), so a full JSON library buys nothing here.
  */
object ApiJson {

  def str(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb.append('"')
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
    sb.toString
  }

  /** One Spark external value → JSON. Timestamps render in the JVM-default
    * zone like the reference's pydantic datetime — callers pin UTC in jobs. */
  def value(v: Any): String = v match {
    case null => "null"
    case s: String => str(s)
    case b: Boolean => b.toString
    case d: Date => str(d.toString)
    case t: Timestamp => str(t.toLocalDateTime.toString)
    case d: java.math.BigDecimal => d.toPlainString
    case d: BigDecimal => d.bigDecimal.toPlainString
    case d: Double => if (d.isNaN || d.isInfinite) "null" else d.toString
    case f: Float => if (f.isNaN || f.isInfinite) "null" else f.toString
    case n: Number => n.toString
    case seq: scala.collection.Seq[_] => seq.map(value).mkString("[", ",", "]")
    case other => str(other.toString)
  }

  def obj(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => s"${str(k)}:$v" }.mkString("{", ",", "}")

  def row(r: Row): String =
    obj(r.schema.fieldNames.toSeq.zipWithIndex.map { case (name, i) =>
      name -> value(r.get(i))
    })

  /** Collect a (pre-paginated, bounded) frame and render it as a JSON
    * array of objects keyed by column name. The caller guarantees the
    * frame is a page (LIMIT-capped) — this is the serving boundary, the
    * one place a collect is the point.
    */
  def rows(df: DataFrame): String =
    df.collect().iterator.map(row).mkString("[", ",", "]")

  def strings(xs: Seq[String]): String = xs.map(str).mkString("[", ",", "]")
}
