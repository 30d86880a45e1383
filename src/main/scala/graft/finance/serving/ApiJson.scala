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

  /** Thrown on malformed request bodies; routes map it to 422 like
    * FastAPI's RequestValidationError on an unparseable body. */
  final class ParseError(msg: String) extends IllegalArgumentException(msg)

  /** Minimal recursive-descent JSON reader for request bodies → Scala
    * values: Map[String, Any] / List[Any] / String / Double / Boolean /
    * null. Request bodies here are tiny (a category assignment, an id
    * list), so clarity beats speed. */
  def parse(s: String): Any = {
    val p = new Parser(s)
    val v = p.value()
    p.skipWs()
    if (!p.atEnd) throw new ParseError(s"trailing content at ${p.pos}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def atEnd: Boolean = pos >= s.length
    def skipWs(): Unit =
      while (!atEnd && Character.isWhitespace(s.charAt(pos))) pos += 1
    private def fail(msg: String) = throw new ParseError(s"$msg at $pos")
    private def expect(c: Char): Unit = {
      if (atEnd || s.charAt(pos) != c) fail(s"expected '$c'")
      pos += 1
    }
    private def lit(word: String, v: Any): Any = {
      if (!s.startsWith(word, pos)) fail(s"expected $word")
      pos += word.length; v
    }

    def value(): Any = {
      skipWs()
      if (atEnd) fail("unexpected end")
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => string()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _ => number()
      }
    }

    private def obj(): Map[String, Any] = {
      expect('{'); skipWs()
      val b = Map.newBuilder[String, Any]
      if (!atEnd && s.charAt(pos) == '}') { pos += 1; return b.result() }
      var more = true
      while (more) {
        skipWs()
        val k = string()
        skipWs(); expect(':')
        b += k -> value()
        skipWs()
        if (!atEnd && s.charAt(pos) == ',') pos += 1
        else { expect('}'); more = false }
      }
      b.result()
    }

    private def arr(): List[Any] = {
      expect('['); skipWs()
      val b = List.newBuilder[Any]
      if (!atEnd && s.charAt(pos) == ']') { pos += 1; return b.result() }
      var more = true
      while (more) {
        b += value()
        skipWs()
        if (!atEnd && s.charAt(pos) == ',') pos += 1
        else { expect(']'); more = false }
      }
      b.result()
    }

    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (!atEnd && s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          if (atEnd) fail("bad escape")
          s.charAt(pos) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'u' =>
              if (pos + 4 >= s.length) fail("bad unicode escape")
              // non-hex digits must surface as a 422 ParseError like every
              // other malformed body, not a NumberFormatException→500
              val cp =
                try Integer.parseInt(s.substring(pos + 1, pos + 5), 16)
                catch { case _: NumberFormatException => fail("bad unicode escape") }
              sb.append(cp.toChar)
              pos += 4
            case other => fail(s"bad escape \\$other")
          }
        } else sb.append(c)
        pos += 1
      }
      expect('"')
      sb.toString
    }

    private def number(): Double = {
      val start = pos
      if (!atEnd && s.charAt(pos) == '-') pos += 1
      while (!atEnd && "0123456789.eE+-".indexOf(s.charAt(pos)) >= 0) pos += 1
      if (pos == start) fail("expected value")
      try s.substring(start, pos).toDouble
      catch { case _: NumberFormatException => fail("bad number") }
    }
  }
}
