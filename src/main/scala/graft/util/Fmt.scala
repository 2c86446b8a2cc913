package graft.util

/** Shared text-surface helpers for every place the engine emits a line
  * some parser on the other side must read back — the driver's bench/
  * oracle JSON, Slack/PagerDuty payloads. One copy: an escaping or locale
  * fix applied here reaches all emitters at once.
  */
object Fmt {

  /** JSON string escaping, INCLUDING the C0 control range: exception text
    * routinely carries ANSI escapes (0x1b) from captured log lines, and a
    * raw control byte inside a string literal makes the whole payload
    * invalid JSON — losing the page (or the round's correctness record)
    * exactly when it matters most. */
  def jsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '"' => sb.append("\\\"")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** A quoted JSON string literal of `s`. */
  def jsonString(s: String): String = "\"" + jsonEscape(s) + "\""

  /** Locale-stable decimal formatting: a German-locale JVM would render
    * f"%.2f" as "12,34", corrupting JSON number output and any downstream
    * parser expecting dot decimals. */
  def fmt(pattern: String, v: Double): String =
    String.format(java.util.Locale.ROOT, pattern, Double.box(v))
}
