package graft

/** Minimal JSON string escaping shared by the Verify and Bench mains —
  * one implementation so an escaping fix can never land in only one of
  * the two driver-facing outputs. Escapes backslash, quote, and ALL
  * control chars (<0x20): a tab or CR in builder-authored SQL would
  * otherwise make the driver's json.load fail. */
object Json {
  def str(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** JSON object of string values — the one rendering for every map
    * Verify/Bench emit. */
  def obj(m: Iterable[(String, String)]): String =
    m.map { case (k, v) => s"${str(k)}:${str(v)}" }.mkString("{", ",", "}")

  /** First line of a throwable's message (or its class name), bounded —
    * the one error-summarizing rule for driver-facing outputs. */
  def errorSummary(e: Throwable, max: Int = 200): String =
    Option(e.getMessage).getOrElse(e.getClass.getName)
      .takeWhile(_ != '\n').take(max)
}
