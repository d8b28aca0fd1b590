package graft.core

/** JSON string escaping shared by every one-line-JSON surface (the
  * bench mains, the admin console) — ONE copy of the escape rules, so
  * a rendering fix lands once. Control characters flatten to a space:
  * these lines are grepped out of sbt logs, where embedded newlines
  * would break the one-line contract. */
object Jsons {
  def str(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    } + "\""
}
