package graft.sources.cdc

/** Envelope-line JSON rendering shared by the JDBC-side capture
  * tailers ([[JdbcPollingTailer]], [[SqlServerCdcTailer]]): a
  * column→value map renders to one JSON object with keys sorted (the
  * layout's canonical field order) and JDBC values mapped to the same
  * literals the protocol decoders emit — numbers bare, BigDecimal in
  * plain form (no exponent), booleans as JSON booleans, everything
  * else an escaped string. */
private[cdc] object CdcJson {

  def obj(m: Map[String, Any]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":${value(v)}""" }
      .mkString("{", ",", "}")

  def value(v: Any): String = v match {
    case null                      => "null"
    case b: java.lang.Boolean      => b.toString
    case d: java.math.BigDecimal   => d.toPlainString
    case n: Number                 => n.toString
    case other                     => "\"" + other.toString.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
  }
}
