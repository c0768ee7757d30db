package graft.sources.cdc

/** Parser for the reconstructed DML statements Oracle LogMiner emits
  * in `V$LOGMNR_CONTENTS.SQL_REDO` — the public, documented shape
  * (Database Utilities, "Using LogMiner to Analyze Redo Log Files"):
  *
  * {{{
  * insert into "OWNER"."T"("ID","EMAIL") values ('1005','jon@x.com');
  * update "OWNER"."T" set "EMAIL" = 'new' where "ID" = '1002' and
  *   "EMAIL" = 'old' and ROWID = 'AAAV/NAAEAAAACnAAB';
  * delete from "OWNER"."T" where "ID" = '1003' and "EMAIL" IS NULL;
  * }}}
  *
  * With supplemental logging of ALL columns (what a CDC deployment
  * enables), the update/delete WHERE clause carries the complete
  * BEFORE image — so parsing redo SQL recovers exactly the envelope
  * surface a change table provides: before images and hard deletes.
  *
  * Value forms handled: `'string'` (with `''` escapes), unquoted
  * numbers (→ BigDecimal), `NULL` / `IS NULL` (→ null), the datetime/
  * raw wrapper functions LogMiner emits (`TO_DATE('…','…')`,
  * `TO_TIMESTAMP('…')`, `UNISTR('…')`, `HEXTORAW('…')` → their first
  * string argument; `EMPTY_CLOB()`/`EMPTY_BLOB()` → empty string),
  * and the trailing unquoted `ROWID = '…'` predicate (skipped —
  * physical address, not a column). Unknown shapes fail loudly:
  * silently dropping a column would corrupt envelopes downstream.
  */
object OracleRedoParser {

  /** op ∈ c/u/d; `set` = SET/VALUES assignments, `where` = predicate
    * image. Column names keep their stored (quoted) case. */
  final case class Dml(op: String, owner: String, table: String,
                       set: Map[String, Any], where: Map[String, Any])

  def parse(sqlRaw: String): Dml = new P(sqlRaw.trim.stripSuffix(";")).statement()

  private final class P(s: String) {
    private var i = 0
    private def err(what: String): Nothing = throw new IllegalArgumentException(
      s"logminer redo parse: expected $what at offset $i in: $s")

    private def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    private def peekWord(): String = {
      ws(); val j = i
      var k = j; while (k < s.length && (s(k).isLetterOrDigit || s(k) == '_' || s(k) == '$')) k += 1
      s.substring(j, k)
    }
    private def word(): String = { val w = peekWord(); i += w.length; w }
    private def keyword(kw: String): Unit =
      if (!word().equalsIgnoreCase(kw)) err(s"keyword '$kw'")
    private def ch(c: Char): Unit = { ws(); if (i < s.length && s(i) == c) i += 1 else err(s"'$c'") }
    private def tryCh(c: Char): Boolean = { ws(); if (i < s.length && s(i) == c) { i += 1; true } else false }

    /** `"IDENT"` with `""` escapes. */
    private def quotedIdent(): String = {
      ch('"')
      val b = new StringBuilder
      while (i < s.length) {
        if (s(i) == '"') {
          if (i + 1 < s.length && s(i + 1) == '"') { b += '"'; i += 2 }
          else { i += 1; return b.toString }
        } else { b += s(i); i += 1 }
      }
      err("closing '\"'")
    }

    /** `'text'` with `''` escapes. */
    private def stringLit(): String = {
      ch('\'')
      val b = new StringBuilder
      while (i < s.length) {
        if (s(i) == '\'') {
          if (i + 1 < s.length && s(i + 1) == '\'') { b += '\''; i += 2 }
          else { i += 1; return b.toString }
        } else { b += s(i); i += 1 }
      }
      err("closing \"'\"")
    }

    private def value(): Any = {
      ws()
      if (i >= s.length) err("a value")
      s(i) match {
        case '\'' => stringLit()
        case c if c == '-' || c == '+' || c.isDigit =>
          val j = i
          if (c == '-' || c == '+') i += 1
          while (i < s.length && (s(i).isDigit || s(i) == '.')) i += 1
          if (i < s.length && (s(i) == 'e' || s(i) == 'E')) {
            i += 1; if (i < s.length && (s(i) == '-' || s(i) == '+')) i += 1
            while (i < s.length && s(i).isDigit) i += 1
          }
          new java.math.BigDecimal(s.substring(j, i))
        case _ =>
          val w = word()
          if (w.equalsIgnoreCase("NULL")) null
          else if (tryCh('(')) { // wrapper function
            val v = functionValue(w)
            ch(')'); v
          } else err(s"a literal (got '$w')")
      }
    }

    /** The wrapper functions LogMiner emits around non-text types:
      * keep the first string argument (the rendered value), consume
      * the rest. */
    private def functionValue(name: String): Any = {
      ws()
      if (s(i) == ')') { // zero-arg: EMPTY_CLOB() / EMPTY_BLOB()
        if (name.equalsIgnoreCase("EMPTY_CLOB") || name.equalsIgnoreCase("EMPTY_BLOB")) return ""
        err(s"arguments for $name")
      }
      val known = Set("TO_DATE", "TO_TIMESTAMP", "TO_TIMESTAMP_TZ", "UNISTR",
        "HEXTORAW", "TO_YMINTERVAL", "TO_DSINTERVAL", "CHARTOROWID")
      if (!known.exists(_.equalsIgnoreCase(name))) err(s"a known wrapper function (got $name)")
      val first = stringLit()
      while (tryCh(',')) { ws(); stringLit(); () } // format args
      first
    }

    /** `"OWNER"."TABLE"` */
    private def qualifiedTable(): (String, String) = {
      ws(); val owner = quotedIdent(); ch('.'); val table = quotedIdent()
      (owner, table)
    }

    /** `"C" = v | "C" IS NULL [and …]`; unquoted `ROWID = '…'` skipped. */
    private def predicates(): Map[String, Any] = {
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Any]
      var more = true
      while (more) {
        ws()
        if (i < s.length && s(i) == '"') {
          val col = quotedIdent()
          val w = peekWord()
          if (w.equalsIgnoreCase("IS")) { keyword("IS"); keyword("NULL"); m(col) = null }
          else { ch('='); m(col) = value() }
        } else {
          val id = word() // unquoted identifier: ROWID
          if (!id.equalsIgnoreCase("ROWID")) err(s"a quoted column or ROWID (got '$id')")
          ch('='); stringLit(); () // physical address — not a column
        }
        ws()
        more = peekWord().equalsIgnoreCase("and") && { keyword("and"); true }
      }
      m.toMap
    }

    def statement(): Dml = {
      val kw = word().toLowerCase
      kw match {
        case "insert" =>
          keyword("into")
          val (owner, table) = qualifiedTable()
          ch('(')
          val cols = scala.collection.mutable.ArrayBuffer(quotedIdent())
          while (tryCh(',')) cols += quotedIdent()
          ch(')')
          keyword("values"); ch('(')
          val vals = scala.collection.mutable.ArrayBuffer(value())
          while (tryCh(',')) vals += value()
          ch(')')
          require(cols.size == vals.size, s"logminer redo parse: ${cols.size} columns " +
            s"but ${vals.size} values in: $s")
          Dml("c", owner, table, cols.zip(vals).toMap, Map.empty)
        case "update" =>
          val (owner, table) = qualifiedTable()
          keyword("set")
          val set = scala.collection.mutable.LinkedHashMap.empty[String, Any]
          var more = true
          while (more) {
            val col = quotedIdent(); ch('='); set(col) = value()
            more = tryCh(',')
          }
          keyword("where")
          Dml("u", owner, table, set.toMap, predicates())
        case "delete" =>
          keyword("from")
          val (owner, table) = qualifiedTable()
          keyword("where")
          Dml("d", owner, table, Map.empty, predicates())
        case other => err(s"insert/update/delete (got '$other')")
      }
    }
  }
}
