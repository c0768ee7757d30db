package graft.sources.cdc

import org.scalatest.funsuite.AnyFunSuite

/** Byte-fixture coverage for the LogMiner `SQL_REDO` parser — the
  * documented reconstructed-DML shape: quoted identifiers with `""`
  * escapes, string literals with `''` escapes, `IS NULL` predicates,
  * the wrapper functions LogMiner emits around non-text types, the
  * trailing unquoted ROWID predicate, and loud failure on anything
  * outside the documented grammar. */
class OracleRedoParserSpec extends AnyFunSuite {
  import OracleRedoParser.{parse, Dml}

  test("insert: columns zip values, numbers become BigDecimal, strings stay strings") {
    val d = parse("""insert into "INV"."CUSTOMERS"("ID","FIRST_NAME","EMAIL") """ +
      """values (1005,'Jon','jon@got.com');""")
    assert(d == Dml("c", "INV", "CUSTOMERS",
      Map("ID" -> new java.math.BigDecimal(1005), "FIRST_NAME" -> "Jon",
          "EMAIL" -> "jon@got.com"), Map.empty))
  }

  test("update: SET assignments + complete WHERE before image; ROWID skipped") {
    val d = parse("""update "INV"."CUSTOMERS" set "EMAIL" = 'new@x.com' where """ +
      """"ID" = 1002 and "FIRST_NAME" = 'George' and "EMAIL" = 'old@x.com' and """ +
      """ROWID = 'AAAV/NAAEAAAACnAAB';""")
    assert(d.op == "u")
    assert(d.set == Map("EMAIL" -> "new@x.com"))
    assert(d.where == Map("ID" -> new java.math.BigDecimal(1002),
      "FIRST_NAME" -> "George", "EMAIL" -> "old@x.com"))
    assert(!d.where.contains("ROWID"), "ROWID is a physical address, not a column")
  }

  test("delete: WHERE image with IS NULL → null value") {
    val d = parse("""delete from "INV"."CUSTOMERS" where "ID" = 1003 and "EMAIL" IS NULL;""")
    assert(d.op == "d")
    assert(d.where == Map("ID" -> new java.math.BigDecimal(1003), "EMAIL" -> null))
  }

  test("'' escapes in string literals and \"\" escapes in identifiers") {
    val d = parse("""insert into "O"."T"("NA""ME","NOTE") values ('O''Brien','a''b''c');""")
    assert(d.set == Map("NA\"ME" -> "O'Brien", "NOTE" -> "a'b'c"))
  }

  test("wrapper functions: TO_DATE/TO_TIMESTAMP/UNISTR/HEXTORAW keep the rendered value; EMPTY_CLOB/BLOB → empty string") {
    val d = parse("""insert into "O"."T"("D","TS","U","RAW","C","B") values (""" +
      """TO_DATE('2026-08-13 10:00:00', 'YYYY-MM-DD HH24:MI:SS'),""" +
      """TO_TIMESTAMP('2026-08-13 10:00:00.123456'),""" +
      """UNISTR('\00e9t\00e9'),HEXTORAW('DEADBEEF'),EMPTY_CLOB(),EMPTY_BLOB());""")
    assert(d.set("D") == "2026-08-13 10:00:00")
    assert(d.set("TS") == "2026-08-13 10:00:00.123456")
    assert(d.set("U") == "\\00e9t\\00e9")
    assert(d.set("RAW") == "DEADBEEF")
    assert(d.set("C") == "")
    assert(d.set("B") == "")
  }

  test("numbers: negative, decimal, scientific notation") {
    val d = parse("""insert into "O"."T"("A","B","C") values (-17,3.14,1.5E-3);""")
    assert(d.set("A") == new java.math.BigDecimal("-17"))
    assert(d.set("B") == new java.math.BigDecimal("3.14"))
    assert(d.set("C") == new java.math.BigDecimal("1.5E-3"))
  }

  test("NULL value in VALUES and SET") {
    val i = parse("""insert into "O"."T"("A","B") values (1,NULL);""")
    assert(i.set == Map("A" -> new java.math.BigDecimal(1), "B" -> null))
    val u = parse("""update "O"."T" set "B" = NULL where "A" = 1;""")
    assert(u.set == Map("B" -> null))
  }

  test("malformed input fails loudly, never silently drops columns") {
    val bad = Seq(
      "truncate table \"O\".\"T\";",                          // unsupported op
      """insert into "O"."T"("A","B") values (1);""",          // arity mismatch
      """insert into "O"."T"("A") values (SYSDATE);""",        // unknown function
      """update "O"."T" set "A" = 1 where rowid_like = 'x';""",// unquoted non-ROWID
      """insert into "O"."T"("A") values ('unterminated);""",  // unclosed literal
      """delete from "O"."T" where "A" ~ 1;""")                // bad operator
    bad.foreach { s =>
      assertThrows[IllegalArgumentException](parse(s))
    }
  }

  test("multi-assignment update keeps insertion order and all pairs") {
    val d = parse("""update "O"."T" set "A" = 1, "B" = 'two', "C" = NULL where "K" = 9;""")
    assert(d.set == Map("A" -> new java.math.BigDecimal(1), "B" -> "two", "C" -> null))
    assert(d.where == Map("K" -> new java.math.BigDecimal(9)))
  }

  test("owner/table/column case is preserved exactly as stored") {
    val d = parse("""update "s"."MixedCase" set "camelCol" = 1 where "ID" = 2;""")
    assert(d.owner == "s" && d.table == "MixedCase")
    assert(d.set.keySet == Set("camelCol"))
  }
}
