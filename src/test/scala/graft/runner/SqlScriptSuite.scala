package graft.runner

import graft.SparkTestBase

class SqlScriptSuite extends SparkTestBase {

  test("split: quote/comment-aware statement boundaries") {
    val script =
      """-- leading comment with a ; semicolon
        |CREATE OR REPLACE TEMPORARY VIEW v AS SELECT 'a;b' AS s; -- trailing ; comment
        |SELECT s, "quoted;ident" FROM v WHERE s <> 'it''s; fine';
        |DROP VIEW v;""".stripMargin
    val stmts = SqlScript.split(script)
    assert(stmts.length === 3)
    assert(stmts(0).startsWith("CREATE OR REPLACE TEMPORARY VIEW v"))
    assert(stmts(0).contains("'a;b'"), "semicolon inside single quotes must not split")
    assert(stmts(1).contains("\"quoted;ident\""), "semicolon inside double quotes must not split")
    assert(stmts(1).contains("'it''s; fine'"), "doubled-quote escape must not end the string")
    assert(!stmts(0).contains("trailing"), "comments are stripped")
    assert(stmts(2) === "DROP VIEW v")
  }

  test("split: no trailing semicolon, empty statements dropped") {
    assert(SqlScript.split("SELECT 1;;\n;SELECT 2") === Seq("SELECT 1", "SELECT 2"))
  }

  test("mainStatementIndex: last SELECT wins; fallback to last statement") {
    assert(SqlScript.mainStatementIndex(Seq("CREATE VIEW x AS SELECT 1", "SELECT 2", "DROP VIEW x")) === 1)
    assert(SqlScript.mainStatementIndex(Seq("create view y as select 1", "select 1", "select 2", "drop view y")) === 2)
    assert(SqlScript.mainStatementIndex(Seq("CREATE TABLE t(i INT)", "DROP TABLE t")) === 1)
  }

  test("run: CREATE VIEW; SELECT; DROP VIEW executes DDL and returns the measured query") {
    val df = SqlScript.run(spark,
      """CREATE OR REPLACE TEMPORARY VIEW sqlscript_v AS
        |SELECT id, id * 2 AS dbl FROM range(5);
        |SELECT sum(dbl) AS s FROM sqlscript_v;
        |DROP VIEW sqlscript_v;""".stripMargin)
    // the view is already dropped (teardown ran eagerly), but the main
    // statement's analyzed plan still evaluates
    assert(!spark.catalog.tableExists("sqlscript_v"))
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(20L))
  }
}
