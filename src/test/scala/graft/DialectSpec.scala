package graft

import graft.slt.Dialect
import org.scalatest.funsuite.AnyFunSuite

/** Unit spec for the token-level GlareDB→Spark dialect rewriter. */
class DialectSpec extends AnyFunSuite {

  private def rw(s: String): String = Dialect.rewrite(s)

  test("simple :: cast") {
    assert(rw("SELECT 1::BIGINT") == "SELECT CAST(1 AS BIGINT)")
  }

  test("chained casts are left-associative") {
    assert(rw("select '2.2'::REAL::TEXT") ==
      "select CAST(CAST('2.2' AS FLOAT) AS STRING)")
  }

  test("cast of function call and parenthesized expression") {
    assert(rw("SELECT abs(x)::INT, (a + b)::DOUBLE FROM t") ==
      "SELECT CAST(abs(x) AS INT), CAST((a + b) AS DOUBLE) FROM t")
  }

  test("cast of dotted column and parameterized type") {
    assert(rw("SELECT t.a::DECIMAL(10,2) FROM t") ==
      "SELECT CAST(t.a AS DECIMAL(10,2)) FROM t")
  }

  test("string literals are never rewritten") {
    assert(rw("SELECT 'TEXT', 'a::b', '[1,2]'") == "SELECT 'TEXT', 'a::b', '[1,2]'")
  }

  test("list literal becomes array()") {
    assert(rw("SELECT [1, 2, 3]") == "SELECT array(1, 2, 3)")
    assert(rw("SELECT [[1,2],[3,4]]") == "SELECT array(array(1,2),array(3,4))")
  }

  test("postfix brackets are 1-based indexing (element_at), not literals") {
    assert(rw("SELECT a[2] FROM t") == "SELECT element_at(a,2) FROM t")
    assert(rw("SELECT f(x)[1] FROM t") == "SELECT element_at(f(x),1) FROM t")
    // slices keep bracket syntax
    assert(rw("SELECT a[2:3] FROM t") == "SELECT a[2:3] FROM t")
  }

  test("cast of an indexed element") {
    assert(rw("SELECT a[2]::TEXT FROM t") ==
      "SELECT CAST(element_at(a,2) AS STRING) FROM t")
  }

  test("type names map in DDL column definitions but not column refs") {
    assert(rw("CREATE TEMP TABLE test (a TEXT, b TEXT)") ==
      "CREATE TEMP TABLE test (a STRING, b STRING)")
    assert(rw("SELECT text FROM documents") == "SELECT text FROM documents")
  }

  test("columnN renames to colN") {
    assert(rw("SELECT column1, column12 FROM (VALUES (1, 2))") ==
      "SELECT col1, col12 FROM (VALUES (1, 2))")
  }

  test("unsigned and half types widen") {
    assert(rw("SELECT 1::UTINYINT, 2::UINT, 3::UBIGINT, 4.5::HALF") ==
      "SELECT CAST(1 AS SMALLINT), CAST(2 AS BIGINT), " +
        "CAST(3 AS DECIMAL(20,0)), CAST(4.5 AS FLOAT)")
  }

  test("cast inside larger expression keeps surroundings") {
    assert(rw("SELECT 1 + x::INT * 2 FROM t WHERE y::BIGINT > 0") ==
      "SELECT 1 + CAST(x AS INT) * 2 FROM t WHERE CAST(y AS BIGINT) > 0")
  }

  test("comments are preserved untouched") {
    assert(rw("SELECT 1 -- a::b [1]\n") == "SELECT 1 -- a::b [1]\n")
  }
}
