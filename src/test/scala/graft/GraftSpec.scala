package graft

import org.scalatest.funsuite.AnyFunSuite

/** The public facade: catalog, table access, operator execution, SQL
  * over registered views, and explain — the surface a user drives
  * without knowing the package layout.
  */
class GraftSpec extends AnyFunSuite {

  lazy val g = Graft(TestSpark.session, "/root/testdata/sf0.001")

  test("catalog lists every registered operator and all fixture tables") {
    assert(g.ops.size == SparkEntry.queries.size)
    assert(g.ops.contains("q1_agg") && g.ops.contains("dedup_minhash"))
    assert(g.tableNames.forall(n => g.table(n).columns.nonEmpty))
  }

  test("run executes an operator at its gate point; unknown names fail loudly") {
    assert(g.run("q1_agg").count() > 0)
    intercept[IllegalArgumentException] { g.run("no_such_op") }
    intercept[IllegalArgumentException] { g.table("no_such_table") }
  }

  test("sql sees the fixture tables as views") {
    assert(g.sql("SELECT count(*) AS n FROM documents").head().getLong(0) > 0)
    assert(g.sql(
      "SELECT dot_i64(array(1L, 2L), array(3L, 4L)) AS d").head().getLong(0) == 11L)
  }

  test("explain returns the formatted physical plan") {
    val plan = g.explain("q2_selective_agg")
    assert(plan.contains("PushedFilters") || plan.contains("Scan parquet"),
      s"expected a formatted plan, got:\n${plan.take(500)}")
  }
}
