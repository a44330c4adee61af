package graft

import org.scalatest.funsuite.AnyFunSuite

/** Execution smoke for EVERY registered query against the real driver
  * testdata at sf0.001 — one dynamically-registered, named test per
  * `SparkEntry.queries` entry.
  *
  * Round-6 lesson: the registry gate checked only names/collisions, so a
  * testdata physical-type drift broke 8 driver queries while just 4
  * incidental specs went red. This suite is the missing contract: any
  * environment or analysis drift now fails here with the query's name,
  * in seconds, for all 79 — the same end-to-end stance as the
  * reference's notebook, which runs every operator (TEST:108-302).
  *
  * A full `count()` (not `limit(1).count()` — a limit can short-circuit
  * upstream stages in some plans) so EVERY exchange in every registered
  * query executes; value-level correctness stays with the DuckDB oracle
  * gate.
  */
class RegistrySmokeSpec extends AnyFunSuite with SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"smoke: $name analyzes and executes at sf0.001") {
      val df = fn(spark, dir)
      df.queryExecution.analyzed // named analysis failure before execution
      val n = df.count()
      assert(n >= 0L) // execution completed; emptiness is the oracle's call
    }
  }

  test("smoke: flagship entry() returns rows") {
    assert(SparkEntry.entry(spark).limit(1).count() === 1L)
  }
}
