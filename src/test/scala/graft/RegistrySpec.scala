package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query runs and the driver contract holds. */
class RegistrySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("registry names are unique and oracle keys ⊆ query keys") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry (flagship lookup join) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (q <- SparkEntry.registry) {
    test(s"${q.name} runs at sf0.001 and is non-degenerate") {
      val df = q.fn(spark, SparkFixture.sf)
      val n = df.count()
      // every declared operator must produce output on the smallest fixture
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }
}
