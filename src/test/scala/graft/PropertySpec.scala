package graft

import java.nio.file.Files

import graft.table.StreamTable
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY.md §5.3): upsert view ≡ fold of puts, dedup
  * idempotence. ScalaCheck generators are sampled with fixed seeds (the
  * scalatest-scalacheck bridge isn't in the offline cache). */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val opsGen: Gen[List[(Long, Long, String)]] = {
    val op = for {
      key <- Gen.choose(0L, 5L)
      seq <- Gen.choose(0L, 1000L)
      v   <- Gen.alphaStr.map(_.take(6))
    } yield (key, seq, v)
    Gen.listOfN(20, op)
  }

  test("PK table read view ≡ in-memory fold of puts (last-writer-wins)") {
    for (seed <- 1L to 4L) {
      val ops = opsGen.apply(Gen.Parameters.default, Seed(seed)).get
      val t = new StreamTable(Files.createTempDirectory("graft_prop_").toString,
        spark, primaryKey = Some(Seq("id")), seqCol = Some("seq"))
      // each op becomes its own micro-batch, in order
      ops.zipWithIndex.foreach { case ((k, sq, v), i) =>
        t.appendBatch(Seq((k, sq, v)).toDF("id", "seq", "v"), i.toLong)
      }
      // reference model (Paimon sequence.field): the LARGEST sequence value
      // wins regardless of batch order; batch id breaks sequence ties
      val expect = ops.zipWithIndex
        .groupBy(_._1._1)
        .map { case (k, group) => k -> group.maxBy { case ((_, sq, _), i) => (sq, i) }._1._3 }
      val got = t.read.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(got == expect, s"seed=$seed ops=$ops")
    }
  }

  test("exact dedup output has unique doc_ids (projection property)") {
    val d1 = SparkEntry.queries("q_ext_exact_dedup")(spark, SparkFixture.sf)
    val ids1 = d1.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1.size.toLong == d1.count())
  }
}
