package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** UDF / UDAF / UDTF surface (SURVEY.md §2B "UDF / UDAF / UDTF").
  *
  * The haversine UDF mirrors the sensor-geo theme of the reference's
  * `sensor_info` table (latitude/longitude columns, Readme.md:134-135).
  * The typed Aggregator is the public-API custom-aggregate path (Welford
  * online variance with a proper merge, so it's shuffle/partial-agg safe).
  */
object Udfs {

  /** Welford online variance: numerically stable, associative merge — the
    * property a distributed partial aggregate needs. */
  case class VarBuf(n: Long, mean: Double, m2: Double)

  object SampleVariance extends Aggregator[Double, VarBuf, Double] {
    def zero: VarBuf = VarBuf(0L, 0.0, 0.0)
    def reduce(b: VarBuf, x: Double): VarBuf = {
      val n = b.n + 1
      val delta = x - b.mean
      val mean = b.mean + delta / n
      VarBuf(n, mean, b.m2 + delta * (x - mean))
    }
    def merge(a: VarBuf, b: VarBuf): VarBuf = {
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val delta = b.mean - a.mean
        VarBuf(n, a.mean + delta * b.n / n,
          a.m2 + b.m2 + delta * delta * a.n * b.n / n)
      }
    }
    def finish(r: VarBuf): Double = if (r.n < 2) Double.NaN else r.m2 / (r.n - 1)
    def bufferEncoder: Encoder[VarBuf] = Encoders.product[VarBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  private val haversineUdf = udf { (lat1: Double, lon1: Double, lat2: Double, lon2: Double) =>
    val rLat1 = math.toRadians(lat1)
    val rLat2 = math.toRadians(lat2)
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.sin(dLat / 2) * math.sin(dLat / 2) +
      math.cos(rLat1) * math.cos(rLat2) * math.sin(dLon / 2) * math.sin(dLon / 2)
    2.0 * 6371.0 * math.asin(math.sqrt(a))
  }

  val all: Seq[QDef] = Seq(
    // Great-circle distance from a synthesized (lat,lon) per customer to the
    // origin. Rounded to 3 decimals: both engines evaluate the same IEEE
    // formula; only libm last-ulp drift remains, far below 1e-3.
    QDef(
      "q_udf_haversine",
      """SELECT c_custkey, lat, lon,
        |  round(2.0 * 6371.0 * asin(sqrt(
        |    sin(radians(0.0 - lat)/2) * sin(radians(0.0 - lat)/2) +
        |    cos(radians(lat)) * cos(radians(0.0)) *
        |    sin(radians(0.0 - lon)/2) * sin(radians(0.0 - lon)/2))), 3) AS dist_km
        |FROM (SELECT c_custkey,
        |        CAST(c_custkey % 180 - 90 AS DOUBLE) AS lat,
        |        CAST(c_custkey % 360 - 180 AS DOUBLE) AS lon
        |      FROM customer) t
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"),
          (col("c_custkey") % 180 - 90).cast("double").as("lat"),
          (col("c_custkey") % 360 - 180).cast("double").as("lon"))
        .withColumn("dist_km",
          round(haversineUdf(col("lat"), col("lon"), lit(0.0), lit(0.0)), 3))
        .orderBy("c_custkey")
    },

    QDef(
      "q_udaf_typed",
      """SELECT l_returnflag,
        |  round(var_samp(l_quantity), 6) AS var_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val varUdaf = udaf(SampleVariance)
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(varUdaf(col("l_quantity")), 6).as("var_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // Generator/UDTF: explode each document into word bigrams with position.
    QDef(
      "q_udtf_explode_ngrams",
      """SELECT doc_id, CAST(gs AS INTEGER) AS pos,
        |  ws[gs] || ' ' || ws[gs + 1] AS bigram
        |FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS gs
        |      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |      WHERE len(ws) >= 2) t
        |ORDER BY doc_id, pos""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(col("doc_id"),
          explode(expr(
            """transform(sequence(1, size(ws) - 1),
              |  i -> struct(i AS pos,
              |              concat(element_at(ws, i), ' ', element_at(ws, i + 1)) AS bigram))"""
              .stripMargin)).as("x"))
        .select(col("doc_id"), col("x.pos").as("pos"), col("x.bigram").as("bigram"))
        .orderBy("doc_id", "pos")
    },

    // Ordinality-preserving generator (posexplode / UNNEST WITH ORDINALITY):
    // the generator variant that keeps ELEMENT POSITION, which plain explode
    // destroys — what token-position features and chunk offsets need.
    // Generators run inside the scan stage (Generate node, no shuffle);
    // output order inside a row is the array order, so the (key, ord) sort
    // is total and deterministic. Spark's pos is 0-based, DuckDB's
    // generate_subscripts 1-based — normalized to 1-based in both.
    QDef(
      "q_udtf_posexplode",
      """SELECT p_partkey, CAST(generate_subscripts(ws, 1) AS INTEGER) AS ord,
        |  unnest(ws) AS word
        |FROM (SELECT p_partkey, string_split(p_name, ' ') AS ws FROM part) t
        |ORDER BY p_partkey, ord""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"), posexplode(split(col("p_name"), " ")))
        .select(col("p_partkey"), (col("pos") + 1).cast("int").as("ord"),
          col("col").as("word"))
        .orderBy("p_partkey", "ord")
    },
  )
}
