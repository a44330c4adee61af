package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.dedup.Shingles

/** KMV bottom-k distinct sketch: accuracy, exactness below k, merge
  * invariance under repartitioning, intersection estimator, SQL surface.
  */
class KmvSketchSpec extends AnyFunSuite with SparkSpec {

  private def hashed(n: Int, salt: String) = {
    import spark.implicits._
    (0 until n).map(i => s"$salt-$i").toDF("s")
      .select(Shingles.baseHash(col("s")).as("h"))
  }

  test("exact below k, within 15% above k") {
    val small = hashed(100, "a")
      .agg(Kmv.estimate(Kmv.sketchAgg(col("h"), 256)).as("e"))
      .head().getDouble(0)
    assert(small === 100.0) // n < k: the sketch IS the distinct set
    val big = hashed(20000, "b")
      .agg(Kmv.estimate(Kmv.sketchAgg(col("h"), 256)).as("e"))
      .head().getDouble(0)
    assert(math.abs(big - 20000) / 20000.0 < 0.15, s"estimate $big")
  }

  test("sketch is invariant to partitioning (associative merge)") {
    val df = hashed(5000, "c")
    val one = df.coalesce(1)
      .agg(Kmv.sketchAgg(col("h"), 128)).head().getAs[Array[Byte]](0)
    val many = df.repartition(13)
      .agg(Kmv.sketchAgg(col("h"), 128)).head().getAs[Array[Byte]](0)
    assert(one.toSeq === many.toSeq)
  }

  test("intersection estimate tracks true overlap") {
    import spark.implicits._
    // A = [0, 8000), B = [4000, 12000): true intersection 4000
    val a = (0 until 8000).map(i => s"x-$i")
    val b = (4000 until 12000).map(i => s"x-$i")
    val skA = a.toDF("s").select(Shingles.baseHash(col("s")).as("h"))
      .agg(Kmv.sketchAgg(col("h"), 256).as("sk"))
    val skB = b.toDF("s").select(Shingles.baseHash(col("s")).as("h"))
      .agg(Kmv.sketchAgg(col("h"), 256).as("sk"))
    val est = skA.crossJoin(skB.withColumnRenamed("sk", "sk2"))
      .select(Kmv.intersect(col("sk"), col("sk2"))).head().getDouble(0)
    assert(math.abs(est - 4000) / 4000.0 < 0.30, s"intersect estimate $est")
  }

  test("union sketch equals sketch of the union") {
    import spark.implicits._
    val mk = (xs: Seq[String]) => xs.toDF("s")
      .select(Shingles.baseHash(col("s")).as("h"))
    val a = (0 until 3000).map(i => s"u-$i")
    val b = (1500 until 4500).map(i => s"u-$i")
    val skA = mk(a).agg(Kmv.sketchAgg(col("h"), 64).as("sk")).head().getAs[Array[Byte]](0)
    val skB = mk(b).agg(Kmv.sketchAgg(col("h"), 64).as("sk")).head().getAs[Array[Byte]](0)
    val skU = mk((a ++ b).distinct).agg(Kmv.sketchAgg(col("h"), 64).as("sk"))
      .head().getAs[Array[Byte]](0)
    val unioned = spark.range(1).select(
      Kmv.union(lit(skA), lit(skB))).head().getAs[Array[Byte]](0)
    assert(unioned.toSeq === skU.toSeq)
  }

  test("SQL surface: graft_kmv_agg / estimate / intersect / union") {
    hashed(10000, "q").createOrReplaceTempView("kmv_in")
    val row = spark.sql(
      """SELECT graft_kmv_estimate(graft_kmv_agg(h, 256)) AS est,
        |       graft_kmv_estimate(graft_kmv_union(graft_kmv_agg(h, 256),
        |                                          graft_kmv_agg(h, 256))) AS est_u,
        |       graft_kmv_intersect(graft_kmv_agg(h, 256),
        |                           graft_kmv_agg(h, 256)) AS self_int
        |FROM kmv_in""".stripMargin).head()
    assert(math.abs(row.getDouble(0) - 10000) / 10000.0 < 0.15)
    assert(row.getDouble(1) === row.getDouble(0)) // union with self is identity
    // self-intersection estimates the full set
    assert(math.abs(row.getDouble(2) - 10000) / 10000.0 < 0.15)
  }
}
