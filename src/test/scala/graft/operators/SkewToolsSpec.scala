package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SkewToolsSpec extends SparkSuite {

  private lazy val li = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
    .select("l_orderkey", "l_partkey", "l_quantity")
  private lazy val part = spark.read.parquet(sf("sf0.001") + "/part.parquet")
    .select(col("p_partkey").as("l_partkey"), col("p_retailprice"))

  test("salted join equals plain join (inner)") {
    val plain = li.join(part, Seq("l_partkey"))
      .select("l_orderkey", "l_partkey", "l_quantity", "p_retailprice")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val salted = SkewTools.saltedJoin(li, part, "l_partkey", factor = 7)
      .select("l_orderkey", "l_partkey", "l_quantity", "p_retailprice")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(salted == plain)
  }

  test("salted join equals plain join (left_outer, unmatched keys preserved)") {
    val liPlus = li.limit(50).unionByName(
      spark.range(1).select(lit(-1L).as("l_orderkey"),
        lit(999999L).as("l_partkey"), lit(1.0).as("l_quantity")))
    val plainDf = liPlus.join(part, Seq("l_partkey"), "left_outer")
    val plain = plainDf.collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val salted = SkewTools.saltedJoin(liPlus, part, "l_partkey", 5, "left_outer")
      .select(plainDf.columns.map(col): _*)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(salted == plain)
  }

  test("salt spreads a hot key over multiple shuffle partitions") {
    import spark.implicits._
    val hot = Seq.fill(1000)(42L).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
    val salted = hot.withColumn("__graft_salt",
      pmod(hash(hot.columns.map(col): _*), lit(8)))
    val distinctSalts = salted.select("__graft_salt").distinct().count()
    assert(distinctSalts >= 6) // 1000 hashed rows land in nearly all 8 salt cells
  }
}
