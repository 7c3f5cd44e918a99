package graft.tools

import org.apache.spark.sql.SparkSession

/** End-to-end smoke for the `spark.sql.extensions` deployment path: a
  * FRESH JVM (real spark-submit, not the test session) must get every
  * graft SQL function through [[graft.GraftSparkExtensions]] alone — no
  * in-process `GraftFunctions.register` call anywhere on this path.
  *
  * Run (from the repo root, after `sbt package`):
  * {{{
  * /opt/spark/bin/spark-submit --master 'local[2]' \
  *   --conf spark.sql.extensions=graft.GraftSparkExtensions \
  *   --conf spark.ui.enabled=false \
  *   --class graft.tools.ExtensionsSmoke target/scala-2.13/topnspark_2.13-*.jar
  * }}}
  * Prints EXTENSIONS-SMOKE-PASS and exits 0 on success.
  */
object ExtensionsSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().getOrCreate()
    require(
      spark.conf.getOption("spark.sql.extensions").exists(_.contains("GraftSparkExtensions")),
      "run via spark-submit --conf spark.sql.extensions=graft.GraftSparkExtensions")
    spark.sparkContext.setLogLevel("WARN")

    def check(s: SparkSession, label: String): Unit = {
      val r = s.sql(
        """SELECT
          |  text_fingerprint('abc') AS fp,
          |  simhash64('a b c') AS sh,
          |  vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot,
          |  size(word_shingle_hashes('a b c d', 3)) AS nsh,
          |  size(minhash_signature('a b c d', 3, 16, 42)) AS sigk,
          |  byte_stride(encode('abcdef', 'UTF-8'), 2) AS bs,
          |  token_count('a b a c a', 'a') AS tc,
          |  interleave_bits(3, 1) AS zv
          |""".stripMargin).collect()(0)
      // fingerprint('abc') = ((0*31+97)*31+98)*31+99 mod 1e9+7
      assert(r.getAs[Long]("fp") == 96354L, s"fp = ${r.getAs[Long]("fp")}")
      assert(r.getAs[Double]("dot") == 11.0, s"dot = ${r.getAs[Double]("dot")}")
      assert(r.getAs[Int]("nsh") == 2)
      assert(r.getAs[Int]("sigk") == 16)
      assert(new String(r.getAs[Array[Byte]]("bs"), "UTF-8") == "ace")
      assert(r.getAs[Long]("tc") == 3L, s"tc = ${r.getAs[Long]("tc")}")
      // x=3 -> bits 0,2; y=1 -> bit 1; z = 0b0111 = 7
      assert(r.getAs[Long]("zv") == 7L, s"zv = ${r.getAs[Long]("zv")}")
      val agg = s.sql(
        """SELECT topn_agg(v, named_struct('id', id, 'v', v), 2) AS t
          |FROM VALUES (1L, 10.0D), (2L, 50.0D), (3L, 30.0D), (4L, 40.0D) AS t(id, v)
          |""".stripMargin).collect()
      assert(agg.length == 1 && agg(0).getSeq[Any](0).size == 2)
      println(s"[$label] all 9 graft SQL functions resolve and compute")
    }

    check(spark, "root session")
    check(spark.newSession(), "newSession fork") // extensions must survive forks

    def checkRule(s: SparkSession, label: String): Unit = {
      import org.apache.spark.sql.functions._
      import s.implicits._
      val names = Seq((1L, "kettle"), (2L, "kettles"), (3L, "cat"))
        .toDF("id", "name")
      val df = names.as("l").join(names.as("r"), col("l.id") < col("r.id"))
        .where(levenshtein(col("l.name"), col("r.name")) <= 1)
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("abs("),
        s"LevenshteinPrefilter did not fire via extensions:\n$opt")
      assert(df.count() == 1) // only (kettle, kettles)
      println(s"[$label] LevenshteinPrefilter rewrote the plan, result correct")
    }
    checkRule(spark, "root session")
    checkRule(spark.newSession(), "newSession fork")
    spark.stop()
    println("EXTENSIONS-SMOKE-PASS")
  }
}
