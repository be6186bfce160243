package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Ingest

class ExtensionsSpec extends AnyFunSuite {

  test("dot_product is callable from SQL via GraftExtensions") {
    SparkSpec.session // ensure the shared context exists
    // getOrCreate only applies extensions to a NEW session: clear the
    // default so a fresh session (reusing the live context) is built,
    // and never stop() it — that would kill the shared SparkContext.
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = spark.sql(
        "SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
        .collect().head.getDouble(0)
      assert(r == 32.0)
      // float arrays widen in-loop
      val f = spark.sql(
        "SELECT dot_product(array(CAST(1.5 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS d")
        .collect().head.getDouble(0)
      assert(f == 3.0)
      val c = spark.sql(
        "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
        .collect().head.getDouble(0)
      assert(math.abs(c - 1.0) < 1e-12)
      val h = spark.sql("SELECT hamming('1010', '1001') AS h")
        .collect().head.getInt(0)
      assert(h == 2)
      val j = spark.sql(
        """SELECT json_str_eq('{"tag": "news"}', 'tag', 'news') AS m""")
        .collect().head.getBoolean(0)
      assert(j)
    } finally {
      SparkSession.clearActiveSession()
      prev.foreach(SparkSession.setDefaultSession)
    }
  }

  test("streamScan yields fixed-size batches without full materialization") {
    val spark = SparkSpec.session
    val batches = Ingest.streamScan(spark.range(25).toDF(), batchSize = 10).toSeq
    assert(batches.map(_.size) == Seq(10, 10, 5))
  }
}
