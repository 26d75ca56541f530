package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  test("long_array_dot reachable from SQL via session extensions") {
    val shared = TestSpark.spark
    // getOrCreate reuses the default session (ignoring withExtensions);
    // clear it so a fresh session on the same context gets the extensions
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder().master("local[2]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val got = spark.sql(
        "SELECT long_array_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
        .collect().head.getLong(0)
      assert(got == 32L)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("register() installs long_array_dot into an already-built session") {
    val spark = TestSpark.spark // built WITHOUT withExtensions
    GraftExtensions.register(spark)
    GraftExtensions.register(spark) // idempotent re-registration
    val got = spark.sql(
      "SELECT long_array_dot(array(2L, 3L), array(5L, 7L)) AS d")
      .collect().head.getLong(0)
    assert(got == 31L)
  }
}
