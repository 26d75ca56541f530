package graft

import org.apache.spark.ml.{Pipeline => MLPipeline, PipelineModel}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IntervalIdentifier
import graft.pipeline.{FunctionTransformer, Stage, WranglerTransformer}

/** graft → `spark.ml` bridge specs, mirroring the reference's converter
  * tests (reference: tests/pyspark/test_pipeline.py:112-166).
  */
class MLBridgeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def events = Seq(
    (1L, 1L, "s"), (1L, 2L, "e"), (1L, 3L, "s"), (1L, 4L, "e"))
    .toDF("user_id", "event_id", "marker")

  private def wrangler = new IntervalIdentifier("marker", "s", Some("e"),
    orderbyColumns = Seq("event_id"), groupbyColumns = Seq("user_id"))

  test("WranglerTransformer: params mirror getParams with wrangler defaults") {
    val t = WranglerTransformer(wrangler)
    assert(t.params.map(_.name).toSeq == wrangler.getParams.map(_._1))
    assert(t.getP("markerStart") == "s")
    assert(t.getP("targetColumnName") == "iids")
    assert(t.uid.startsWith("IntervalIdentifier"))
  }

  test("WranglerTransformer: transform applies the wrangler") {
    val out = WranglerTransformer(wrangler).transform(events)
    assert(out.filter(col("iids") === 2).count() == 2)
  }

  test("WranglerTransformer: setP changes behavior, original untouched " +
    "(reference seta/geta round trip)") {
    val w = wrangler
    val t = WranglerTransformer(w)
    t.setP("targetColumnName", "span_id")
    assert(t.getP("targetColumnName") == "span_id")
    val out = t.transform(events)
    assert(out.columns.contains("span_id") && !out.columns.contains("iids"))
    // deep-copy semantics: the wrapped wrangler keeps its own params
    assert(w.getParams.toMap.apply("targetColumnName") == "iids")
  }

  test("WranglerTransformer: transformSchema is exact and job-free") {
    val t = WranglerTransformer(wrangler)
    val schema = t.transformSchema(events.schema)
    assert(schema.fieldNames.contains("iids"))
    assert(schema("iids").dataType == org.apache.spark.sql.types.LongType)
  }

  test("WranglerTransformer inside an org.apache.spark.ml.Pipeline") {
    val ml = new MLPipeline().setStages(Array(
      Stage.toML(wrangler),
      FunctionTransformer("threshold", "min" -> 2L) { (df, p) =>
        df.filter(col("iids") >= p("min").asInstanceOf[Long])
      }))
    val model: PipelineModel = ml.fit(events)
    val out = model.transform(events)
    assert(out.count() == 2)
    assert(out.select("iids").distinct.as[Long].collect().toSeq == Seq(2L))
  }

  test("WranglerTransformer: ml fit-time ParamMap overrides apply " +
    "(the copy(extra) path spark.ml uses)") {
    val t = WranglerTransformer(wrangler)
    val pm = org.apache.spark.ml.param.ParamMap(
      t.getParam("targetColumnName") -> ("pm_col": Any))
    val model = new MLPipeline().setStages(Array(t)).fit(events, pm)
    val out = model.transform(events)
    assert(out.columns.contains("pm_col") && !out.columns.contains("iids"))
    // the original transformer instance is untouched
    assert(t.getP("targetColumnName") == "iids")
  }

  test("WranglerTransformer: copy(extra) preserves set values") {
    val t = WranglerTransformer(wrangler)
    t.setP("targetColumnName", "zz")
    val c = t.copy(org.apache.spark.ml.param.ParamMap.empty)
    assert(c.getP("targetColumnName") == "zz")
  }

  test("Wrangler.rebuild: type-mismatched update names the parameter") {
    val e = intercept[IllegalArgumentException](
      graft.core.Wrangler.rebuild(wrangler, Map("ascending" -> "yes")))
    assert(e.getMessage.contains("ascending"))
    val e2 = intercept[IllegalArgumentException](
      graft.core.Wrangler.rebuild(wrangler, Map("nope" -> 1)))
    assert(e2.getMessage.contains("Unknown parameter"))
  }

  test("FunctionTransformer: defaults, setP, and unknown-param error") {
    val t = FunctionTransformer("add", "by" -> 5) { (df, p) =>
      df.withColumn("n2", col("n") + p("by").asInstanceOf[Int])
    }
    val df = Seq(10).toDF("n")
    assert(t.transform(df).as[(Int, Int)].head() == ((10, 15)))
    t.setP("by", 10)
    assert(t.transform(df).as[(Int, Int)].head() == ((10, 20)))
    intercept[NoSuchElementException](t.setP("nope", 1))
  }
}
