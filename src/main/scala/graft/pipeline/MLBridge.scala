package graft.pipeline

import java.util.Collections

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{Param, ParamMap}
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.core.Wrangler

/** Base for graft's dynamic-`Param` `spark.ml` Transformers: one ml
  * `Param` per (name, default) pair, with pyspark-style string get/set
  * accessors, and `transform` driven by the current param values.
  *
  * Mirrors the reference's `StageTransformerConverter`
  * (reference: src/pywrangler/pyspark/pipeline.py:176-243 —
  * `_create_param_dict` + `_instantiate_transformer`). The reference
  * synthesizes a new `Transformer` subclass at runtime with one
  * getter/setter pair per wrangler keyword argument; on the JVM runtime
  * class synthesis is replaced by this statically-typed bridge that
  * overrides the `Params.params` registry instead (SURVEY §7.4/6).
  *
  * `MLWritable` persistence is intentionally out of scope, matching the
  * reference: its runtime-synthesized Transformer classes are equally
  * unpicklable, so neither side round-trips through `Pipeline.save`.
  */
sealed abstract class DynamicParamTransformer(
    defaults: Seq[(String, Any)], override val uid: String)
  extends Transformer {

  private val ordered: Array[Param[Any]] = defaults.map { case (n, _) =>
    new Param[Any](this, n, s"parameter `$n`")
  }.toArray

  /** Replace reflective method discovery: these params exist only in this
    * registry, not as public no-arg methods.
    */
  override lazy val params: Array[Param[_]] =
    ordered.asInstanceOf[Array[Param[_]]]

  defaults.foreach { case (n, v) => setDefault(getParam(n), v) }

  /** pyspark-style accessors — `instance.geta()` / `instance.seta(10)` in
    * the reference (reference: tests/pyspark/test_pipeline.py:112-158).
    */
  def getP(name: String): Any = $(getParam(name))
  def setP(name: String, value: Any): this.type = set(getParam(name), value)

  protected def currentParams: Map[String, Any] =
    ordered.iterator.map(p => p.name -> $(p)).toMap

  /** The wrapped computation at the CURRENT param values. */
  protected def run(df: DataFrame): DataFrame

  override def transform(ds: Dataset[_]): DataFrame = run(ds.toDF())

  /** Output schema, derived by planning the wrapped transform over an
    * empty frame of the input schema — exact (it is the analyzed plan's
    * schema), and job-free for plan-only wranglers (an eager wrangler,
    * e.g. the salted interval identifier, runs its jobs over the empty
    * frame — correct, just not free).
    */
  override def transformSchema(schema: StructType): StructType = {
    val spark = SparkSession.active
    run(spark.createDataFrame(Collections.emptyList[Row](), schema)).schema
  }
}

/** A graft [[Wrangler]] exposed as a `spark.ml.Transformer` so it drops
  * into an existing `org.apache.spark.ml.Pipeline`
  * (reference: src/pywrangler/pyspark/pipeline.py:107-138
  * `convert_wrangler`). Each `getParams` pair becomes an ml `Param`
  * defaulting to the wrangler's current value; `transform` re-instantiates
  * the wrangler with the current param values via [[Wrangler.rebuild]]
  * (the reference's `set_params(**self.getParams())`), leaving the
  * original wrangler unchanged.
  */
final class WranglerTransformer private (
    val wrangler: Wrangler, uid0: String)
  extends DynamicParamTransformer(wrangler.getParams, uid0) {

  protected def run(df: DataFrame): DataFrame =
    Wrangler.rebuild(wrangler, currentParams).transform(df)

  override def copy(extra: ParamMap): WranglerTransformer =
    copyValues(new WranglerTransformer(wrangler, uid), extra)
}

object WranglerTransformer {
  def apply(w: Wrangler): WranglerTransformer =
    new WranglerTransformer(
      w, Identifiable.randomUID(w.getClass.getSimpleName.stripSuffix("$")))
}

/** A plain `DataFrame => DataFrame`-with-config function exposed as a
  * `spark.ml.Transformer` (reference: pyspark/pipeline.py:140-175
  * `convert_function` — keyword arguments with defaults become `Param`s).
  */
final class FunctionTransformer private (
    name: String, defaults: Seq[(String, Any)],
    f: (DataFrame, Map[String, Any]) => DataFrame, uid0: String)
  extends DynamicParamTransformer(defaults, uid0) {

  protected def run(df: DataFrame): DataFrame = f(df, currentParams)

  override def copy(extra: ParamMap): FunctionTransformer =
    copyValues(new FunctionTransformer(name, defaults, f, uid), extra)
}

object FunctionTransformer {
  def apply(name: String, defaults: (String, Any)*)(
      f: (DataFrame, Map[String, Any]) => DataFrame): FunctionTransformer =
    new FunctionTransformer(name, defaults, f, Identifiable.randomUID(name))
}
