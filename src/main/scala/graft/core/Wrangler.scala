package graft.core

import org.apache.spark.sql.DataFrame

/** Base abstraction for all data wranglers: a named, parameterized
  * dataframe-in / dataframe-out transformer with an (optional) fit step.
  *
  * Mirrors the sklearn-style fit/transform contract of the reference
  * framework (reference: src/pywrangler/base.py:12-131) re-expressed as a
  * plain Scala trait.
  */
trait Wrangler extends Serializable {

  /** True if the transformation keeps the number of rows unchanged. */
  def preservesSampleSize: Boolean = false

  /** Parameter (name, value) pairs IN PRIMARY-CONSTRUCTOR ORDER — the
    * `get_params` introspection surface (reference: base.py:56-103).
    * Case classes get this for free via Product; wranglers implemented as
    * plain classes must override it, keeping constructor order so
    * [[Wrangler.rebuild]] (the `set_params` equivalent) can re-instantiate
    * them reflectively.
    */
  def getParams: Seq[(String, Any)] = this match {
    case p: Product => p.productElementNames.zip(p.productIterator).toSeq
    case _ => Seq.empty
  }

  /** repr-style summary (reference: base.py:105-131 `__repr__`). A
    * concrete toString here suppresses case-class toString synthesis
    * (SLS 5.3.2), so case-class wranglers use this named-params repr too —
    * closer to the reference's `__repr__` than the positional default.
    */
  override def toString: String =
    getParams.map { case (k, v) => s"$k=$v" }
      .mkString(getClass.getSimpleName.stripSuffix("$") + "(", ", ", ")")

  def fit(df: DataFrame): this.type = this

  /** Apply the transformation, returning a new DataFrame (lazy plan). */
  def transform(df: DataFrame): DataFrame

  def fitTransform(df: DataFrame): DataFrame = fit(df).transform(df)
}

object Wrangler {

  /** `set_params` equivalent (reference: base.py:82-103): build a new
    * wrangler of the same class with some parameters replaced. Relies on
    * the [[Wrangler.getParams]] contract (pairs in primary-constructor
    * order); unknown names raise, like the reference.
    */
  def rebuild[W <: Wrangler](w: W, updates: Map[String, Any]): W = {
    val names = w.getParams.map(_._1)
    val unknown = updates.keySet -- names.toSet
    require(unknown.isEmpty,
      s"Unknown parameter(s) ${unknown.mkString(", ")} for " +
        s"${w.getClass.getSimpleName}; valid: ${names.mkString(", ")}")
    val args = w.getParams.map { case (k, v) =>
      updates.getOrElse(k, v).asInstanceOf[AnyRef]
    }
    // Among same-arity constructors prefer one whose (boxed) parameter
    // types accept every argument — arity alone can pick the wrong
    // overload. Nulls are treated as assignable to any reference type.
    val sameArity = w.getClass.getConstructors
      .filter(_.getParameterCount == args.size)
    if (sameArity.isEmpty)
      throw new IllegalStateException(
        s"${w.getClass.getName}: no ${args.size}-arg constructor; " +
          "getParams must mirror the primary constructor")
    def accepts(c: java.lang.reflect.Constructor[_]): Boolean =
      c.getParameterTypes.iterator.zip(args.iterator).forall {
        case (pt, a) =>
          if (a == null) !pt.isPrimitive // null fits any reference type
          else boxed(pt).isAssignableFrom(a.getClass)
      }
    val ctor = sameArity.find(accepts).getOrElse(sameArity.head)
    try ctor.newInstance(args: _*).asInstanceOf[W]
    catch {
      case e: IllegalArgumentException =>
        val mismatch = ctor.getParameterTypes.iterator.zip(args.iterator)
          .zip(names.iterator)
          .collectFirst {
            case ((pt, a), n) if a == null && pt.isPrimitive =>
              s"parameter `$n` expects ${pt.getSimpleName}, got null"
            case ((pt, a), n)
                if a != null && !boxed(pt).isAssignableFrom(a.getClass) =>
              s"parameter `$n` expects ${pt.getSimpleName}, " +
                s"got ${a.getClass.getSimpleName} ($a)"
          }
        throw new IllegalArgumentException(
          s"rebuild(${w.getClass.getSimpleName}): " +
            mismatch.getOrElse("constructor rejected arguments") +
            s"; valid params: ${names.mkString(", ")}", e)
    }
  }

  /** Primitive → boxed class, so `isAssignableFrom` works against the
    * always-boxed reflective argument values.
    */
  private def boxed(c: Class[_]): Class[_] = c match {
    case java.lang.Integer.TYPE   => classOf[java.lang.Integer]
    case java.lang.Long.TYPE      => classOf[java.lang.Long]
    case java.lang.Double.TYPE    => classOf[java.lang.Double]
    case java.lang.Float.TYPE     => classOf[java.lang.Float]
    case java.lang.Boolean.TYPE   => classOf[java.lang.Boolean]
    case java.lang.Short.TYPE     => classOf[java.lang.Short]
    case java.lang.Byte.TYPE      => classOf[java.lang.Byte]
    case java.lang.Character.TYPE => classOf[java.lang.Character]
    case other                    => other
  }
}
