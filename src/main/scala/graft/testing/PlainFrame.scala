package graft.testing

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Engine-independent primitive dtype lattice
  * (reference: src/pywrangler/util/testing/plainframe.py:48-58).
  * Exactly five primitives; arrays/maps/structs/decimals are intentionally
  * unsupported for parity.
  */
sealed abstract class PFType(val name: String, val abbrev: String,
                             val sparkType: DataType)
object PFType {
  case object Bool extends PFType("bool", "b", BooleanType)
  case object Int extends PFType("int", "i", IntegerType)
  case object Float extends PFType("float", "f", DoubleType)
  case object Str extends PFType("str", "s", StringType)
  case object Datetime extends PFType("datetime", "d", TimestampType)

  val all: Seq[PFType] = Seq(Bool, Int, Float, Str, Datetime)

  def fromString(s: String): PFType =
    all.find(t => t.name == s || t.abbrev == s).getOrElse(
      throw new IllegalArgumentException(s"Unknown PlainFrame dtype: $s"))

  /** Map an ingested Spark type onto the lattice (reference accepts
    * small/int/bigint -> int, float/double -> float, date -> datetime;
    * plainframe.py:835-843).
    */
  def fromSpark(dt: DataType): PFType = dt match {
    case BooleanType => Bool
    case ByteType | ShortType | IntegerType | LongType => Int
    case FloatType | DoubleType => Float
    case StringType => Str
    case TimestampType | DateType => Datetime
    case other => throw new IllegalArgumentException(
      s"Unsupported Spark dtype for PlainFrame: $other")
  }
}

/** One typed, immutable column; `null` is the explicit missing value,
  * `Double.NaN` is a distinct first-class float value
  * (reference: plainframe.py:20-41 NullValue vs NaN).
  * Int values are normalized to Long, Float to Double.
  */
final case class PlainColumn(name: String, dtype: PFType, values: Vector[Any]) {
  values.foreach(v => require(v == null || valueOk(v),
    s"Column `$name` ($dtype) got incompatible value: $v (${v.getClass})"))

  private def valueOk(v: Any): Boolean = dtype match {
    case PFType.Bool     => v.isInstanceOf[Boolean]
    case PFType.Int      => v.isInstanceOf[Long]
    case PFType.Float    => v.isInstanceOf[Double]
    case PFType.Str      => v.isInstanceOf[String]
    case PFType.Datetime => v.isInstanceOf[Timestamp]
  }
}

/** Column-oriented, typed, immutable mini dataframe for golden-data tests
  * (reference: src/pywrangler/util/testing/plainframe.py:60-593).
  *
  * Supports round-trips to/from Spark DataFrames and row-order-insensitive
  * equality assertion with dtype checking (EqualityAsserter,
  * plainframe.py:1312-1442).
  */
final case class PlainFrame(columns: Vector[PlainColumn]) {
  require(columns.map(_.values.size).distinct.size <= 1,
    "All columns must have equal number of values")
  require(columns.map(_.name).distinct.size == columns.size,
    "Column names must be unique")

  def columnNames: Vector[String] = columns.map(_.name)
  def dtypes: Vector[PFType] = columns.map(_.dtype)
  def nRows: Int = columns.headOption.map(_.values.size).getOrElse(0)

  def column(name: String): PlainColumn =
    columns.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"Column `$name` does not exist"))

  def rows: Vector[Vector[Any]] =
    (0 until nRows).map(i => columns.map(_.values(i))).toVector

  /** Drop columns by name (reference: plainframe.py:749-806 subsetting). */
  def drop(names: String*): PlainFrame =
    PlainFrame(columns.filterNot(c => names.contains(c.name)))

  def select(names: String*): PlainFrame =
    PlainFrame(names.map(column).toVector)

  /** Modify a single cell, returning a new frame (mutation-test hook). */
  def withValue(colName: String, row: Int, value: Any): PlainFrame = {
    val normalized = PlainFrame.normalize(value, column(colName).dtype)
    PlainFrame(columns.map { c =>
      if (c.name == colName) c.copy(values = c.values.updated(row, normalized))
      else c
    })
  }

  def schema: StructType =
    StructType(columns.map(c => StructField(c.name, c.dtype.sparkType,
      nullable = true)))

  def toDF(spark: SparkSession): DataFrame = {
    val sparkRows = rows.map { r =>
      Row.fromSeq(r.zip(dtypes).map {
        case (null, _) => null
        case (v: Long, PFType.Int) =>
          require(v >= Int.MinValue && v <= Int.MaxValue,
            s"Int column value out of range: $v")
          v.toInt
        case (v, _) => v
      })
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(sparkRows.toSeq, 2), schema)
  }

  /** Total order over rows so frames with NULLs can be canonically sorted
    * for row-order-insensitive comparison (NULL sorts first, NaN last among
    * floats; reference NullValue.__lt__ plainframe.py:30-37).
    */
  private def sortedRows: Vector[Vector[Any]] = {
    implicit val anyOrd: Ordering[Any] = (a: Any, b: Any) => (a, b) match {
      case (null, null) => 0
      case (null, _) => -1
      case (_, null) => 1
      case (x: Long, y: Long) => java.lang.Long.compare(x, y)
      case (x: Double, y: Double) => java.lang.Double.compare(x, y)
      case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
      case (x: String, y: String) => x.compareTo(y)
      case (x: Timestamp, y: Timestamp) => x.compareTo(y)
      case (x, y) => x.toString.compareTo(y.toString)
    }
    rows.sortBy(identity)(Ordering.Implicits.seqOrdering[Vector, Any])
  }

  /** Assert equality with `other`: same shape, names, dtypes and (sorted)
    * cell values, NaN == NaN. Column order is significant unless both agree;
    * row order never is (reference: plainframe.py:1321-1442).
    */
  def assertEqual(other: PlainFrame, checkColumnOrder: Boolean = false,
                  checkDtypes: Boolean = true): Unit = {
    def fail(msg: String): Nothing = throw new AssertionError(
      s"PlainFrame mismatch: $msg\n  left:  ${this.describe}\n  right: ${other.describe}")

    if (nRows != other.nRows) fail(s"row count ${nRows} vs ${other.nRows}")
    if (columnNames.toSet != other.columnNames.toSet)
      fail(s"column names ${columnNames} vs ${other.columnNames}")
    if (checkColumnOrder && columnNames != other.columnNames)
      fail(s"column order ${columnNames} vs ${other.columnNames}")

    val aligned = other.select(columnNames: _*)
    if (checkDtypes && dtypes != aligned.dtypes)
      fail(s"dtypes ${dtypes} vs ${aligned.dtypes}")

    val l = sortedRows
    val r = aligned.sortedRows
    l.zip(r).zipWithIndex.foreach { case ((lr, rr), i) =>
      lr.zip(rr).zipWithIndex.foreach { case ((lv, rv), j) =>
        val eq = (lv, rv) match {
          case (null, null) => true
          case (null, _) | (_, null) => false
          case (x: Double, y: Double) =>
            (x.isNaN && y.isNaN) || x == y
          case (x, y) => x == y
        }
        if (!eq) fail(s"sorted row $i, column `${columnNames(j)}`: $lv != $rv")
      }
    }
  }

  def describe: String =
    columnNames.zip(dtypes).map { case (n, t) => s"$n:${t.name}" }
      .mkString(s"PlainFrame[$nRows rows](", ", ", ")")
}

object PlainFrame {

  private[testing] def normalize(v: Any, t: PFType): Any = (v, t) match {
    case (null, _) => null
    case (x: Int, PFType.Int) => x.toLong
    case (x: Long, PFType.Int) => x
    case (x: Int, PFType.Float) => x.toDouble // int upcast, plainframe.py:136-147
    case (x: Long, PFType.Float) => x.toDouble
    case (x: Float, PFType.Float) => x.toDouble
    case (x: Double, PFType.Float) => x
    case (x, _) => x
  }

  /** Row-wise construction with either full dtype names or "name:type"
    * annotations (reference: plainframe.py:529-593, parser :688-724).
    */
  def fromPlain(data: Seq[Seq[Any]], columns: Seq[String],
                dtypes: Seq[String] = Nil): PlainFrame = {
    val (names, types) =
      if (dtypes.nonEmpty) (columns, dtypes.map(PFType.fromString))
      else {
        val parsed = columns.map { c =>
          val parts = c.split(":")
          require(parts.length == 2, s"Typed column annotation expected (name:type): $c")
          (parts(0), PFType.fromString(parts(1)))
        }
        (parsed.map(_._1), parsed.map(_._2))
      }
    require(names.size == types.size)
    data.foreach(r => require(r.size == names.size,
      s"Row has ${r.size} values, expected ${names.size}"))
    val cols = names.zip(types).zipWithIndex.map { case ((n, t), i) =>
      PlainColumn(n, t, data.map(r => normalize(r(i), t)).toVector)
    }
    PlainFrame(cols.toVector)
  }

  /** Collect a Spark DataFrame to the driver (test data is intentionally
    * tiny — the single executor->driver hop of the whole kit; reference:
    * plainframe.py:864-868).
    */
  def fromDF(df: DataFrame): PlainFrame = {
    val types = df.schema.fields.map(f => PFType.fromSpark(f.dataType))
    val collected = df.collect()
    val cols = df.schema.fields.zipWithIndex.map { case (f, i) =>
      val t = types(i)
      PlainColumn(f.name, t, collected.map { r =>
        if (r.isNullAt(i)) null
        else normalize(r.get(i) match {
          case b: Byte => b.toLong
          case s: Short => s.toLong
          case x: Int => x.toLong
          case d: java.sql.Date => new Timestamp(d.getTime)
          case other => other
        }, t)
      }.toVector)
    }
    PlainFrame(cols.toVector)
  }
}
