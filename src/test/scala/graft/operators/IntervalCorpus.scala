package graft.operators

import graft.testing.PlainFrame

/** Golden input/output corpus for the interval identifier, transcribed from
  * the reference test data (reference:
  * tests/test_data/interval_identifier.py). Each case is data-only: the
  * expected `iid` column doubles as the last input column removed.
  */
object IntervalCorpus {

  val AllConfigs: Seq[(Boolean, Boolean)] =
    Seq((true, true), (true, false), (false, false), (false, true))

  final case class GoldenCase(
      name: String,
      columns: Seq[String],
      rows: Seq[Seq[Any]],
      markerStart: Any = 1,
      markerEnd: Option[Any] = Some(2),
      orderby: Seq[String] = Seq("order"),
      groupby: Seq[String] = Seq("groupby"),
      ascending: Seq[Boolean] = Seq(true),
      configs: Seq[(Boolean, Boolean)] = AllConfigs,
      resultType: ResultType = ResultType.Enumerated) {

    def expected: PlainFrame = PlainFrame.fromPlain(rows, columns)
    def input: PlainFrame = expected.drop("iid")

    def wrangler(startUseFirst: Boolean, endUseFirst: Boolean,
                 adjusted: Boolean): IntervalIdentifier =
      if (adjusted)
        new IntervalIdentifierAdjusted("marker", markerStart, markerEnd,
          startUseFirst, endUseFirst, orderby, groupby, ascending,
          resultType, "iid")
      else
        new IntervalIdentifier("marker", markerStart, markerEnd,
          startUseFirst, endUseFirst, orderby, groupby, ascending,
          resultType, "iid")

    /** Salted variant with deliberately tiny buckets so every golden case
      * exercises chunk boundaries (carries, boundary drops, offsets).
      */
    def saltedWrangler(startUseFirst: Boolean, endUseFirst: Boolean,
                       buckets: Int = 3): IntervalIdentifier =
      new IntervalIdentifierSalted("marker", markerStart, markerEnd,
        startUseFirst, endUseFirst, orderby, groupby, ascending,
        resultType, "iid", saltBuckets = buckets, maxChunkRows = 1L)
  }

  private val intCols = Seq("order:i", "groupby:i", "marker:i", "iid:i")
  private val N: Any = null

  private def c1(name: String, rows: Seq[Seq[Any]],
                 configs: Seq[(Boolean, Boolean)] = AllConfigs) =
    GoldenCase(name, intCols, rows, configs = configs)

  // ------------------------------------------------------ CollectionGeneral
  // reference: tests/test_data/interval_identifier.py:155-681; identical
  // expected output under all four marker-use configs (no duplicated
  // markers in the data). Marker values: start=1, end=2, noise=0.

  val noInterval = c1("NoInterval", Seq(
    Seq(1, 1, 0, 0), Seq(2, 1, 0, 0), Seq(3, 1, 0, 0), Seq(4, 1, 0, 0)))

  val noIntervalInvalidStart = c1("NoIntervalInvalidStart", Seq(
    Seq(1, 1, 0, 0), Seq(2, 1, 0, 0), Seq(3, 1, 1, 0), Seq(4, 1, 0, 0)))

  val noIntervalInvalidEnd = c1("NoIntervalInvalidEnd", Seq(
    Seq(1, 1, 0, 0), Seq(2, 1, 0, 0), Seq(3, 1, 2, 0), Seq(4, 1, 0, 0)))

  val singleInterval = c1("SingleInterval", Seq(
    Seq(1, 1, 0, 0), Seq(2, 1, 1, 1), Seq(3, 1, 2, 1), Seq(4, 1, 0, 0)))

  val singleIntervalStartsWith = c1("SingleIntervalStartsWith", Seq(
    Seq(1, 1, 1, 1), Seq(2, 1, 2, 1), Seq(3, 1, 0, 0), Seq(4, 1, 0, 0)))

  val singleIntervalEndsWith = c1("SingleIntervalEndsWith", Seq(
    Seq(1, 1, 0, 0), Seq(2, 1, 0, 0), Seq(3, 1, 1, 1), Seq(4, 1, 2, 1)))

  val singleIntervalSpanning = c1("SingleIntervalSpanning", Seq(
    Seq(1, 1, 0, 0), Seq(2, 1, 1, 1), Seq(3, 1, 0, 1), Seq(4, 1, 2, 1),
    Seq(5, 1, 0, 0)))

  val singleIntervalSpanningGroupby = c1("SingleIntervalSpanningGroupby", Seq(
    Seq(1, 1, 0, 0), Seq(2, 1, 1, 1), Seq(3, 1, 0, 1), Seq(4, 1, 2, 1),
    Seq(5, 1, 0, 0), Seq(6, 2, 0, 0), Seq(7, 2, 0, 0), Seq(8, 2, 0, 0)))

  val singleIntervalUnsorted = c1("SingleIntervalUnsorted", Seq(
    Seq(4, 1, 2, 1), Seq(3, 1, 0, 1), Seq(2, 1, 1, 1), Seq(5, 1, 0, 0),
    Seq(1, 1, 0, 0)))

  val singleIntervalMissings = c1("SingleIntervalMissings", Seq(
    Seq(1, 1, N, 0), Seq(2, 1, 1, 1), Seq(3, 1, N, 1), Seq(4, 1, 2, 1),
    Seq(5, 1, N, 0)))

  val multipleIntervals = c1("MultipleIntervals", Seq(
    Seq(1, 1, 0, 0), Seq(2, 1, 1, 1), Seq(3, 1, 2, 1), Seq(4, 1, 0, 0),
    Seq(5, 1, 1, 2), Seq(6, 1, 2, 2), Seq(7, 1, 0, 0)))

  val multipleIntervalsReverse = c1("MultipleIntervalsReverse", Seq(
    Seq(1, 1, 0, 0), Seq(2, 1, 2, 2), Seq(3, 1, 1, 2), Seq(4, 1, 2, 1),
    Seq(5, 1, 0, 1), Seq(6, 1, 1, 1), Seq(7, 1, 0, 0)))
    .copy(ascending = Seq(false))

  val multipleIntervalsSpanning = c1("MultipleIntervalsSpanning", Seq(
    Seq(1, 1, 0, 0), Seq(2, 1, 1, 1), Seq(3, 1, 2, 1), Seq(4, 1, 0, 0),
    Seq(5, 1, 1, 2), Seq(6, 1, 0, 2), Seq(7, 1, 2, 2), Seq(8, 1, 0, 0)))

  private val floatCols = Seq("order:i", "groupby:i", "marker:f", "iid:i")

  val multipleIntervalsSpanningFloat = GoldenCase(
    "MultipleIntervalsSpanningFloat", floatCols, Seq(
      Seq[Any](1, 1, 0.3, 0), Seq[Any](2, 1, 0.1, 1), Seq[Any](3, 1, 0.2, 1),
      Seq[Any](4, 1, 0.3, 0), Seq[Any](5, 1, 0.1, 2), Seq[Any](6, 1, 0.3, 2),
      Seq[Any](7, 1, 0.2, 2), Seq[Any](8, 1, 0.3, 0)),
    markerStart = 0.1, markerEnd = Some(0.2))

  val multipleIntervalsSpanningFloatNaN = GoldenCase(
    "MultipleIntervalsSpanningFloatNAN", floatCols, Seq(
      Seq[Any](1, 1, Double.NaN, 0), Seq[Any](2, 1, 0.1, 1),
      Seq[Any](3, 1, 0.2, 1), Seq[Any](4, 1, Double.NaN, 0),
      Seq[Any](5, 1, 0.1, 2), Seq[Any](6, 1, Double.NaN, 2),
      Seq[Any](7, 1, 0.2, 2), Seq[Any](8, 1, 0.3, 0)),
    markerStart = 0.1, markerEnd = Some(0.2))

  private val strCols = Seq("order:i", "groupby:i", "marker:s", "iid:i")

  val multipleIntervalsSpanningString = GoldenCase(
    "MultipleIntervalsSpanningString", strCols, Seq(
      Seq(1, 1, "noise", 0), Seq(2, 1, "start", 1), Seq(3, 1, "end", 1),
      Seq(4, 1, "noise", 0), Seq(5, 1, "start", 2), Seq(6, 1, "noise", 2),
      Seq(7, 1, "end", 2), Seq(8, 1, "noise", 0)),
    markerStart = "start", markerEnd = Some("end"))

  val multipleIntervalsSpanningGroupby = c1("MultipleIntervalsSpanningGroupby",
    Seq(
      Seq(1, 1, 0, 0), Seq(2, 1, 1, 1), Seq(3, 1, 2, 1), Seq(4, 1, 0, 0),
      Seq(5, 2, 1, 1), Seq(6, 2, 0, 1), Seq(7, 2, 2, 1), Seq(8, 2, 0, 0)))

  val multipleIntervalsSpanningGroupbyExtended = c1(
    "MultipleIntervalsSpanningGroupbyExtended", Seq(
      Seq(1, 1, 0, 0), Seq(2, 1, 1, 1), Seq(3, 1, 2, 1), Seq(4, 1, 0, 0),
      Seq(5, 2, 1, 1), Seq(6, 2, 0, 1), Seq(7, 2, 2, 1), Seq(8, 2, 0, 0),
      Seq(9, 2, 0, 0), Seq(10, 2, 1, 2), Seq(11, 2, 0, 2), Seq(12, 2, 2, 2),
      Seq(13, 2, 1, 3), Seq(14, 2, 2, 3)))

  val multipleIntervalsSpanningGroupbyExtendedTriple = c1(
    "MultipleIntervalsSpanningGroupbyExtendedTriple", Seq(
      Seq(1, 1, 0, 0), Seq(2, 1, 1, 1), Seq(3, 1, 2, 1), Seq(4, 1, 0, 0),
      Seq(5, 2, 1, 1), Seq(6, 2, 0, 1), Seq(7, 2, 2, 1), Seq(8, 2, 0, 0),
      Seq(9, 2, 0, 0),
      Seq(10, 3, 1, 1), Seq(11, 3, 0, 1), Seq(12, 3, 2, 1), Seq(13, 3, 1, 2),
      Seq(14, 3, 2, 2)))

  val multipleIntervalsUnsorted = c1("MultipleIntervalsUnsorted", Seq(
    Seq(6, 1, 0, 2), Seq(3, 1, 2, 1), Seq(4, 1, 0, 0), Seq(8, 1, 0, 0),
    Seq(1, 1, 0, 0), Seq(7, 1, 2, 2), Seq(2, 1, 1, 1), Seq(5, 1, 1, 2)))

  val multipleIntervalsMissing = c1("MultipleIntervalsMissing", Seq(
    Seq(1, 1, N, 0), Seq(2, 1, 1, 1), Seq(3, 1, 2, 1), Seq(4, 1, 0, 0),
    Seq(5, 1, 1, 2), Seq(6, 1, 2, 2), Seq(7, 1, N, 0)))

  val invalidStartsWithEnd = c1("InvalidStartsWithEnd", Seq(
    Seq(1, 1, 2, 0), Seq(2, 1, 2, 0), Seq(3, 1, 2, 0), Seq(4, 1, 0, 0),
    Seq(5, 1, 1, 1), Seq(6, 1, 2, 1)))

  val invalidEndsWithStart = c1("InvalidEndsWithStart", Seq(
    Seq(1, 1, 0, 0), Seq(2, 1, 1, 1), Seq(3, 1, 2, 1), Seq(4, 1, 1, 0),
    Seq(5, 1, 1, 0), Seq(6, 1, 1, 0)))

  private val multiCols = Seq("order1:i", "order2:i", "groupby1:i",
    "groupby2:i", "marker:i", "iid:i")

  private def cm(name: String, rows: Seq[Seq[Any]], asc: Boolean = true) =
    GoldenCase(name, multiCols, rows,
      orderby = Seq("order1", "order2"),
      groupby = Seq("groupby1", "groupby2"),
      ascending = Seq(asc, asc))

  val multipleOrderGroupby = cm("MultipleOrderGroupby", Seq(
    Seq(1, 1, 1, 1, 0, 0), Seq(1, 2, 1, 1, 1, 1), Seq(2, 1, 1, 1, 2, 1),
    Seq(2, 2, 1, 1, 0, 0),
    Seq(3, 1, 1, 2, 1, 1), Seq(3, 2, 1, 2, 0, 1), Seq(4, 1, 1, 2, 2, 1),
    Seq(4, 2, 1, 2, 0, 0),
    Seq(1, 1, 2, 1, 1, 1), Seq(1, 2, 2, 1, 2, 1), Seq(2, 1, 2, 1, 1, 2),
    Seq(2, 2, 2, 1, 2, 2),
    Seq(3, 1, 2, 2, 1, 1), Seq(3, 2, 2, 2, 0, 1), Seq(4, 1, 2, 2, 2, 1),
    Seq(4, 2, 2, 2, 0, 0)))

  val multipleOrderGroupbyReverse = cm("MultipleOrderGroupbyReverse", Seq(
    Seq(1, 1, 1, 1, 2, 2), Seq(1, 2, 1, 1, 1, 2), Seq(2, 1, 1, 1, 2, 1),
    Seq(2, 2, 1, 1, 1, 1),
    Seq(3, 1, 1, 2, 1, 0), Seq(3, 2, 1, 2, 2, 1), Seq(4, 1, 1, 2, 0, 1),
    Seq(4, 2, 1, 2, 1, 1),
    Seq(1, 1, 2, 1, 1, 0), Seq(1, 2, 2, 1, 2, 1), Seq(2, 1, 2, 1, 1, 1),
    Seq(2, 2, 2, 1, 2, 0),
    Seq(3, 1, 2, 2, 1, 0), Seq(3, 2, 2, 2, 0, 0), Seq(4, 1, 2, 2, 2, 0),
    Seq(4, 2, 2, 2, 0, 0)), asc = false)

  val multipleOrderGroupbyMissing = cm("MultipleOrderGroupbyMissing", Seq(
    Seq(1, 1, 1, 1, N, 0), Seq(1, 2, 1, 1, 1, 1), Seq(2, 1, 1, 1, 2, 1),
    Seq(2, 2, 1, 1, 0, 0),
    Seq(3, 1, 1, 2, 1, 1), Seq(3, 2, 1, 2, 0, 1), Seq(4, 1, 1, 2, 2, 1),
    Seq(4, 2, 1, 2, N, 0),
    Seq(5, 1, 1, 2, 0, 0), Seq(5, 2, 1, 2, N, 0), Seq(5, 3, 1, 2, 1, 2),
    Seq(5, 4, 1, 2, 2, 2),
    Seq(3, 1, 2, 2, 1, 1), Seq(3, 2, 2, 2, 2, 1), Seq(4, 1, 2, 2, N, 0),
    Seq(4, 2, 2, 2, 0, 0)))

  val multipleOrderGroupbyMissingUnsorted = cm(
    "MultipleOrderGroupbyMissingUnsorted", Seq(
      Seq(1, 1, 1, 1, N, 0), Seq(4, 1, 1, 2, 2, 1), Seq(5, 3, 1, 2, 1, 2),
      Seq(3, 1, 2, 2, 1, 1), Seq(2, 1, 1, 1, 2, 1), Seq(3, 1, 1, 2, 1, 1),
      Seq(5, 1, 1, 2, 0, 0), Seq(3, 2, 1, 2, 0, 1), Seq(1, 2, 1, 1, 1, 1),
      Seq(4, 2, 1, 2, N, 0), Seq(2, 2, 1, 1, 0, 0), Seq(5, 2, 1, 2, N, 0),
      Seq(4, 1, 2, 2, N, 0), Seq(5, 4, 1, 2, 2, 2), Seq(3, 2, 2, 2, 2, 1),
      Seq(4, 2, 2, 2, 0, 0)))

  val collectionGeneral: Seq[GoldenCase] = Seq(
    noInterval, noIntervalInvalidStart, noIntervalInvalidEnd, singleInterval,
    singleIntervalStartsWith, singleIntervalEndsWith, singleIntervalSpanning,
    singleIntervalSpanningGroupby, singleIntervalUnsorted,
    singleIntervalMissings, multipleIntervals, multipleIntervalsReverse,
    multipleIntervalsSpanning, multipleIntervalsSpanningFloat,
    multipleIntervalsSpanningFloatNaN, multipleIntervalsSpanningString,
    multipleIntervalsSpanningGroupby, multipleIntervalsSpanningGroupbyExtended,
    multipleIntervalsSpanningGroupbyExtendedTriple, multipleIntervalsUnsorted,
    multipleIntervalsMissing, invalidStartsWithEnd, invalidEndsWithStart,
    multipleOrderGroupby, multipleOrderGroupbyReverse,
    multipleOrderGroupbyMissing, multipleOrderGroupbyMissingUnsorted)

  // --------------------------------------------- CollectionNoOrderGroupBy
  // reference: tests/test_data/interval_identifier.py:1254-1272 with
  // tests/pyspark/wranglers/test_interval_identifier.py:200-223 — the
  // same 8 general cases run with NO groupby columns (one global
  // sequence). Expected iids are unchanged: each case's second group is
  // pure noise, so merging groups introduces no new intervals.

  val collectionNoOrderGroupBy: Seq[GoldenCase] = Seq(
    noInterval, noIntervalInvalidStart, noIntervalInvalidEnd, singleInterval,
    singleIntervalStartsWith, singleIntervalEndsWith, singleIntervalSpanning,
    singleIntervalSpanningGroupby).map(c => c.copy(groupby = Nil))

  // --------------------------------------------- CollectionIdenticalStartEnd
  // reference: :684-815; start == end == 1, default config only.

  private def ci(name: String, rows: Seq[Seq[Any]], asc: Boolean = true) =
    GoldenCase(name, intCols, rows, markerStart = 1, markerEnd = Some(1),
      ascending = Seq(asc), configs = Seq((false, true)))

  val identicalSingle = ci("IdenticalStartEndSingleInterval", Seq(
    Seq(1, 1, 0, 0), Seq(2, 1, 1, 1), Seq(3, 1, 0, 1), Seq(4, 1, 0, 1)))

  val identicalMultiple = ci("IdenticalStartEndMultipleInterval", Seq(
    Seq(1, 1, 0, 0), Seq(2, 1, 1, 1), Seq(3, 1, 0, 1), Seq(4, 1, 1, 2),
    Seq(5, 1, 0, 2), Seq(6, 1, 1, 3), Seq(7, 1, 0, 3), Seq(8, 1, 0, 3)))

  val identicalMultipleReversed = ci(
    "IdenticalStartEndMultipleIntervalReversed", Seq(
      Seq(1, 1, 0, 3), Seq(2, 1, 1, 3), Seq(3, 1, 0, 2), Seq(4, 1, 1, 2),
      Seq(5, 1, 0, 1), Seq(6, 1, 1, 1), Seq(7, 1, 0, 0), Seq(8, 1, 0, 0)),
    asc = false)

  val identicalMultipleMissing = ci(
    "IdenticalStartEndMultipleIntervalMissing", Seq(
      Seq(1, 1, N, 0), Seq(2, 1, 1, 1), Seq(3, 1, 0, 1), Seq(4, 1, 1, 2),
      Seq(5, 1, N, 2), Seq(6, 1, 1, 3), Seq(7, 1, 0, 3), Seq(8, 1, N, 3)))

  val identicalMultipleMissingUnsorted = ci(
    "IdenticalStartEndMultipleIntervalMissingUnsorted", Seq(
      Seq(5, 1, N, 2), Seq(2, 1, 1, 1), Seq(6, 1, 1, 3), Seq(4, 1, 1, 2),
      Seq(8, 1, N, 3), Seq(1, 1, N, 0), Seq(3, 1, 0, 1), Seq(7, 1, 0, 3)))

  val identicalMultiOrderGroupbyMissing = GoldenCase(
    "IdenticalStartEndMultipleOrderGroupbyMissing", multiCols, Seq(
      Seq(1, 1, 1, 1, N, 0), Seq(1, 2, 1, 1, 1, 1), Seq(2, 1, 1, 1, N, 1),
      Seq(2, 2, 1, 1, 0, 1),
      Seq(3, 1, 1, 2, 1, 1), Seq(3, 2, 1, 2, 0, 1), Seq(4, 1, 1, 2, 1, 2),
      Seq(4, 2, 1, 2, N, 2),
      Seq(5, 1, 1, 2, 0, 2), Seq(5, 2, 1, 2, N, 2), Seq(5, 3, 1, 2, 1, 3),
      Seq(5, 4, 1, 2, 0, 3),
      Seq(3, 1, 2, 2, 1, 1), Seq(3, 2, 2, 2, 1, 2), Seq(4, 1, 2, 2, N, 2),
      Seq(4, 2, 2, 2, 0, 2)),
    markerStart = 1, markerEnd = Some(1),
    orderby = Seq("order1", "order2"), groupby = Seq("groupby1", "groupby2"),
    ascending = Seq(true, true), configs = Seq((false, true)))

  val collectionIdenticalStartEnd: Seq[GoldenCase] = Seq(
    identicalSingle, identicalMultiple, identicalMultipleReversed,
    identicalMultipleMissing, identicalMultipleMissingUnsorted,
    identicalMultiOrderGroupbyMissing)

  // ------------------------------------------------ CollectionMarkerSpecifics
  // reference: :818-1199; duplicated markers, expected output depends on the
  // marker-use config (encoded per case).

  private def cs(name: String, su: Boolean, eu: Boolean, rows: Seq[Seq[Any]]) =
    GoldenCase(name, intCols, rows, configs = Seq((su, eu)))

  val markerSpecifics: Seq[GoldenCase] = Seq(
    cs("FirstStartFirstEndValid", true, true, Seq(
      Seq(1, 1, 1, 1), Seq(2, 1, 1, 1), Seq(3, 1, 1, 1), Seq(4, 1, 0, 1),
      Seq(5, 1, 1, 1), Seq(6, 1, 0, 1), Seq(7, 1, 1, 1), Seq(8, 1, 0, 1),
      Seq(9, 1, 2, 1), Seq(10, 1, 0, 0), Seq(11, 1, 2, 0), Seq(12, 1, 0, 0),
      Seq(13, 1, 2, 0), Seq(14, 1, 2, 0), Seq(15, 1, 2, 0))),
    cs("FirstStartFirstEndInvalid", true, true, Seq(
      Seq(1, 1, 2, 0), Seq(2, 1, 2, 0), Seq(3, 1, 2, 0), Seq(4, 1, 0, 0),
      Seq(5, 1, 2, 0), Seq(6, 1, 0, 0), Seq(7, 1, 1, 1), Seq(8, 1, 1, 1),
      Seq(9, 1, 0, 1), Seq(10, 1, 1, 1), Seq(11, 1, 0, 1), Seq(12, 1, 2, 1),
      Seq(13, 1, 2, 0), Seq(14, 1, 0, 0), Seq(15, 1, 2, 0), Seq(16, 1, 0, 0),
      Seq(17, 1, 1, 0), Seq(18, 1, 0, 0), Seq(19, 1, 1, 0), Seq(20, 1, 1, 0),
      Seq(21, 1, 1, 0))),
    cs("FirstStartFirstEndInvalidMissing", true, true, Seq(
      Seq(1, 1, 2, 0), Seq(2, 1, 2, 0), Seq(3, 1, 2, 0), Seq(4, 1, N, 0),
      Seq(5, 1, 2, 0), Seq(6, 1, N, 0), Seq(7, 1, 1, 1), Seq(8, 1, 1, 1),
      Seq(9, 1, N, 1), Seq(10, 1, 1, 1), Seq(11, 1, N, 1), Seq(12, 1, 2, 1),
      Seq(13, 1, 2, 0), Seq(14, 1, N, 0), Seq(15, 1, 2, 0), Seq(16, 1, N, 0),
      Seq(17, 1, 1, 0), Seq(18, 1, N, 0), Seq(19, 1, 1, 0), Seq(20, 1, 1, 0),
      Seq(21, 1, 1, 0))),
    cs("FirstStartLastEndValid", true, false, Seq(
      Seq(1, 1, 1, 1), Seq(2, 1, 1, 1), Seq(3, 1, 1, 1), Seq(4, 1, 0, 1),
      Seq(5, 1, 1, 1), Seq(6, 1, 0, 1), Seq(7, 1, 1, 1), Seq(8, 1, 0, 1),
      Seq(9, 1, 2, 1), Seq(10, 1, 0, 1), Seq(11, 1, 2, 1), Seq(12, 1, 0, 1),
      Seq(13, 1, 2, 1), Seq(14, 1, 2, 1), Seq(15, 1, 2, 1))),
    cs("FirstStartLastEndInvalid", true, false, Seq(
      Seq(1, 1, 2, 0), Seq(2, 1, 2, 0), Seq(3, 1, 2, 0), Seq(4, 1, 0, 0),
      Seq(5, 1, 2, 0), Seq(6, 1, 0, 0), Seq(7, 1, 1, 1), Seq(8, 1, 1, 1),
      Seq(9, 1, 0, 1), Seq(10, 1, 1, 1), Seq(11, 1, 0, 1), Seq(12, 1, 2, 1),
      Seq(13, 1, 2, 1), Seq(14, 1, 0, 1), Seq(15, 1, 2, 1), Seq(16, 1, 0, 0),
      Seq(17, 1, 1, 0), Seq(18, 1, 0, 0), Seq(19, 1, 1, 0), Seq(20, 1, 1, 0),
      Seq(21, 1, 1, 0))),
    cs("FirstStartLastEndInvalidMissing", true, false, Seq(
      Seq(1, 1, 2, 0), Seq(2, 1, 2, 0), Seq(3, 1, 2, 0), Seq(4, 1, N, 0),
      Seq(5, 1, 2, 0), Seq(6, 1, N, 0), Seq(7, 1, 1, 1), Seq(8, 1, 1, 1),
      Seq(9, 1, N, 1), Seq(10, 1, 1, 1), Seq(11, 1, N, 1), Seq(12, 1, 2, 1),
      Seq(13, 1, 2, 1), Seq(14, 1, N, 1), Seq(15, 1, 2, 1), Seq(16, 1, N, 0),
      Seq(17, 1, 1, 0), Seq(18, 1, N, 0), Seq(19, 1, 1, 0), Seq(20, 1, 1, 0),
      Seq(21, 1, 1, 0))),
    cs("LastStartFirstEndValid", false, true, Seq(
      Seq(1, 1, 1, 0), Seq(2, 1, 1, 0), Seq(3, 1, 1, 0), Seq(4, 1, 0, 0),
      Seq(5, 1, 1, 0), Seq(6, 1, 0, 0), Seq(7, 1, 1, 1), Seq(8, 1, 0, 1),
      Seq(9, 1, 2, 1), Seq(10, 1, 0, 0), Seq(11, 1, 2, 0), Seq(12, 1, 0, 0),
      Seq(13, 1, 2, 0), Seq(14, 1, 2, 0), Seq(15, 1, 2, 0))),
    cs("LastStartFirstEndInvalid", false, true, Seq(
      Seq(1, 1, 2, 0), Seq(2, 1, 2, 0), Seq(3, 1, 2, 0), Seq(4, 1, 0, 0),
      Seq(5, 1, 2, 0), Seq(6, 1, 0, 0), Seq(7, 1, 1, 0), Seq(8, 1, 1, 0),
      Seq(9, 1, 0, 0), Seq(10, 1, 1, 1), Seq(11, 1, 0, 1), Seq(12, 1, 2, 1),
      Seq(13, 1, 2, 0), Seq(14, 1, 0, 0), Seq(15, 1, 2, 0), Seq(16, 1, 0, 0),
      Seq(17, 1, 1, 0), Seq(18, 1, 0, 0), Seq(19, 1, 1, 0), Seq(20, 1, 1, 0),
      Seq(21, 1, 1, 0))),
    cs("LastStartFirstEndInvalidMissing", false, true, Seq(
      Seq(1, 1, 2, 0), Seq(2, 1, 2, 0), Seq(3, 1, 2, 0), Seq(4, 1, N, 0),
      Seq(5, 1, 2, 0), Seq(6, 1, N, 0), Seq(7, 1, 1, 0), Seq(8, 1, 1, 0),
      Seq(9, 1, N, 0), Seq(10, 1, 1, 1), Seq(11, 1, N, 1), Seq(12, 1, 2, 1),
      Seq(13, 1, 2, 0), Seq(14, 1, N, 0), Seq(15, 1, 2, 0), Seq(16, 1, N, 0),
      Seq(17, 1, 1, 0), Seq(18, 1, N, 0), Seq(19, 1, 1, 0), Seq(20, 1, 1, 0),
      Seq(21, 1, 1, 0))),
    cs("LastStartLastEndValid", false, false, Seq(
      Seq(1, 1, 1, 0), Seq(2, 1, 1, 0), Seq(3, 1, 1, 0), Seq(4, 1, 0, 0),
      Seq(5, 1, 1, 0), Seq(6, 1, 0, 0), Seq(7, 1, 1, 1), Seq(8, 1, 0, 1),
      Seq(9, 1, 2, 1), Seq(10, 1, 0, 1), Seq(11, 1, 2, 1), Seq(12, 1, 0, 1),
      Seq(13, 1, 2, 1), Seq(14, 1, 2, 1), Seq(15, 1, 2, 1))),
    cs("LastStartLastEndInvalid", false, false, Seq(
      Seq(1, 1, 2, 0), Seq(2, 1, 2, 0), Seq(3, 1, 2, 0), Seq(4, 1, 0, 0),
      Seq(5, 1, 2, 0), Seq(6, 1, 0, 0), Seq(7, 1, 1, 0), Seq(8, 1, 1, 0),
      Seq(9, 1, 0, 0), Seq(10, 1, 1, 1), Seq(11, 1, 0, 1), Seq(12, 1, 2, 1),
      Seq(13, 1, 2, 1), Seq(14, 1, 0, 1), Seq(15, 1, 2, 1), Seq(16, 1, 0, 0),
      Seq(17, 1, 1, 0), Seq(18, 1, 0, 0), Seq(19, 1, 1, 0), Seq(20, 1, 1, 0),
      Seq(21, 1, 1, 0))),
    cs("LastStartLastEndInvalidMissing", false, false, Seq(
      Seq(1, 1, 2, 0), Seq(2, 1, 2, 0), Seq(3, 1, 2, 0), Seq(4, 1, N, 0),
      Seq(5, 1, 2, 0), Seq(6, 1, N, 0), Seq(7, 1, 1, 0), Seq(8, 1, 1, 0),
      Seq(9, 1, N, 0), Seq(10, 1, 1, 1), Seq(11, 1, N, 1), Seq(12, 1, 2, 1),
      Seq(13, 1, 2, 1), Seq(14, 1, N, 1), Seq(15, 1, 2, 1), Seq(16, 1, N, 0),
      Seq(17, 1, 1, 0), Seq(18, 1, N, 0), Seq(19, 1, 1, 0), Seq(20, 1, 1, 0),
      Seq(21, 1, 1, 0))))

  // ----------------------------------------------------- result-type cases
  // reference: :1202-1251; raw is compared via change-points only, valid via
  // change-points + zero-set (both are specified only up to relabeling).

  val resultTypeRaw = c1("ResultTypeRawIids", Seq(
    Seq(1, 1, 0, 0), Seq(2, 1, 1, 1), Seq(3, 1, 2, 1), Seq(4, 1, 0, 2),
    Seq(5, 1, 1, 3), Seq(6, 1, 0, 3), Seq(7, 1, 2, 3), Seq(8, 1, 0, 4),
    Seq(9, 1, 0, 4), Seq(10, 1, 1, 5), Seq(11, 1, 0, 5), Seq(12, 1, 2, 5),
    Seq(13, 1, 1, 6), Seq(14, 1, 2, 6)))
    .copy(resultType = ResultType.Raw)

  val resultTypeValid = c1("ResultTypeValidIids", Seq(
    Seq(1, 1, 2, 0), Seq(2, 1, 0, 0), Seq(3, 1, 2, 0), Seq(4, 1, 1, 5),
    Seq(5, 1, 0, 5), Seq(6, 1, 2, 5), Seq(7, 1, 0, 0), Seq(8, 1, 1, 4),
    Seq(9, 1, 2, 4), Seq(10, 1, 1, 9), Seq(11, 1, 0, 9), Seq(12, 1, 2, 9),
    Seq(13, 1, 1, 0), Seq(14, 1, 1, 0)))
    .copy(resultType = ResultType.Valid)
}
