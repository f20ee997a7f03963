package graft

import java.time.LocalDate
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.engine._

/** End-to-end orchestrator spec in the reference's golden-matrix style
  * (account_reports/tests/common.py assertLinesValues): a tiny journal,
  * expressions across four engines, two comparison periods → expected
  * value matrix. */
class ReportRunnerSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def fixture = {
    val s = spark; import s.implicits._
    // (date, account code, state, amount)
    Seq(
      ("2023-11-15", "101", "posted", 100.0), // prior period
      ("2024-01-10", "101", "posted", 10.0),
      ("2024-01-20", "101", "draft", 99.0),   // excluded by posted domain
      ("2024-02-05", "201", "posted", -30.0),
      ("2024-02-06", "301", "posted", 7.0),
      ("2025-03-01", "101", "posted", 1000.0) // next period
    ).toDF("d", "code", "state", "v")
      .withColumn("d", col("d").cast("timestamp"))
  }

  test("four engines, two column groups, aggregation resolved last") {
    val ctx = ReportRunner.Ctx(fixture, col("d"), col("code"), col("v"))
    val exprs = Seq(
      ReportRunner.Expr("POSTED.bal",
        ReportRunner.DomainSum(Seq(("state", "=", "posted")))),
      ReportRunner.Expr("ALLHIST.bal",
        ReportRunner.DomainSum(Seq(("state", "=", "posted"))),
        scope = DateScope.FromBeginning),
      // codes: prefix 1 and 2, 2 gated to credit (C)
      ReportRunner.Expr("CODES.bal", ReportRunner.CodesFormula("1 + 2C")),
      ReportRunner.Expr("RATIO.bal", ReportRunner.Aggregation(
        "100 * POSTED.bal / ALLHIST.bal",
        Seq(AggregationEvaluator.RoundTo(2)))))
    val groups = Seq(
      ReportRunner.ColumnGroup("p2024",
        LocalDate.of(2024, 1, 1), LocalDate.of(2024, 12, 31)),
      ReportRunner.ColumnGroup("p2023",
        LocalDate.of(2023, 1, 1), LocalDate.of(2023, 12, 31)))
    val out = ReportRunner.run(ctx, exprs, groups)

    // 2024: posted in range = 10 - 30 + 7 = -13; all history <= 2024-12-31
    // posted = 100 + 10 - 30 + 7 = 87; codes strict-range (draft counts,
    // domain not applied to codes engine): code 1* = 10+99, 2C = -30
    assert(out("p2024")("POSTED.bal") == -13.0)
    assert(out("p2024")("ALLHIST.bal") == 87.0)
    assert(out("p2024")("CODES.bal") == 79.0)
    assert(out("p2024")("RATIO.bal") == -14.94) // 100*-13/87 rounded
    // 2023: only the November posting
    assert(out("p2023")("POSTED.bal") == 100.0)
    assert(out("p2023")("ALLHIST.bal") == 100.0)
    assert(out("p2023")("CODES.bal") == 100.0)
    assert(out("p2023")("RATIO.bal") == 100.0)
  }

  test("external engine + toLines matrix") {
    val s = spark; import s.implicits._
    val ext = Seq(
      ("CARRY.bal", 5.0, "2024-01-31", 1L),
      ("CARRY.bal", 7.0, "2024-06-30", 2L))
      .toDF("expression_id", "value", "date", "value_id")
    val ctx = ReportRunner.Ctx(fixture, col("d"), col("code"), col("v"),
      external = Some(ext))
    val exprs = Seq(
      ReportRunner.Expr("SUMEXT.bal", ReportRunner.External("CARRY.bal")),
      ReportRunner.Expr("LASTEXT.bal",
        ReportRunner.External("CARRY.bal", mostRecent = true)))
    val groups = Seq(ReportRunner.ColumnGroup("p2024",
      LocalDate.of(2024, 1, 1), LocalDate.of(2024, 12, 31)))
    val out = ReportRunner.run(ctx, exprs, groups)
    assert(out("p2024")("SUMEXT.bal") == 12.0)
    assert(out("p2024")("LASTEXT.bal") == 7.0)
    val lines = ReportRunner.toLines(out, exprs, groups)
    assert(lines.map(l => (l.id, l.values)) ==
      Seq(("SUMEXT.bal", Seq(12.0)), ("LASTEXT.bal", Seq(7.0))))
  }
}
