package graft

class PipelineCliSpec extends SparkSpec {

  private def T(s: String) = java.sql.Timestamp.valueOf(s)

  test("parse: reference semantics (-d xor -t, typed errors)") {
    assert(PipelineCli.parse(Seq("--input", "i", "--output", "o", "-d", "31"))
      .exists(_.backprocessDays === Some(31)))
    assert(PipelineCli.parse(Seq("--input", "i", "--output", "o",
      "-t", "2024-01-01T00:00:00")).exists(_.fromDatetime === Some(T("2024-01-01 00:00:00"))))
    assert(PipelineCli.parse(Seq("--input", "i", "--output", "o",
      "-d", "5", "-t", "2024-01-01T00:00:00"))
      .left.exists(_.contains("Cannot use -d and -t")))
    assert(PipelineCli.parse(Seq("--input", "i", "--output", "o", "-d", "x"))
      .left.exists(_.contains("-d must be an integer")))
    assert(PipelineCli.parse(Seq("--input", "i", "--output", "o", "-d", "-3"))
      .left.exists(_.contains("negative")))
    assert(PipelineCli.parse(Seq("--output", "o"))
      .left.exists(_.contains("required")))
    assert(PipelineCli.parse(Seq("--input", "i", "--output", "o", "--bogus"))
      .left.exists(_.contains("unknown argument")))
  }

  test("resolveBackprocessDays: default 365, -t derives from now") {
    val now = T("2024-02-01 00:00:00")
    assert(PipelineCli.resolveBackprocessDays(
      PipelineCli.Config(input = "i", output = "o"), now) === Right(365))
    assert(PipelineCli.resolveBackprocessDays(
      PipelineCli.Config(input = "i", output = "o",
        fromDatetime = Some(T("2024-01-01 00:00:00"))), now) === Right(32))
  }
}
