package graft.etl

import java.nio.file.Files

import graft.SparkSpec
import graft.model.RawProduct

/** End-to-end orchestration parity with `/root/reference/main.py:26-109`
  * and the sink-skip semantics of `utils/load.py:269-324`. */
class PipelineSpec extends SparkSpec {

  private def rawFixture = {
    import spark.implicits._
    Seq(
      RawProduct("Test Product", "$99.99", "4.5 / 5", "3 Colors", "Size: M", "Gender: Unisex", "2023-10-01"),
      RawProduct("Unknown Product", "N/A", "N/A", "Unknown Colors", "", "", "2023-10-01")
    ).toDF()
  }

  test("full run: extract → transform → csv sink → summary") {
    val out = Files.createTempDirectory("graft_pipe").resolve("csv").toString
    val plan = Pipeline.planSinks(csvPath = Some(out))
    val outcome = Pipeline.run(rawFixture, plan)
    outcome match {
      case l: Pipeline.Loaded =>
        assert(l.success && l.rows == 1)
        val s = Pipeline.summary(outcome, plan)
        assert(s("csv") == out && s("rows") == "1")
      case other => fail(s"unexpected $other")
    }
    assert(spark.read.option("header", "true").csv(out).count() == 1)
  }

  test("empty extract aborts (main.py:32-34)") {
    import spark.implicits._
    val plan = Pipeline.planSinks(csvPath = Some("/tmp/unused"))
    assert(Pipeline.run(Seq.empty[RawProduct].toDF(), plan) == Pipeline.EmptyExtract)
  }

  test("all-dirty input aborts after transform (main.py:40-42)") {
    import spark.implicits._
    val dirty = Seq(RawProduct("Unknown Product", "N/A", "N/A", "", "", "", "x")).toDF()
    val plan = Pipeline.planSinks(csvPath = Some("/tmp/unused2"))
    assert(Pipeline.run(dirty, plan) == Pipeline.EmptyTransform)
  }

  test("incomplete sink configs are skipped with a notice (load.py:269-314)") {
    val out = Files.createTempDirectory("graft_pipe_skip").resolve("csv").toString
    val plan = Pipeline.planSinks(csvPath = Some(out),
      jdbcUrl = Some("jdbc:x"), jdbcTable = None, sheetsCredentials = Some("creds.json"))
    assert(plan.sinks.map(_.name) == Seq("csv"))
    val s = Pipeline.summary(Pipeline.run(rawFixture, plan), plan)
    assert(s.contains("postgres_skipped") && s.contains("sheets_skipped"))
    assert(s("csv") == out)
  }
}
