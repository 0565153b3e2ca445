package graft.engine.export

import graft.SparkSpec
import java.nio.file.Files

class ExportServiceSpec extends SparkSpec {
  import ExportService._
  import spark.implicits._

  private def setup(clock: () => Long = () => System.currentTimeMillis()) = {
    val resultDir = Files.createTempDirectory("graft-res").toString
    val exportDir = Files.createTempDirectory("graft-exp").toString
    // materialize a fake finished query result
    Seq((1, "x"), (2, "y")).toDF("k", "v")
      .write.option("header", "true").csv(s"$resultDir/q1")
    val svc = new ExportService(spark, id => s"$resultDir/$id", exportDir, clock)
    (svc, resultDir, exportDir)
  }

  test("export lifecycle: QUEUED -> DONE, artifact exists, idempotent DONE") {
    val (svc, _, _) = setup()
    val st0 = svc.export("q1", "tsv")
    assert(st0 == Queued || st0 == Processing || st0.isInstanceOf[Done])
    val done = svc.await("q1", "tsv").asInstanceOf[Done]
    assert(new java.io.File(done.path).isFile)
    // second call hits the idempotency probe immediately
    assert(svc.export("q1", "tsv").isInstanceOf[Done])
  }

  test("all seven formats export the same result") {
    val (svc, _, _) = setup()
    for (f <- Exporters.SupportedFormats) {
      svc.export("q1", f)
      assert(svc.await("q1", f).isInstanceOf[Done], s"format $f")
    }
  }

  test("missing source -> FAILED, locked for 60s, retryable after") {
    var now = 1000000L
    val (svc, _, _) = setup(() => now)
    svc.export("missing", "csv")
    val f = svc.await("missing", "csv")
    assert(f.isInstanceOf[Failed])
    // within lockout: still FAILED, no new attempt
    assert(svc.export("missing", "csv") == f)
    // after lockout: retried (QUEUED again)
    now += FailedRetryLockoutMillis + 1
    val retried = svc.export("missing", "csv")
    assert(retried == Queued || retried == Processing || retried.isInstanceOf[Failed])
    assert(retried != f)
  }

  test("unsupported format rejected synchronously") {
    val (svc, _, _) = setup()
    intercept[IllegalArgumentException] { svc.export("q1", "pdf") }
  }
}
