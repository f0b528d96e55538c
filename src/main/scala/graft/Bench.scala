package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): one JSON line with per-query and
  * total seconds at `SPARK_GRAFT_SF_DIR`.
  *
  * Each query executes FULLY via the `noop` sink — a bare `.count()` would
  * let Catalyst prune the projections/sorts and time a row-count instead of
  * the operator. A warm-up pass at sf0.001 first JIT-compiles the generated
  * code paths so the timed numbers measure the operators, not compilation.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String, dir: String): Boolean =
      try {
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        true
      } catch { case _: Throwable => false }

    val names = SparkEntry.queries.keys.toSeq.sorted
    // warm-up: JIT + codegen caches, small scale
    names.foreach(runOnce(_, "/root/testdata/sf0.001"))

    // min over trials: single-run numbers at sf0.1 swing ±30% from page
    // cache / JIT / GC noise; the minimum is the standard noise-robust
    // estimator of the query's actual cost
    val trials = math.max(1,
      sys.env.get("SPARK_GRAFT_TRIALS").flatMap(_.toIntOption).getOrElse(2))
    val results = names.map { name =>
      val runs = (1 to trials).map { _ =>
        val t0 = System.nanoTime()
        val ok = runOnce(name, sfDir)
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      (name, runs.map(_._1), runs.forall(_._2))
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v.min }
      .mkString("{", ",", "}")
    // per-trial times alongside the min: a cross-round swing on one query
    // is only diagnosable if the trial-to-trial variance is visible (a
    // noisy min and a shifted distribution look identical otherwise)
    val ts = results.map { case (k, v, _) =>
      "\"" + k + "\":" + v.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.map(_._2.min).sum
    // a crashed query must be visible, not just a suspiciously fast time
    val errs = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"trials":$ts,"errors":$errs,"sf":"$sfDir"}"""
    println(line)
    // also land the line in a file so a truncated stdout tail can never
    // ship a round with parsed:null bench artifacts
    val outFile = args.headOption.getOrElse("/tmp/graft_bench.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), line + "\n")
    spark.stop()
  }
}
