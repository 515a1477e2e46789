package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: one scan+noop initializes parquet reader, codegen
    // compiler and shuffle infra so the (otherwise arbitrary) first
    // measured query doesn't absorb one-time session costs.
    try spark.read.parquet(s"$sfDir/nation.parquet")
      .write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => () }
    // The committed-medallion build (pipeline UPDATE) is timed as its OWN
    // entry rather than letting whichever gold query runs first absorb it:
    // in the lakehouse model the refresh is paid once per data generation
    // and the consumption queries (g6/g9) measure the committed-table READ
    // path. The build cost stays visible in the total — it is reported,
    // not hidden. On a warm warehouse (fingerprint match) this is ~0.
    val buildT0 = System.nanoTime()
    val buildEntry =
      try { graft.olist.OlistMaterialized.ensure(spark, sfDir)
            "g0_medallion_build" -> (System.nanoTime() - buildT0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] medallion build FAILED: $e")
        "g0_medallion_build" -> -((System.nanoTime() - buildT0) / 1e9) }
    // format("noop") fully evaluates every output column (unlike count(),
    // under which Catalyst prunes unevaluated projections) without the
    // parquet-encode cost distorting per-query times. Queries run in
    // name order so per-query numbers are comparable across rounds.
    // A failed query is reported as a NEGATIVE elapsed time and listed in
    // "errors" — a regression that breaks a query must never read as a
    // speedup.
    //
    // Each query is timed `runs` times and the MINIMUM is reported: a
    // single cold run is dominated by per-stage codegen/JIT at this
    // scale (r4 saw unchanged queries swing 1.2s <-> 6-9s with the JIT
    // warmup lottery), so the min-of-3 warm figure is the one that
    // tracks actual plan changes round over round.
    val runs = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    // Local-iteration filter (comma-separated name prefixes). The driver
    // never sets it, so full-catalog behavior is unchanged.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(_.exists(n.startsWith)) }
    val results = buildEntry +: selected.map { case (name, fn) =>
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      while (times.lastOption.forall(_ >= 0) && times.length < runs) {
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: $e"); false }
        val dt = (System.nanoTime() - t0) / 1e9
        times += (if (ok) dt else -dt)   // stop repeating on first failure
      }
      name -> (if (times.last < 0) times.last else times.min)
    }
    // The driver records only the LAST 2000 chars of stdout and parses the
    // final line as JSON. The full per-query map (146 names summing to
    // >2100 chars alone) can never fit that window, so:
    //   1. The FULL JSON goes to files: target/bench.json (plus
    //      BENCH_LATEST.json in the repo root, which round snapshots
    //      commit, and /tmp/graft_bench.json as an absolute-path fallback).
    //   2. stdout ends with ONE COMPACT line, guaranteed under the window:
    //      totals + every error + the slowest queries that fit + the count
    //      and max time of the omitted (all-fast) remainder.
    // `showSuccess := false` in build.sbt keeps sbt from appending a
    // "[success]" trailer after this line.
    def ms(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val errors = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map { case (_, v) => math.abs(v) }.sum
    def render(entries: Seq[(String, Double)], extra: String): String = {
      val qs = entries.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + ms(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","runs":$runs,"sf":"$sfDir","errors":$errors$extra,"queries":$qs}"""
    }
    val fullJson = render(results, ""","n":""" + results.length)
    for (path <- Seq("target/bench.json", "BENCH_LATEST.json",
                     sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft_bench.json"))) {
      try {
        val p = java.nio.file.Paths.get(path).toAbsolutePath
        if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.writeString(p, fullJson + "\n")
        System.err.println(s"[bench] full json written to $p")
      } catch { case e: Throwable =>
        System.err.println(s"[bench] could not write $path: $e") }
    }
    // Compact line: keep every failed entry, then add passing entries
    // slowest-first while the rendered line stays under the budget.
    val budget = 1800
    val failed = results.filter(_._2 < 0)
    val passing = results.filter(_._2 >= 0).sortBy(-_._2)
    var kept = failed ++ passing.take(1)
    var i = 1
    def extraFor(k: Seq[(String, Double)]): String = {
      val omitted = results.filterNot(r => k.exists(_._1 == r._1))
      val omax = if (omitted.isEmpty) 0.0 else omitted.map(r => math.abs(r._2)).max
      s""","n":${results.length},"omitted":${omitted.length},"omitted_max_sec":${ms(omax)},"full":"target/bench.json BENCH_LATEST.json""""
    }
    while (i < passing.length &&
           render(kept :+ passing(i), extraFor(kept :+ passing(i))).length < budget) {
      kept = kept :+ passing(i); i += 1
    }
    val compact = render(kept, extraFor(kept))
    spark.stop()
    println(compact)
  }
}
