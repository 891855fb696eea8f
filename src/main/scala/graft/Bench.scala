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
      .config("spark.sql.session.timeZone", "UTC")
      // Static conf, read at session creation. The default 100-entry
      // generated-class cache cannot hold a 136-query suite: every full
      // pass evicts everything, so every pass re-generates, re-Janino-
      // compiles, and re-JITs each query's codegen classes — the class
      // churn behind the round-10 late-alphabet sweep inflation (x9
      // 17.9 s in-sweep vs 4.3 s isolated at sf10, same code). 2048
      // entries hold all passes' classes for the foreseeable suite.
      .config("spark.sql.codegen.cache.maxEntries", "2048")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Steady-state measurement: one untimed pass first (JIT compilation,
    // codegen cache, parquet footers), then the timed pass. Both passes
    // execute every query fully.
    // optional args: restrict to the named queries (debugging aid)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.isEmpty || args.contains(n) }
    // Force EVERY output column to evaluate: a bare .count() lets Catalyst
    // prune the projections, so a pure-projection query (x1, x5, m1, ...)
    // would "benchmark" as an empty scan. Hashing the full row into one
    // aggregated sum defeats pruning at ~a hash per row of overhead.
    def consume(df: org.apache.spark.sql.DataFrame): Unit = {
      import org.apache.spark.sql.functions._
      // bit_xor, not sum: full-range hash longs overflow an ANSI sum
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("__h"))
        .agg(expr("bit_xor(__h)")).collect()
      ()
    }
    // No clearCache between queries: library operators are contractually
    // leak-free (DedupSpec asserts zero residual persisted RDDs), so a
    // shared session accumulates no storage across calls.
    // A query that fails COLD must be visible here, not silently deferred
    // to the timed pass — print the exception before swallowing it.
    ordered.foreach { case (name, fn) =>
      try { consume(fn(spark, sfDir)) } catch {
        case e: Throwable =>
          System.err.println(s"[warmup] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    // Per-query repeat-and-median (k from SPARK_GRAFT_BENCH_REPEATS,
    // default 3): a single timing in a long-lived shared JVM rides GC /
    // recompilation spikes — recorded totals once swung 710 -> 1097 s
    // round-over-round with ZERO code change. The median of 3 is immune
    // to any single spike, making the JSON comparable across rounds.
    // A query that THROWS records -1 (an impossible duration — the
    // failure marker in the JSON) rather than its milliseconds-to-crash
    // masquerading as a fast success: at 10x scale an OOM is exactly the
    // regression class this run exists to catch, so it must not read as
    // a speedup.
    val repeats = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "3").toInt)
    // Drain accumulated session state between queries: Spark's
    // ContextCleaner frees shuffle files / broadcasts only when a GC
    // processes their weak references, and with a large heap a GC may
    // simply never happen — after the 55-query warmup pass the timed
    // pass then runs against tens of GB of undead shuffle state (d1
    // measured 13 s in the full suite vs 0.5 s isolated; d2 26 s vs
    // 2.1 s — pure pollution, not query cost). An explicit GC after
    // every query keeps each measurement starting from a drained JVM,
    // the same state an isolated run sees.
    // SPARK_GRAFT_BENCH_DRAIN=0 disables the inter-rep GC (A/B-ing the
    // drain's own cost); default on — honest numbers beat fast ones.
    val drainOn = sys.env.getOrElse("SPARK_GRAFT_BENCH_DRAIN", "1") != "0"
    def drain(): Unit =
      if (drainOn) { System.gc(); Thread.sleep(50); System.gc() }
    // JVM-health telemetry, printed after every pass: code-heap and
    // metaspace occupancy. The round-10 sweep inflated late-alphabet
    // queries 2-5x with untouched code (x9 17.9 s in-sweep vs 4.3 s
    // isolated); this line is what turns the next such episode from a
    // guessing game into a read-off — a near-full CodeHeap or a
    // metaspace ramp across passes IS the diagnosis.
    def jvmHealth(tag: String): Unit = {
      import scala.jdk.CollectionConverters._
      val pools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(p => p.getName.startsWith("CodeHeap") || p.getName == "Metaspace")
      val s = pools.map { p =>
        val u = p.getUsage
        f"${p.getName}=${u.getUsed / 1048576}%d/${math.max(u.getMax, u.getCommitted) / 1048576}%dMB"
      }.mkString(" ")
      System.err.println(s"[jvm] $tag $s")
      // Hard gate, not telemetry: the round-10 sweep silently inflated
      // late-alphabet queries 2-5x when the JIT code cache thrashed.
      // Occupancy >90% of a CodeHeap's reserved max means the NEXT such
      // episode is underway — fail the whole bench loudly (rc!=0, driver
      // records the failure) rather than publish numbers that measure
      // deoptimized re-JIT churn instead of the queries.
      pools.filter(p => p.getName.startsWith("CodeHeap") && p.getUsage.getMax > 0)
        .foreach { p =>
          val u = p.getUsage
          val frac = u.getUsed.toDouble / u.getMax
          if (frac > 0.90)
            throw new IllegalStateException(
              f"[jvm] $tag ${p.getName} at ${frac * 100}%.1f%% of reserved max — " +
                "bench numbers would measure code-cache thrash, not queries; aborting")
        }
    }
    def timedPass(dir: String, tag: String): Seq[(String, Double)] = {
      val out = ordered.map { case (name, fn) =>
        // drain before EVERY rep, not just per query: a shuffle-heavy
        // query's reps otherwise stack tens of GB of not-yet-collected
        // shuffle files inside one median block (d3's median read 86 s
        // in a full run vs 11-13 s isolated; disk pressure, not compute)
        val times = (1 to repeats).map { i =>
          drain()
          val t0 = System.nanoTime()
          val ok = try { consume(fn(spark, dir)); true } catch {
            case e: Throwable =>
              System.err.println(s"[$tag] $name rep $i FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
              false
          }
          if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        }
        val sec = if (times.contains(-1.0)) -1.0 else times.sorted.apply(times.size / 2)
        System.err.println(f"[$tag] $name%-22s $sec%8.2f s  (reps ${times.map(t => f"$t%.2f").mkString("/")})")
        name -> sec
      }
      jvmHealth(tag)
      out
    }
    def toJson(r: Seq[(String, Double)]): String =
      r.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // A total must sum only queries that RAN: -1.0 failure sentinels would
    // otherwise silently subtract from it (round 8's recorded 37.1 s was
    // really 46.1 s over the live queries — nine -1.0s hid 9 s). The
    // failure count is emitted alongside so a "fast" total with failures
    // can never read as a clean win.
    def liveTotal(r: Seq[(String, Double)]): Double = r.map(_._2).filter(_ >= 0).sum
    def nFailed(r: Seq[(String, Double)]): Int = r.count(_._2 < 0)
    // Isolated re-timing for the heavy tail: a long shared-JVM sweep
    // inflates its most expensive queries ~1.5-2x through accumulated GC
    // pressure even with the codegen-cache and drain fixes (d15 measured
    // 38 s isolated vs 60.8 s in-sweep at sf10, a23 59 vs 67.3 — same
    // code, same data). For any query whose sweep median exceeds the
    // threshold, re-run it in a FRESH child JVM (same flags as this one,
    // cloned from RuntimeMXBean) and record BOTH numbers, so the JSON's
    // heavy tail measures the operator, not the suite. Bounded to the
    // top `isoMax` offenders; the child runs Bench restricted to the one
    // query with isolation and extra scales disabled (no recursion).
    val isoThreshold = sys.env.getOrElse("SPARK_GRAFT_BENCH_ISO_SEC", "10").toDouble
    val isoMax = sys.env.getOrElse("SPARK_GRAFT_BENCH_ISO_MAX", "10").toInt
    val isoOn = sys.env.getOrElse("SPARK_GRAFT_BENCH_ISOLATE", "1") != "0" && isoMax > 0
    def isolatedRerun(passResults: Seq[(String, Double)], dir: String, tag: String): Seq[(String, Double)] = {
      if (!isoOn) return Seq.empty
      val heavy = passResults.filter(_._2 > isoThreshold).sortBy(-_._2).take(isoMax)
      heavy.flatMap { case (name, sweepSec) =>
        val rt = java.lang.management.ManagementFactory.getRuntimeMXBean
        import scala.jdk.CollectionConverters._
        val javaBin = new java.io.File(new java.io.File(sys.props("java.home"), "bin"), "java").getPath
        val tmp = java.nio.file.Files.createTempFile("graft_iso_", ".json")
        val cmd = (Seq(javaBin) ++ rt.getInputArguments.asScala.filterNot(_.startsWith("-agentlib"))
          ++ Seq("-cp", sys.props("java.class.path"), "graft.Bench", name)).asJava
        val pb = new ProcessBuilder(cmd)
        pb.environment().put("SPARK_GRAFT_SF_DIR", dir)
        pb.environment().put("SPARK_GRAFT_BENCH_ISOLATE", "0")
        pb.environment().put("SPARK_GRAFT_BENCH_SCALES", "sf")
        pb.environment().put("SPARK_GRAFT_BENCH_OUT", tmp.toString)
        pb.redirectErrorStream(false)
        pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
        pb.redirectError(ProcessBuilder.Redirect.DISCARD)
        val rc = try pb.start().waitFor() catch { case _: Exception => -1 }
        val iso = if (rc != 0) None else {
          val txt = try new String(java.nio.file.Files.readAllBytes(tmp),
            java.nio.charset.StandardCharsets.UTF_8) catch { case _: Exception => "" }
          val re = ("\"" + java.util.regex.Pattern.quote(name) + "\":(-?[0-9.]+)").r
          re.findFirstMatchIn(txt).map(_.group(1).toDouble)
        }
        try java.nio.file.Files.deleteIfExists(tmp) catch { case _: Exception => () }
        iso match {
          case Some(s) =>
            System.err.println(f"[$tag-iso] $name%-22s sweep $sweepSec%.2f s -> isolated $s%.2f s")
            Some(name -> s)
          case None =>
            System.err.println(s"[$tag-iso] $name isolated rerun failed (rc=$rc) — keeping sweep number only")
            None
        }
      }
    }
    val results = timedPass(sfDir, "bench")
    val total = liveTotal(results)
    val iso0 = isolatedRerun(results, sfDir, "bench")
    val isoJson0 = if (iso0.isEmpty) "" else s""","isolated_queries":${toJson(iso0)}"""
    // Extra-scale passes are OPT-IN: at 220+ queries a 3-scale sweep runs
    // ~1.6 h, past the driver's bench budget — round 11's official record
    // came back rc=124/parsed:null because these passes ran by default
    // whenever benchdata/ existed. The default invocation now lands
    // warmup + the sf0.1 timed pass only; the builder's own 3-scale
    // record sets SPARK_GRAFT_BENCH_SCALES=all (in tmux). A present-but-
    // skipped scale is declared in the JSON so the skip is loud.
    val scales = sys.env.getOrElse("SPARK_GRAFT_BENCH_SCALES", "sf")
    def scaleWanted(s: String) = scales == "all" || scales.split(",").map(_.trim).contains(s)
    var skipped = List.empty[String]
    // 10x scale check (replicated sf1 dataset, built by graft.ScaleData
    // from sf0.1): catches constant-factor and superlinear-scaling
    // regressions the sf0.1 numbers alone cannot see (e.g. the quartile-
    // sketch merge: 3.4 s at sf0.1 but 99 s at sf1 before replacement).
    val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "benchdata/sf1")
    val sf1 = if (!new java.io.File(sf1Dir).isDirectory) "" else if (!scaleWanted("sf1")) {
      skipped ::= "sf1"; ""
    } else {
      val r1 = timedPass(sf1Dir, "bench-sf1")
      val i1 = isolatedRerun(r1, sf1Dir, "bench-sf1")
      val ij = if (i1.isEmpty) "" else s""","sf1_isolated_queries":${toJson(i1)}"""
      s""","sf1_total":${liveTotal(r1)},"sf1_failed":${nFailed(r1)},"sf1_queries":${toJson(r1)},"sf1_dir":"$sf1Dir"$ij"""
    }
    // 100x scale check, same per-rep drain + median discipline as every
    // other pass. SPARK_GRAFT_SF10=0 additionally skips it even when the
    // scale is requested (quick 2-scale iterations).
    val sf10Dir = sys.env.getOrElse("SPARK_GRAFT_SF10_DIR", "benchdata/sf10")
    val sf10 = if (!new java.io.File(sf10Dir).isDirectory
        || sys.env.getOrElse("SPARK_GRAFT_SF10", "1") == "0") "" else if (!scaleWanted("sf10")) {
      skipped ::= "sf10"; ""
    } else {
      val r10 = timedPass(sf10Dir, "bench-sf10")
      val i10 = isolatedRerun(r10, sf10Dir, "bench-sf10")
      val ij = if (i10.isEmpty) "" else s""","sf10_isolated_queries":${toJson(i10)}"""
      s""","sf10_total":${liveTotal(r10)},"sf10_failed":${nFailed(r10)},"sf10_queries":${toJson(r10)},"sf10_dir":"$sf10Dir"$ij"""
    }
    val skippedJson = if (skipped.isEmpty) "" else
      s""","skipped_scales":"${skipped.sorted.mkString(",")}""""
    val json = s"""{"metric":"total","value":$total,"unit":"sec","failed":${nFailed(results)},"queries":${toJson(results)},"sf":"$sfDir"$isoJson0$sf1$sf10$skippedJson}"""
    // Persist the full JSON to a file — the durable record for
    // round-over-round per-query comparison.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: java.io.IOException =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}") }
    // stop() BEFORE the JSON println: the driver machine-parses the LAST
    // stdout line (BENCH_r07/r08 recorded "parsed": null), and Spark's
    // shutdown can emit stray stdout after our print if it runs last.
    // Under sbt even that is not enough — sbt appends its own
    // "[success] Total time: …" footer as the true last line — so the
    // JSON is ALSO printed with a grep-able marker prefix: a driver that
    // misses the last-line parse can recover it via `grep ^BENCH_JSON:`.
    spark.stop()
    println("BENCH_JSON: " + json)
    println(json)
  }
}
