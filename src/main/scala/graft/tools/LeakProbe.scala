package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 diagnostic main — the harness that FOUND the iterative-kernel
  * retention defect (SCALE.md §"Round-17 retention defect"): retired round
  * frames stayed strongly reachable (+1 persistent RDD per round, shuffle
  * files never reclaimed) because the pre-fix roundBarrier wrapped
  * `queryExecution.toRdd`, whose un-truncated wrapper RDDs cache
  * pre-checkpoint partition arrays, and sort-merge-join partitions
  * (ZippedPartitionsPartition.rdds) capture parent RDD REFERENCES —
  * chaining every round past lineage truncation. Diagnosed by driving the
  * real SCC kernel (mode=scc) with per-round persistent-RDD telemetry,
  * then a `jmap -dump:live` heap dump walked by an HPROF GC-root-path
  * parser; replication modes below stayed flat because under
  * ~10 MB frames AQE picks broadcast joins, which create no zipped
  * partitions — the defect only bites past the broadcast threshold.
  *
  * LEAKPROBE_MODE:
  *   rdd    — raw RDD loop: map → localCheckpoint() → count (the pattern
  *            Spark's cleaner is documented to handle)
  *   plain  — Dataset loop: select+groupBy → localCheckpoint(false) → count
  *   eager  — same with localCheckpoint(true)
  *   reset  — the engine's roundBarrier (localCheckpoint + resetStats)
  *   flood  — classMergeMapping's pointer-jump round shape
  *   bw/bw2 — the SCC backward flood's exact round shape (+kernel context)
  *   scc    — the REAL kernel at 3·10⁵ with telemetry + live heap dump
  * Not part of the driver contract — a measurement main. */
object LeakProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val mode = sys.env.getOrElse("LEAKPROBE_MODE", "reset")
    val rounds = sys.env.getOrElse("LEAKPROBE_ROUNDS", "24").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext

    // LEAKPROBE_GC=conf relies solely on the roundBarrier gcEveryRounds
    // hook (single bare System.gc(), no settle time); default = explicit
    // double GC + settle, the known-sufficient reclaim cadence
    val confGcOnly = sys.env.get("LEAKPROBE_GC").contains("conf")
    if (confGcOnly) spark.conf.set("spark.graft.iter.gcEveryRounds", "1")
    def report(r: Int): Unit = {
      if (!confGcOnly) { System.gc(); Thread.sleep(200); System.gc(); Thread.sleep(200) }
      println(s"LEAKPROBE mode=$mode round=$r rdds=${sc.getPersistentRDDs.size}")
    }

    if (mode == "scc") {
      // the real kernel at reduced scale (RoundLog prints rdds= per round)
      spark.conf.set("spark.graft.bench.roundLog", "true")
      // discriminating switches for the round-17 pin diagnosis
      sys.env.get("LEAKPROBE_AQE").foreach(v =>
        spark.conf.set("spark.sql.adaptive.enabled", v))
      sys.env.get("LEAKPROBE_CODEGEN").foreach(v =>
        spark.conf.set("spark.sql.codegen.wholeStage", v))
      def shuffleCount: Int = try {
        val tracker = org.apache.spark.SparkEnv.get.mapOutputTracker
        val f = tracker.getClass.getDeclaredField("shuffleStatuses")
        f.setAccessible(true)
        f.get(tracker).asInstanceOf[scala.collection.concurrent.Map[_, _]].size
      } catch { case _: Throwable => -1 }
      @volatile var liveBfsDone = false
      val dumper = new Thread(() => {
        while (true) {
          val pinnedPairs = sc.getPersistentRDDs.toSeq.sortBy(_._1)
          val pinned = pinnedPairs.map(_._1)
          println(s"LEAKPROBE weakMap=${pinned.size} " +
            s"storageInfo=${sc.getRDDStorageInfo.length} " +
            s"shuffles=$shuffleCount ids=${pinned.mkString(",")}")
          try {
            val cm = spark.sharedState.cacheManager
            val f = cm.getClass.getDeclaredField("cachedData")
            f.setAccessible(true)
            val entries = f.get(cm).asInstanceOf[scala.collection.IndexedSeq[AnyRef]]
            println(s"LEAKPROBE cacheManager entries=${entries.size}")
            entries.foreach { cd =>
              val planM = cd.getClass.getDeclaredMethod("plan")
              val relM = cd.getClass.getDeclaredMethod("cachedRepresentation")
              val plan = planM.invoke(cd)
              val rel = relM.invoke(cd)
              val cbF = rel.getClass.getDeclaredMethod("cacheBuilder")
              val cb = cbF.invoke(rel)
              val bufF = cb.getClass.getDeclaredField("_cachedColumnBuffers")
              bufF.setAccessible(true)
              val buf = bufF.get(cb)
              val bufId = if (buf == null) -1
                else buf.asInstanceOf[org.apache.spark.rdd.RDD[_]].id
              println(s"LEAKPROBE cm-entry bufId=$bufId plan=" +
                plan.toString.linesIterator.take(2).mkString(" | ").take(160))
            }
          } catch { case e: Throwable =>
            println(s"LEAKPROBE cacheManager inspect failed: $e") }
          if (!liveBfsDone && pinned.size >= 20) {
            liveBfsDone = true
            // dead targets: the recent-but-not-newest checkpoint band,
            // minus any CacheManager buffer ids (legit-live)
            val bufIds = try {
              val cm = spark.sharedState.cacheManager
              val f = cm.getClass.getDeclaredField("cachedData")
              f.setAccessible(true)
              f.get(cm).asInstanceOf[scala.collection.IndexedSeq[AnyRef]].flatMap { cd =>
                val relM = cd.getClass.getDeclaredMethod("cachedRepresentation")
                val rel = relM.invoke(cd)
                val cb = rel.getClass.getDeclaredMethod("cacheBuilder").invoke(rel)
                val bufF = cb.getClass.getDeclaredField("_cachedColumnBuffers")
                bufF.setAccessible(true)
                Option(bufF.get(cb)).map(_.asInstanceOf[org.apache.spark.rdd.RDD[_]].id)
              }.toSet
            } catch { case _: Throwable => Set.empty[Int] }
            val dead = pinned.dropRight(3).takeRight(8).filterNot(bufIds.contains)
            println(s"LEAKPROBE dump deadIds=${dead.mkString(",")} bufIds=${bufIds.mkString(",")}")
            val pid = ProcessHandle.current().pid()
            new ProcessBuilder("jmap", s"-dump:live,format=b,file=/tmp/leak.hprof",
              pid.toString).inheritIO().start().waitFor()
            println("LEAKPROBE dump done")
          }
          Thread.sleep(5000)
        }
      })
      dumper.setDaemon(true)
      dumper.start()
      val n = 300000L
      val v = spark.range(n).select(col("id"), lit("v").as("label"))
      val chain = spark.range(n - 1).select(col("id"), col("id").as("src"),
        (col("id") + 1L).as("dst"), lit("e").as("label"))
      val rand = spark.range(n / 2).select((col("id") + 3000000000L).as("id"),
        col("id").as("src"),
        pmod(col("id") * lit(2654435761L) + lit(12345L), lit(n)).as("dst"),
        lit("e").as("label"))
      val g = graft.data.PropertyGraph(graft.core.GraphSchema(), v,
        chain.unionByName(rand).filter(col("src") =!= col("dst")))
      graft.olap.Analytics.stronglyConnectedComponents(g,
        maxOuter = 1, maxTrim = 2, maxInner = 16)
        .agg(count(lit(1))).head
      report(0)
      // ground truth: BFS the driver object graph from Spark's global
      // roots to a pinned mid-bw checkpoint RDD and print the ref path
      val pinned = sc.getPersistentRDDs.toSeq.sortBy(_._1)
      val target = pinned(pinned.size / 2)._2 // median id = a dead bw frame
      println(s"LEAKPROBE target rdd id=${pinned(pinned.size / 2)._1}")
      // dump one stack per stuck pool family
      locally {
        import scala.jdk.CollectionConverters._
        val all = Thread.getAllStackTraces.asScala
        for (fam <- Seq("broadcast", "QueryStage")) {
          val fams = all.filter(_._1.getName.contains(fam))
          val idle = fams.count(_._2.exists(_.toString.contains("getTask")))
          println(s"LEAKPROBE $fam count=${fams.size} idlePoll=$idle " +
            s"states=${fams.groupBy(_._1.getState).map(kv => s"${kv._1}:${kv._2.size}").mkString(",")}")
          fams.find(!_._2.exists(_.toString.contains("getTask"))).foreach { case (t, st) =>
            println(s"LEAKPROBE busy thread ${t.getName} state=${t.getState}")
            st.take(30).foreach(e => println(s"    at $e"))
          }
        }
      }
      HeapPath.find(LeakRoots.all(spark, sc), target) match {
        case Some(path) => println(s"LEAKPROBE path:\n  ${path.mkString("\n  ")}")
        case None => println("LEAKPROBE path: NOT FOUND from these roots")
      }
    } else if (mode == "bw") {
      // the SCC backward flood's exact round shape: dual-pointer frame,
      // three self-joins (two keyed on the computed b/s columns), one agg
      val und = spark.range(200000L)
        .select(col("id").as("src"), ((col("id") + 7L) % 200000L).as("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      und.count()
      var rb = spark.range(200000L)
        .select(col("id"), col("id").as("b"), col("id").as("s"))
        .transform(graft.olap.Analytics.roundBarrier)
      for (r <- 1 to rounds) {
        val m = und
          .join(rb.select(col("id").as("dst"), col("b").as("__bd"),
            col("s").as("__sd")), Seq("dst"))
          .groupBy(col("src"))
          .agg(min(col("__bd")).as("__bm"), max(col("__sd")).as("__sm"))
        val stepped = rb.join(m.select(col("src").as("id"), col("__bm"), col("__sm")),
            Seq("id"), "left")
          .select(col("id"),
            least(col("b"), coalesce(col("__bm"), col("b"))).as("b"),
            greatest(col("s"), coalesce(col("__sm"), col("s"))).as("s"))
        val viaS = stepped
          .join(rb.select(col("id").as("__j1"), col("b").as("__b1"),
            col("s").as("__s1")), col("s") === col("__j1"), "left")
          .select(col("id"),
            least(col("b"), coalesce(col("__b1"), col("b"))).as("b"),
            greatest(col("s"), coalesce(col("__s1"), col("s"))).as("s"))
        val viaB = viaS
          .join(rb.select(col("id").as("__j2"), col("b").as("__b2"),
            col("s").as("__s2")), col("b") === col("__j2"), "left")
          .select(col("id"),
            least(col("b"), coalesce(col("__b2"), col("b"))).as("b"),
            greatest(col("s"), coalesce(col("__s2"), col("s"))).as("s"))
          .transform(graft.olap.Analytics.roundBarrier)
        viaB.agg(sum(col("b").cast("decimal(38,0)")),
          sum(col("s").cast("decimal(38,0)"))).head
        rb = viaB
        report(r)
      }
    } else if (mode == "bw2") {
      // bw + the kernel's CONTEXT: ea is a Dataset-persisted frame, f is a
      // live checkpointed frame, eaC = ea⋈f⋈f filtered + persisted, and
      // rb0 derives from f — mirrors stronglyConnectedComponents exactly.
      // LEAKPROBE_NEST=true additionally nests ea on a persisted ed and a
      // checkpointed alive (the kernel's full cache-on-cache depth).
      val ea = if (sys.env.get("LEAKPROBE_NEST").contains("true")) {
        val ed = spark.range(200000L)
          .select(col("id").as("src"), ((col("id") + 7L) % 200000L).as("dst"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val alive = spark.range(200000L).select(col("id"))
          .transform(graft.olap.Analytics.roundBarrier)
        ed.join(alive.select(col("id").as("src")), Seq("src"), "left_semi")
          .join(alive.select(col("id").as("dst")), Seq("dst"), "left_semi")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      } else {
        spark.range(200000L)
          .select(col("id").as("src"), ((col("id") + 7L) % 200000L).as("dst"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
      ea.count()
      // LEAKPROBE_EMPTY=true gives every vertex its own color → eaC EMPTY
      // (the acyclic-mixture case where the kernel's bw loop pins frames)
      val fcol = if (sys.env.get("LEAKPROBE_EMPTY").contains("true")) col("id")
        else (col("id") % 50000L)
      val f = spark.range(200000L)
        .select(col("id"), fcol.as("f"))
        .transform(graft.olap.Analytics.roundBarrier)
      f.count()
      val eaC = ea
        .join(f.select(col("id").as("src"), col("f").as("__fs")), Seq("src"))
        .join(f.select(col("id").as("dst"), col("f").as("__fd")), Seq("dst"))
        .filter(col("__fs") === col("__fd"))
        .select(col("src"), col("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var rb = f.select(col("id"), col("id").as("b"), col("id").as("s"))
        .transform(graft.olap.Analytics.roundBarrier)
      def sigBS(df: DataFrame): (java.math.BigDecimal, java.math.BigDecimal) = {
        val row = df.agg(sum(col("b").cast("decimal(38,0)")),
          sum(col("s").cast("decimal(38,0)"))).head
        (if (row.isNullAt(0)) java.math.BigDecimal.ZERO else row.getDecimal(0),
          if (row.isNullAt(1)) java.math.BigDecimal.ZERO else row.getDecimal(1))
      }
      var (rSigB, rSigS) = sigBS(rb)
      val rlog = new graft.olap.Analytics.RoundLog(spark, "bw2")
      for (r <- 1 to rounds) {
        val m = eaC
          .join(rb.select(col("id").as("dst"), col("b").as("__bd"),
            col("s").as("__sd")), Seq("dst"))
          .groupBy(col("src"))
          .agg(min(col("__bd")).as("__bm"), max(col("__sd")).as("__sm"))
        val stepped = rb.join(m.select(col("src").as("id"), col("__bm"), col("__sm")),
            Seq("id"), "left")
          .select(col("id"),
            least(col("b"), coalesce(col("__bm"), col("b"))).as("b"),
            greatest(col("s"), coalesce(col("__sm"), col("s"))).as("s"))
        val viaS = stepped
          .join(rb.select(col("id").as("__j1"), col("b").as("__b1"),
            col("s").as("__s1")), col("s") === col("__j1"), "left")
          .select(col("id"),
            least(col("b"), coalesce(col("__b1"), col("b"))).as("b"),
            greatest(col("s"), coalesce(col("__s1"), col("s"))).as("s"))
        val viaB = viaS
          .join(rb.select(col("id").as("__j2"), col("b").as("__b2"),
            col("s").as("__s2")), col("b") === col("__j2"), "left")
          .select(col("id"),
            least(col("b"), coalesce(col("__b2"), col("b"))).as("b"),
            greatest(col("s"), coalesce(col("__s2"), col("s"))).as("s"))
          .transform(graft.olap.Analytics.roundBarrier)
        val (sb, ss) = sigBS(viaB)
        val rChanged = sb.compareTo(rSigB) != 0 || ss.compareTo(rSigS) != 0
        rSigB = sb; rSigS = ss
        rb = viaB
        rlog.tick(r)
        if (rChanged && r < 0) () // keep the comparison live like the kernel
        report(r)
      }
      eaC.unpersist(false)
    } else if (mode == "flood") {
      // the kernels' actual round shape: a persisted edge frame joined to
      // the previous checkpointed label frame, pointer-jump double
      // self-join, barrier, then a signature AGG as the round's one action
      val und = spark.range(200000L)
        .select(col("id").as("a"), ((col("id") + 7L) % 200000L).as("b"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      und.count()
      var l0 = spark.range(200000L).select(col("id").as("c"), col("id").as("l"))
        .transform(graft.olap.Analytics.roundBarrier)
      for (r <- 1 to rounds) {
        val m2 = und.join(l0.select(col("c").as("b"), col("l").as("__lb")), Seq("b"))
          .groupBy(col("a")).agg(min(col("__lb")).as("__ln"))
        val nl = l0
          .join(m2.select(col("a").as("c"), col("__ln")), Seq("c"), "left")
          .join(l0.select(col("c").as("__lc"), col("l").as("__ll")),
            col("l") === col("__lc"), "left")
          .select(col("c"), least(col("l"),
            coalesce(col("__ln"), col("l")),
            coalesce(col("__ll"), col("l"))).as("l"))
          .transform(graft.olap.Analytics.roundBarrier)
        nl.agg(sum(col("l").cast("decimal(38,0)"))).head
        l0 = nl
        report(r)
      }
    } else if (mode == "rdd") {
      var rdd = sc.range(0L, 200000L)
      for (r <- 1 to rounds) {
        rdd = rdd.map(_ + 1L)
        rdd.localCheckpoint()
        rdd.count()
        report(r)
      }
    } else {
      var df: DataFrame = spark.range(200000L).select(col("id"), (col("id") % 1000L).as("k"))
      for (r <- 1 to rounds) {
        val next = df.groupBy(col("k")).agg(max(col("id")).as("id"))
          .select(col("id"), ((col("k") + 1L) % 1000L).as("k"))
        df = mode match {
          case "plain" => next.localCheckpoint(false)
          case "eager" => next.localCheckpoint(true)
          case _ => graft.olap.Analytics.roundBarrier(next)
        }
        df.count()
        report(r)
      }
    }
    spark.stop()
  }
}

/** Root-set builder for [[HeapPath]]: Spark's driver globals, ALL loaded
  * classes' static reference fields (loaded-class names via jcmd's class
  * histogram of our own pid; Unsafe.shouldBeInitialized guards against
  * triggering static init), and every live thread's ThreadLocal map.
  * Only JNI globals and active stack locals escape this set. */
object LeakRoots {
  def all(spark: org.apache.spark.sql.SparkSession,
      sc: org.apache.spark.SparkContext): Seq[(String, AnyRef)] = {
    import scala.jdk.CollectionConverters._
    val dag: AnyRef = {
      val m = sc.getClass.getMethod("dagScheduler")
      m.setAccessible(true); m.invoke(sc)
    }
    def staticRoot(cls: String): Seq[(String, AnyRef)] =
      try Seq(cls -> Class.forName(cls).getField("MODULE$").get(null))
      catch { case _: Throwable => Nil }
    val named: Seq[(String, AnyRef)] = Seq[(String, AnyRef)](
      "sc" -> sc,
      "SparkEnv" -> org.apache.spark.SparkEnv.get,
      "sessionState" -> spark.sessionState,
      "sharedState" -> spark.sharedState,
      "dagScheduler" -> dag) ++
      staticRoot("org.apache.spark.sql.execution.SQLExecution$") ++
      staticRoot("org.apache.spark.sql.execution.exchange.BroadcastExchangeExec$") ++
      staticRoot("org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec$") ++
      staticRoot("org.apache.spark.sql.classic.SparkSession$") ++
      staticRoot("org.apache.spark.util.ThreadUtils$")
    val statics: Seq[(String, AnyRef)] = {
      val pid = ProcessHandle.current().pid()
      val p = new ProcessBuilder("jcmd", pid.toString, "GC.class_histogram")
        .redirectErrorStream(true).start()
      val names = scala.io.Source.fromInputStream(p.getInputStream).getLines()
        .flatMap { line =>
          val parts = line.trim.split("\\s+")
          if (parts.length >= 4 && parts(0).endsWith(":")) Some(parts(3)) else None
        }
        .filter(n => !n.startsWith("[") && !n.contains("$Lambda"))
        .toVector.distinct
      p.waitFor()
      val unsafeF = classOf[sun.misc.Unsafe].getDeclaredField("theUnsafe")
      unsafeF.setAccessible(true)
      val unsafe = unsafeF.get(null).asInstanceOf[sun.misc.Unsafe]
      val ldr = getClass.getClassLoader
      println(s"LEAKPROBE static-root classes=${names.size}")
      names.flatMap { n =>
        try {
          val cl = Class.forName(n, false, ldr)
          if (unsafe.shouldBeInitialized(cl)) Nil
          else cl.getDeclaredFields.toSeq
            .filter(f => java.lang.reflect.Modifier.isStatic(f.getModifiers) &&
              !f.getType.isPrimitive)
            .flatMap { f =>
              try {
                f.setAccessible(true)
                Option(f.get(null)).map(v => (s"static:$n.${f.getName}", v))
              } catch { case _: Throwable => None }
            }
        } catch { case _: Throwable => Nil }
      }
    }
    val threadLocals: Seq[(String, AnyRef)] = {
      val tlField = classOf[Thread].getDeclaredField("threadLocals")
      tlField.setAccessible(true)
      Thread.getAllStackTraces.keySet.asScala.toSeq.flatMap { t =>
        Option(tlField.get(t)).map(m => s"tl:${t.getName}" -> m)
      }
    }
    named ++ statics ++ threadLocals
  }
}
