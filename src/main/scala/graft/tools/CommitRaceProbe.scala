package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.lake.{LakeLog, LakeTable}

/** MULTI-PROCESS commit race probe: every in-repo race spec runs its
  * contenders as threads of one JVM, where `FileContext.rename` could
  * in principle be accidentally serialized by in-process state. This
  * probe races TWO SEPARATE JVMs — real processes, separate
  * FileSystem/FileContext instances, nothing shared but the disk —
  * and asserts the invariants that make the log a log:
  *
  *  1. **Version race** (no Spark, pure log): both children race
  *     `LakeLog.tryCommit` for the next version in a tight loop until
  *     each has won `rounds` commits. NEVER-BOTH-COMMIT: every
  *     committed version's payload names exactly one child, the
  *     children's claimed wins partition the version range exactly —
  *     a POSIX-rename silent replace (the bug `Options.Rename.NONE`
  *     exists to prevent) would surface as overlapping claims or a
  *     claimed version carrying the other child's payload.
  *  2. **Constraint-vs-violating-append race**: child A runs
  *     `ALTER TABLE ... ADD CONSTRAINT CHECK (v >= 0)` (validate
  *     existing rows, commit at validated+1) while child B appends
  *     rows violating it. Invariant: the final table NEVER holds both
  *     the constraint and violating rows, and exactly one child
  *     succeeds per round.
  *  3. **Dynamic-overwrite-vs-append race** (round 17): child A
  *     dynamically overwrites partition 'a' while child B appends —
  *     into 'a' on even rounds (conflict), into 'b' on odd rounds
  *     (disjoint). Invariants from the LOG, not timing: if the
  *     `dynoverwrite` committed at version v, no live file in 'a'
  *     predates v except the overwrite's own adds (the
  *     `guardPartitions` promise — a silently-surviving concurrent
  *     file would violate it); disjoint-round appends to 'b' ALWAYS
  *     survive and the overwrite ALWAYS succeeds.
  *  4. **Vacuum-vs-reader race** (round 18): child A pins a
  *     time-travel DataFrame of v0 BEFORE child B vacuums v0's files
  *     away (a guaranteed straddle, not a timing lottery). Invariant:
  *     the pinned plan returns the COMPLETE snapshot or fails loudly
  *     — never partial rows; a FRESH v0 resolution after the vacuum
  *     refuses deterministically with the recorded vacuum floor and
  *     horizon in the message; the latest snapshot is untouched.
  *  5. **Compaction-vs-MOR-delete race** (round 19): child A compacts
  *     every file while child B commits a merge-on-read delete
  *     re-pointing two of them at a deletion vector; deterministic
  *     stagger exercises both orderings. Invariants: committed
  *     deletions NEVER resurrect through the rewrite (the clean
  *     rewrite of a DV'd file is exactly the resurrection hazard —
  *     an Add's DV pointer is part of `guardFiles`' identity, so the
  *     stale side aborts as ConcurrentCommitException), outcomes
  *     match the log exactly, and a compaction serializing after the
  *     delete purges the DV into clean files with the rows still
  *     gone.
  *  6. **Localize-vs-MOR-delete race** (round 20): child A localizes
  *     a shallow clone (copies foreign files, swaps every Add) while
  *     child B MOR-deletes a range of the same clone (re-points two
  *     inherited Adds at a local DV). Both rewrite Add identities,
  *     so a mid-flight straddle has exactly one winner and the loser
  *     aborts typed on the file guard; retrying the loser from a
  *     fresh snapshot must CONVERGE — deletions preserved and every
  *     reference (DV sidecars included) local.
  *
  * Usage: `sbt "runMain graft.tools.CommitRaceProbe"` — appends a
  * section to SCALEPROBE.md and prints COMMIT-RACE-PASS.
  */
object CommitRaceProbe {

  private def now(): Long = System.currentTimeMillis()

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("child-log") =>
      childLog(args(1), args(2), args(3).toInt)
    case Some("child-constraint") =>
      childConstraint(args(1), args(2), args(3).toInt)
    case Some("child-dyn") =>
      childDyn(args(1), args(2), args(3).toInt)
    case Some("child-vac") =>
      childVac(args(1), args(2), args(3).toInt)
    case Some("child-mor") =>
      childMor(args(1), args(2), args(3).toInt)
    case Some("child-loc") =>
      childLoc(args(1), args(2), args(3).toInt)
    case _ => coordinate()
  }

  // ---- file barrier ---------------------------------------------------

  private def touch(p: String): Unit = {
    Files.write(Paths.get(p), Array.emptyByteArray,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    ()
  }

  private def await(p: String, timeoutMs: Long = 120000L): Unit = {
    val t0 = now()
    while (!Files.exists(Paths.get(p))) {
      require(now() - t0 < timeoutMs, s"barrier timeout waiting for $p")
      Thread.sleep(5)
    }
  }

  // ---- child 1: pure-log version race (no Spark) ----------------------

  private def childLog(root: String, childId: String, rounds: Int): Unit = {
    val rootP = new Path(root)
    val fs = LakeLog.fileSystem(rootP, new Configuration())
    touch(s"$root/../race/ready-log-$childId")
    await(s"$root/../race/go-log")
    val won = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    while (i < rounds) {
      val v = LakeLog.latestVersion(fs, rootP).map(_ + 1).getOrElse(0L)
      if (LakeLog.tryCommit(fs, rootP, v, Seq(
        LakeLog.Meta(s"race-$childId-$i", "", Nil, None, None, now())))) {
        won += v
        i += 1
      } // lost: recompute the next version and contend again
    }
    Files.write(Paths.get(s"$root/../race/result-log-$childId"),
      won.mkString(",").getBytes(StandardCharsets.UTF_8))
    ()
  }

  // ---- child 2: constraint vs violating append (Spark) ----------------

  private def childConstraint(base: String, childId: String,
                              nRounds: Int): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (0 until nRounds).foreach { r =>
      val root = s"$base/ctab_$r"
      touch(s"$base/race/ready-c$r-$childId")
      await(s"$base/race/go-c$r")
      // deterministic stagger: odd rounds hand the APPEND the head
      // start (constraint validation on a tiny table otherwise wins
      // every race, leaving the append-lands-first ordering untested)
      if (childId == "A" && r % 2 == 1) Thread.sleep(400)
      val outcome =
        try {
          if (childId == "A")
            LakeTable.addConstraint(spark, root, "nonneg", "v >= 0")
          else {
            import spark.implicits._
            LakeTable.append(spark, root,
              Seq((100L + r, -1L), (200L + r, -2L)).toDF("id", "v"),
              nFiles = 1)
          }
          "OK"
        } catch { case e: Throwable => s"REFUSED: ${e.getClass.getName}" }
      Files.write(Paths.get(s"$base/race/result-c$r-$childId"),
        outcome.getBytes(StandardCharsets.UTF_8))
    }
    spark.stop()
  }

  // ---- child 3: dynamic overwrite vs append (Spark) --------------------

  private def childDyn(base: String, childId: String,
                       nRounds: Int): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    (0 until nRounds).foreach { r =>
      val root = s"$base/dtab_$r"
      touch(s"$base/race/ready-d$r-$childId")
      await(s"$base/race/go-d$r")
      val outcome =
        try {
          if (childId == "A")
            // replace partition 'a' whole: keys 1000.. tagged by round
            LakeTable.dynamicOverwrite(spark, root,
              (0 until 3).map(i => (1000L + r * 10 + i, s"ow$r", "a"))
                .toDF("id", "tag", "part"))
          else {
            // even rounds collide with the replaced partition; odd
            // rounds append to the untouched one
            val p = if (r % 2 == 0) "a" else "b"
            LakeTable.append(spark, root,
              (0 until 2).map(i => (2000L + r * 10 + i, s"ap$r", p))
                .toDF("id", "tag", "part"), nFiles = 1)
          }
          "OK"
        } catch { case e: Throwable => s"REFUSED: ${e.getClass.getName}" }
      Files.write(Paths.get(s"$base/race/result-d$r-$childId"),
        outcome.toString.getBytes(StandardCharsets.UTF_8))
    }
    spark.stop()
  }

  // ---- child 4: vacuum vs time-travel reader (Spark) --------------------

  /** Per round, the table holds v0 (100 rows, later orphaned by v1's
    * overwrite). Child A (reader) PINS a v0 DataFrame before the go
    * signal, then after the vacuum has run it (a) collects the pinned
    * frame — its file list predates the vacuum, so this is the
    * mid-flight race — and (b) re-resolves v0 fresh. Child B runs the
    * vacuum. Outcomes are written verbatim; the coordinator asserts
    * complete-or-loud-never-partial from them.
    */
  private def childVac(base: String, childId: String,
                       nRounds: Int): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (0 until nRounds).foreach { r =>
      val root = s"$base/vtab_$r"
      def attempt(tag: String)(body: => Long): String =
        try s"$tag:OK:${body}"
        catch { case e: Throwable =>
          val cause = { var c: Throwable = e
            while (c.getCause != null) c = c.getCause; c }
          s"$tag:REFUSED:${cause.getClass.getSimpleName}:" +
            String.valueOf(cause.getMessage).take(120).replace('\n', ' ')
        }
      val outcome =
        if (childId == "A") {
          // pin BEFORE the vacuum: resolution reads the v0 snapshot
          // while its files still exist
          val pinned =
            try Some(LakeTable.scanAsOf(spark, root, Some(0L)))
            catch { case _: Throwable => None }
          touch(s"$base/race/ready-v$r-$childId")
          await(s"$base/race/go-v$r")
          // the vacuum child signals completion; the reader then
          // executes the pinned plan (files may be gone under it) and
          // re-resolves fresh
          await(s"$base/race/result-v$r-B")
          val mid = pinned.map(df => attempt("pinned")(df.count()))
            .getOrElse("pinned:UNRESOLVED")
          val fresh = attempt("fresh")(
            LakeTable.scanAsOf(spark, root, Some(0L)).count())
          val latest = attempt("latest")(LakeTable.scan(spark, root).count())
          s"$mid|$fresh|$latest"
        } else {
          touch(s"$base/race/ready-v$r-$childId")
          await(s"$base/race/go-v$r")
          attempt("vacuum") {
            LakeTable.vacuum(spark, root, keepFromVersion = 1L,
              retentionMs = 0L).filesDeleted.toLong
          }
        }
      Files.write(Paths.get(s"$base/race/result-v$r-$childId"),
        outcome.getBytes(StandardCharsets.UTF_8))
    }
    spark.stop()
  }

  // ---- child 5: compaction vs concurrent MOR delete (Spark) -----------

  /** Per round, child A compacts the whole table (rewriting every
    * file); child B commits a merge-on-read delete (re-pointing files
    * at a deletion vector). Each op snapshots at its own start, so
    * the loser's commit rides a stale file list — its `guardFiles`
    * must abort loudly (a compaction that silently replaced a
    * DV'd file would RESURRECT the deleted rows through the clean
    * rewrite; a DV that landed onto removed files would point at
    * nothing). Deterministic stagger covers both orderings.
    */
  private def childMor(base: String, childId: String,
                       nRounds: Int): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (0 until nRounds).foreach { r =>
      val root = s"$base/mtab_$r"
      touch(s"$base/race/ready-m$r-$childId")
      await(s"$base/race/go-m$r")
      // odd rounds: the delete gets the head start (compaction must
      // abort); even rounds: the compaction does (the delete must)
      if (childId == "A" && r % 2 == 1) Thread.sleep(300)
      if (childId == "B" && r % 2 == 0) Thread.sleep(300)
      val outcome =
        try {
          if (childId == "A")
            LakeTable.compact(spark, root, smallBytes = Long.MaxValue,
              targetBytes = Long.MaxValue)
          else
            LakeTable.deleteWhereMor(spark, root,
              Seq(LakeTable.ColRange("id", Some(50L), Some(149L))))
          "OK"
        } catch { case e: Throwable => s"REFUSED: ${e.getClass.getName}" }
      Files.write(Paths.get(s"$base/race/result-m$r-$childId"),
        outcome.getBytes(StandardCharsets.UTF_8))
    }
    spark.stop()
  }

  // ---- child 6: localize vs MOR delete on a shallow clone -------------

  private def childLoc(base: String, childId: String,
                       nRounds: Int): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (0 until nRounds).foreach { r =>
      val root = s"$base/ltab_$r/clone"
      touch(s"$base/race/ready-l$r-$childId")
      await(s"$base/race/go-l$r")
      // odd rounds: the delete gets the head start (localize must
      // abort on the re-pointed Add); even rounds: localize does
      if (childId == "A" && r % 2 == 1) Thread.sleep(300)
      if (childId == "B" && r % 2 == 0) Thread.sleep(300)
      val outcome =
        try {
          if (childId == "A") LakeTable.localize(spark, root)
          else LakeTable.deleteWhereMor(spark, root,
            Seq(LakeTable.ColRange("id", Some(50L), Some(149L))))
          "OK"
        } catch { case e: Throwable => s"REFUSED: ${e.getClass.getName}" }
      Files.write(Paths.get(s"$base/race/result-l$r-$childId"),
        outcome.getBytes(StandardCharsets.UTF_8))
    }
    spark.stop()
  }

  // ---- coordinator -----------------------------------------------------

  private def spawn(mainArgs: Seq[String], logFile: String,
                    heap: String): Process = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(s"-Xmx$heap",
      "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.tools.CommitRaceProbe") ++ mainArgs)
    new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true)
      .redirectOutput(new java.io.File(logFile))
      .start()
  }

  private def coordinate(): Unit = {
    val base = Files.createTempDirectory("graft_race").toString
    Files.createDirectories(Paths.get(s"$base/race"))
    val sb = new StringBuilder
    sb.append("\n## Commit race probe (round 20 re-run; version + ")
    sb.append("constraint races from round 15, dynamic-overwrite race ")
    sb.append("from round 17, vacuum-vs-reader race from round 18, ")
    sb.append("compaction-vs-MOR-delete race from round 19, ")
    sb.append("localize-vs-MOR-delete race new): two SEPARATE ")
    sb.append("JVMs racing the same log\n\n")

    // ---- race 1: tryCommit version race, no Spark anywhere ----------
    val logRoot = s"$base/lograce"
    Files.createDirectories(Paths.get(logRoot))
    val rounds = 40
    val t0 = now()
    val pa = spawn(Seq("child-log", logRoot, "A", rounds.toString),
      s"$base/child-log-A.out", "512m")
    val pb = spawn(Seq("child-log", logRoot, "B", rounds.toString),
      s"$base/child-log-B.out", "512m")
    await(s"$base/race/ready-log-A"); await(s"$base/race/ready-log-B")
    touch(s"$base/race/go-log")
    require(pa.waitFor() == 0, s"child A failed — $base/child-log-A.out")
    require(pb.waitFor() == 0, s"child B failed — $base/child-log-B.out")
    val wallLog = (now() - t0) / 1e3

    def claims(id: String): Set[Long] =
      new String(Files.readAllBytes(
        Paths.get(s"$base/race/result-log-$id")), StandardCharsets.UTF_8)
        .split(",").map(_.toLong).toSet
    val (ca, cb) = (claims("A"), claims("B"))
    val fs = LakeLog.fileSystem(new Path(logRoot), new Configuration())
    val versions = LakeLog.versions(fs, new Path(logRoot))
    // NEVER-BOTH-COMMIT, cross-process:
    require(ca.size == rounds && cb.size == rounds,
      s"each child must win exactly $rounds: A=${ca.size} B=${cb.size}")
    require((ca intersect cb).isEmpty,
      s"overlapping claims — both processes committed the same version: " +
        s"${(ca intersect cb).toSeq.sorted.take(5)}")
    require(versions.toSet == (ca union cb) &&
      versions.size == 2 * rounds,
      s"log (${versions.size} versions) must be exactly the union of " +
        "claims")
    // every version's surviving payload names its claimant — a silent
    // rename-replace would leave a claimed version holding the OTHER
    // child's payload
    versions.foreach { v =>
      val op = LakeLog.readCommit(fs, new Path(logRoot), v)
        .collectFirst { case m: LakeLog.Meta => m.op }.get
      val owner = if (ca.contains(v)) "A" else "B"
      require(op.startsWith(s"race-$owner-"),
        s"version $v claimed by $owner but holds payload '$op'")
    }
    sb.append(s"- version race: 2 JVMs x $rounds commits in ")
    sb.append(f"$wallLog%.1f s — ${versions.size} versions, claims ")
    sb.append("disjoint + exhaustive, every payload matches its ")
    sb.append("claimant (FileContext.rename(NONE) held across ")
    sb.append("processes)\n")

    // ---- race 2: ADD CONSTRAINT vs violating append ------------------
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val nRounds = 6
    (0 until nRounds).foreach { r =>
      LakeTable.create(spark, s"$base/ctab_$r",
        Seq((1L, 1L), (2L, 2L)).toDF("id", "v"), Seq("id"), nFiles = 1)
    }
    val t1 = now()
    val qa = spawn(Seq("child-constraint", base, "A", nRounds.toString),
      s"$base/child-c-A.out", "2g")
    val qb = spawn(Seq("child-constraint", base, "B", nRounds.toString),
      s"$base/child-c-B.out", "2g")
    (0 until nRounds).foreach { r =>
      await(s"$base/race/ready-c$r-A"); await(s"$base/race/ready-c$r-B")
      touch(s"$base/race/go-c$r")
      await(s"$base/race/result-c$r-A"); await(s"$base/race/result-c$r-B")
    }
    require(qa.waitFor() == 0, s"child A failed — $base/child-c-A.out")
    require(qb.waitFor() == 0, s"child B failed — $base/child-c-B.out")
    val wallC = (now() - t1) / 1e3
    var constraintWins = 0
    (0 until nRounds).foreach { r =>
      val root = s"$base/ctab_$r"
      val snap = LakeTable.snapshot(spark, root)
      val gated = snap.constraints.contains("nonneg")
      val violating = LakeTable.scan(spark, root)
        .where($"v" < 0).count()
      // THE invariant: the gate and rows violating it never coexist
      require(!(gated && violating > 0),
        s"round $r: constraint committed AND violating rows present")
      def res(id: String) = new String(Files.readAllBytes(
        Paths.get(s"$base/race/result-c$r-$id")), StandardCharsets.UTF_8)
      val (ra, rbb) = (res("A"), res("B"))
      // and the outcomes agree with the table: constraint present iff
      // child A succeeded; violating rows present iff child B did
      require(gated == ra.startsWith("OK"),
        s"round $r: A='$ra' but constraint present=$gated")
      require((violating > 0) == rbb.startsWith("OK"),
        s"round $r: B='$rbb' but violating rows=$violating")
      if (gated) constraintWins += 1
    }
    sb.append(s"- constraint race: $nRounds rounds in ")
    sb.append(f"$wallC%.1f s — gate and violating rows NEVER coexist; ")
    sb.append(s"constraint won $constraintWins/$nRounds (rest: append ")
    sb.append("landed first and validation refused the gate)\n")

    // ---- race 3: dynamic overwrite vs append --------------------------
    val nDyn = 6
    (0 until nDyn).foreach { r =>
      LakeTable.create(spark, s"$base/dtab_$r",
        Seq((1L, "s", "a"), (2L, "s", "a"), (3L, "s", "b"))
          .toDF("id", "tag", "part"),
        Seq("id"), nFiles = 1, partitionBy = Seq("part"))
    }
    val t2 = now()
    val da = spawn(Seq("child-dyn", base, "A", nDyn.toString),
      s"$base/child-d-A.out", "2g")
    val db = spawn(Seq("child-dyn", base, "B", nDyn.toString),
      s"$base/child-d-B.out", "2g")
    (0 until nDyn).foreach { r =>
      await(s"$base/race/ready-d$r-A"); await(s"$base/race/ready-d$r-B")
      touch(s"$base/race/go-d$r")
      await(s"$base/race/result-d$r-A"); await(s"$base/race/result-d$r-B")
    }
    require(da.waitFor() == 0, s"child A failed — $base/child-d-A.out")
    require(db.waitFor() == 0, s"child B failed — $base/child-d-B.out")
    val wallD = (now() - t2) / 1e3
    var owWins = 0
    var conflictsRefused = 0
    (0 until nDyn).foreach { r =>
      val root = s"$base/dtab_$r"
      val rootP = new Path(root)
      val dfs = LakeLog.fileSystem(rootP, new Configuration())
      def res(id: String) = new String(Files.readAllBytes(
        Paths.get(s"$base/race/result-d$r-$id")), StandardCharsets.UTF_8)
      val (ra, rbb) = (res("A"), res("B"))
      // reconstruct, FROM THE LOG, each live file's birth version and
      // the dynoverwrite's commit version (if it committed)
      val versions = LakeLog.versions(dfs, rootP)
      val bornAt = scala.collection.mutable.Map[String, Long]()
      var owVersion = -1L
      versions.foreach { v =>
        val actions = LakeLog.readCommit(dfs, rootP, v)
        actions.foreach {
          case a: LakeLog.Add => if (!bornAt.contains(a.path)) bornAt(a.path) = v
          case m: LakeLog.Meta if m.op == "dynoverwrite" => owVersion = v
          case _ => ()
        }
      }
      val snap = LakeTable.snapshot(spark, root)
      val liveA = snap.files.filter(_.stats.min.get("part").contains("a"))
      if (ra.startsWith("OK")) {
        owWins += 1
        require(owVersion >= 0, s"dyn round $r: A reported OK but the " +
          "log holds no dynoverwrite commit")
        // THE guardPartitions invariant, cross-process: no live file
        // in the replaced partition predates the overwrite commit
        // except the overwrite's own adds
        liveA.foreach { a =>
          require(bornAt(a.path) >= owVersion,
            s"dyn round $r: live file ${a.path} in replaced partition " +
              s"'a' was born at v${bornAt(a.path)} < overwrite " +
              s"v$owVersion — a concurrent add silently survived")
        }
      } else {
        // refusal legal ONLY on a conflict round, and the table must
        // still hold the seed rows of 'a' (nothing half-replaced)
        require(r % 2 == 0,
          s"dyn round $r: overwrite refused on a DISJOINT round: $ra")
        conflictsRefused += 1
        require(owVersion < 0, s"dyn round $r: refused but committed?")
        val ids = LakeTable.scan(spark, root)
          .where($"part" === "a" && $"id" < 1000).count()
        require(ids == 2, s"dyn round $r: refused overwrite must leave " +
          s"the seed intact, found $ids of 2 seed rows")
      }
      // the append's outcome must match the table exactly
      val appendRows = LakeTable.scan(spark, root)
        .where($"id" >= 2000).count()
      if (rbb.startsWith("OK")) {
        if (r % 2 == 1)
          require(appendRows == 2, s"dyn round $r: disjoint append " +
            s"committed but ${appendRows}/2 rows live — dynamic " +
            "overwrite must never clobber untouched partitions")
        else
          // conflict round: the append's rows survive iff it landed
          // AFTER the overwrite (born later than owVersion) or the
          // overwrite refused
          require(appendRows == 2 || owVersion >= 0,
            s"dyn round $r: append OK but rows gone with no overwrite")
      } else require(appendRows == 0,
        s"dyn round $r: append refused but its rows are live")
    }
    sb.append(s"- dynamic-overwrite race: $nDyn rounds in ")
    sb.append(f"$wallD%.1f s — log-derived invariant held in every ")
    sb.append("round (no live file in a replaced partition predates ")
    sb.append(s"the overwrite commit); overwrite committed $owWins/$nDyn, ")
    sb.append(s"guard refused $conflictsRefused conflicting interleavings, ")
    sb.append("disjoint-partition appends always survived\n")

    // ---- race 4: vacuum vs time-travel reader --------------------------
    val nVac = 3
    (0 until nVac).foreach { r =>
      val root = s"$base/vtab_$r"
      LakeTable.create(spark, root,
        (0 until 100).map(i => (i.toLong, i.toLong)).toDF("id", "v"),
        Seq("id"), nFiles = 2)                         // v0: 100 rows
      LakeTable.overwrite(spark, root,
        (0 until 40).map(i => (i.toLong, -i.toLong)).toDF("id", "v"),
        nFiles = 1)                                    // v1 orphans v0
    }
    val t3 = now()
    val va = spawn(Seq("child-vac", base, "A", nVac.toString),
      s"$base/child-v-A.out", "2g")
    val vb = spawn(Seq("child-vac", base, "B", nVac.toString),
      s"$base/child-v-B.out", "2g")
    (0 until nVac).foreach { r =>
      await(s"$base/race/ready-v$r-A"); await(s"$base/race/ready-v$r-B")
      touch(s"$base/race/go-v$r")
      await(s"$base/race/result-v$r-A")
    }
    require(va.waitFor() == 0, s"child A failed — $base/child-v-A.out")
    require(vb.waitFor() == 0, s"child B failed — $base/child-v-B.out")
    val wallV = (now() - t3) / 1e3
    var pinnedLoud = 0
    (0 until nVac).foreach { r =>
      def res(id: String) = new String(Files.readAllBytes(
        Paths.get(s"$base/race/result-v$r-$id")), StandardCharsets.UTF_8)
      val Array(pinned, fresh, latest) = res("A").split('|')
      val vac = res("B")
      require(vac.startsWith("vacuum:OK:"),
        s"vac round $r: vacuum must succeed, got '$vac'")
      require(vac.stripPrefix("vacuum:OK:").toLong > 0,
        s"vac round $r: vacuum must have reclaimed v0's files")
      // THE invariant, mid-flight side: a plan pinned BEFORE the
      // vacuum either returns the COMPLETE snapshot or fails loudly —
      // a partial count is the data-corruption outcome
      if (pinned.startsWith("pinned:OK:"))
        require(pinned == "pinned:OK:100",
          s"vac round $r: PARTIAL pinned read: '$pinned' (expected " +
            "100 rows or a loud failure)")
      else {
        pinnedLoud += 1
        require(pinned.startsWith("pinned:REFUSED:"),
          s"vac round $r: unexpected pinned outcome '$pinned'")
      }
      // resolution side: a FRESH time travel below the floor refuses
      // AT RESOLUTION, naming the floor/horizon — deterministic, the
      // reader never starts a doomed scan
      require(fresh.startsWith("fresh:REFUSED:IllegalStateException") &&
        fresh.contains("vacuum floor"),
        s"vac round $r: fresh v0 resolution must refuse with the " +
          s"vacuum floor, got '$fresh'")
      // and the latest snapshot is never collateral damage
      require(latest == "latest:OK:40",
        s"vac round $r: latest read must stay intact, got '$latest'")
    }
    sb.append(s"- vacuum-vs-reader race: $nVac rounds in ")
    sb.append(f"$wallV%.1f s — a v0 plan PINNED before the vacuum ")
    sb.append(s"returned complete-or-loud in every round ($pinnedLoud/")
    sb.append(s"$nVac failed loudly, the rest read 100/100 intact rows ")
    sb.append("from still-open handles); a FRESH v0 resolution after ")
    sb.append("the vacuum refused deterministically with the recorded ")
    sb.append("vacuum floor + horizon in the message; the latest ")
    sb.append("snapshot was never collateral damage\n")
    // ---- race 5: compaction vs concurrent MOR delete -------------------
    val nMor = 6
    (0 until nMor).foreach { r =>
      LakeTable.create(spark, s"$base/mtab_$r",
        (0 until 200).map(i => (i.toLong, i.toLong)).toDF("id", "v"),
        Seq("id"), nFiles = 4, clusterBy = Some("id"))
    }
    val t4 = now()
    val ma = spawn(Seq("child-mor", base, "A", nMor.toString),
      s"$base/child-m-A.out", "2g")
    val mb = spawn(Seq("child-mor", base, "B", nMor.toString),
      s"$base/child-m-B.out", "2g")
    (0 until nMor).foreach { r =>
      await(s"$base/race/ready-m$r-A"); await(s"$base/race/ready-m$r-B")
      touch(s"$base/race/go-m$r")
      await(s"$base/race/result-m$r-A"); await(s"$base/race/result-m$r-B")
    }
    require(ma.waitFor() == 0, s"child A failed — $base/child-m-A.out")
    require(mb.waitFor() == 0, s"child B failed — $base/child-m-B.out")
    val wallM = (now() - t4) / 1e3
    var morCompactWins = 0
    var morDeleteWins = 0
    var morGuardAborts = 0
    (0 until nMor).foreach { r =>
      val root = s"$base/mtab_$r"
      val rootP = new Path(root)
      val mfs = LakeLog.fileSystem(rootP, new Configuration())
      def res(id: String) = new String(Files.readAllBytes(
        Paths.get(s"$base/race/result-m$r-$id")), StandardCharsets.UTF_8)
      val (ra, rbb) = (res("A"), res("B"))
      // reconstruct both ops' commit versions from the log
      var compactV = -1L
      var morV = -1L
      LakeLog.versions(mfs, rootP).foreach { v =>
        LakeLog.readCommit(mfs, rootP, v).foreach {
          case m: LakeLog.Meta if m.op == "compact"   => compactV = v
          case m: LakeLog.Meta if m.op == "mordelete" => morV = v
          case _ => ()
        }
      }
      // outcomes must match the log exactly — no silent success, no
      // committed-but-reported-refused
      require((compactV >= 0) == ra.startsWith("OK"),
        s"mor round $r: A='$ra' but compact commit at v$compactV")
      require((morV >= 0) == rbb.startsWith("OK"),
        s"mor round $r: B='$rbb' but mordelete commit at v$morV")
      require(ra.startsWith("OK") || rbb.startsWith("OK"),
        s"mor round $r: both refused — nothing committed ($ra / $rbb)")
      // a loser aborts on the file guard, loudly and typed
      Seq("A" -> ra, "B" -> rbb).foreach { case (id, out) =>
        if (!out.startsWith("OK")) {
          require(out.contains("ConcurrentCommitException"),
            s"mor round $r: child $id refused with the wrong failure: " +
              out)
          morGuardAborts += 1
        }
      }
      // THE invariant: committed deletions NEVER resurrect through a
      // rewrite — the scan reflects the delete iff it committed,
      // whole or not at all
      val scan = LakeTable.scan(spark, root)
      val deletedLive = scan.where($"id".between(50, 149)).count()
      val total = scan.count()
      if (rbb.startsWith("OK")) {
        require(deletedLive == 0 && total == 100,
          s"mor round $r: delete committed but $deletedLive/100 deleted " +
            s"rows live, total $total — resurrected by the rewrite")
        morDeleteWins += 1
      } else require(deletedLive == 100 && total == 200,
        s"mor round $r: delete refused but the table lost rows " +
          s"($deletedLive deleted-range rows, $total total)")
      if (ra.startsWith("OK")) {
        morCompactWins += 1
        // a compaction that serialized AFTER the delete must have
        // purged the DV into its rewrite (clean files, rows still
        // gone); one that won the race carries no DV either way
        if (morV >= 0 && compactV > morV) {
          val snap = LakeTable.snapshot(spark, root)
          require(snap.files.forall(_.dv.isEmpty),
            s"mor round $r: post-delete compaction left DVs attached")
        }
      }
    }
    sb.append(s"- compaction-vs-MOR-delete race: $nMor rounds in ")
    sb.append(f"$wallM%.1f s — committed deletions never resurrected ")
    sb.append("through a rewrite in any round (scan = exactly the ")
    sb.append(s"committed ops' outcome); compaction committed ")
    sb.append(s"$morCompactWins/$nMor, delete $morDeleteWins/$nMor, ")
    sb.append(s"$morGuardAborts stale-snapshot losers aborted on the ")
    sb.append("file guard as ConcurrentCommitException (an Add's DV ")
    sb.append("pointer is part of the guarded identity, so a re-point ")
    sb.append("is a conflict); post-delete compactions purged the DV ")
    sb.append("into clean rewrites\n")
    // ---- race 6: localize vs concurrent MOR delete on a clone ----------
    // the new escape hatch vs a concurrent writer: both ops rewrite
    // Add identities (localize re-points paths, the delete re-points
    // a DV), so exactly one may serialize per round and the loser
    // must abort typed on the file guard; a RETRY of the loser from a
    // fresh snapshot must then converge (deletions preserved, every
    // reference local — DV sidecars included)
    val nLoc = 6
    (0 until nLoc).foreach { r =>
      val src = s"$base/ltab_$r/src"
      LakeTable.create(spark, src,
        (0 until 200).map(i => (i.toLong, i.toLong)).toDF("id", "v"),
        Seq("id"), nFiles = 4, clusterBy = Some("id"))
      LakeTable.shallowClone(spark, src, s"$base/ltab_$r/clone")
    }
    val t5 = now()
    val la = spawn(Seq("child-loc", base, "A", nLoc.toString),
      s"$base/child-l-A.out", "2g")
    val lb = spawn(Seq("child-loc", base, "B", nLoc.toString),
      s"$base/child-l-B.out", "2g")
    (0 until nLoc).foreach { r =>
      await(s"$base/race/ready-l$r-A"); await(s"$base/race/ready-l$r-B")
      touch(s"$base/race/go-l$r")
      await(s"$base/race/result-l$r-A"); await(s"$base/race/result-l$r-B")
    }
    require(la.waitFor() == 0, s"child A failed — $base/child-l-A.out")
    require(lb.waitFor() == 0, s"child B failed — $base/child-l-B.out")
    val wallL = (now() - t5) / 1e3
    var locWins = 0
    var locDelWins = 0
    var locAborts = 0
    (0 until nLoc).foreach { r =>
      val root = s"$base/ltab_$r/clone"
      val rootP = new Path(root)
      val lfs = LakeLog.fileSystem(rootP, new Configuration())
      def res(id: String) = new String(Files.readAllBytes(
        Paths.get(s"$base/race/result-l$r-$id")), StandardCharsets.UTF_8)
      val (ra, rbb) = (res("A"), res("B"))
      var locV = -1L
      var morV = -1L
      LakeLog.versions(lfs, rootP).foreach { v =>
        LakeLog.readCommit(lfs, rootP, v).foreach {
          case m: LakeLog.Meta if m.op == "localize"  => locV = v
          case m: LakeLog.Meta if m.op == "mordelete" => morV = v
          case _ => ()
        }
      }
      require((locV >= 0) == ra.startsWith("OK"),
        s"loc round $r: A='$ra' but localize commit at v$locV")
      require((morV >= 0) == rbb.startsWith("OK"),
        s"loc round $r: B='$rbb' but mordelete commit at v$morV")
      // a STAGGERED child may take its snapshot after the winner's
      // commit and serialize cleanly behind it (both-OK); a true
      // mid-flight straddle has exactly one winner — the loser must
      // abort typed on the file guard (both ops rewrite Add
      // identities)
      require(ra.startsWith("OK") || rbb.startsWith("OK"),
        s"loc round $r: nothing committed ($ra / $rbb)")
      Seq("A" -> ra, "B" -> rbb).foreach { case (id, out) =>
        if (!out.startsWith("OK")) {
          require(out.contains("ConcurrentCommitException"),
            s"loc round $r: child $id refused with the wrong failure: " +
              out)
          locAborts += 1
        }
      }
      if (ra.startsWith("OK")) locWins += 1
      if (rbb.startsWith("OK")) locDelWins += 1
      // retry any loser from a fresh snapshot — convergence is the
      // contract the escape hatch sells
      if (!rbb.startsWith("OK"))
        LakeTable.deleteWhereMor(spark, root,
          Seq(LakeTable.ColRange("id", Some(50L), Some(149L))))
      if (!ra.startsWith("OK")) LakeTable.localize(spark, root)
      val scan = LakeTable.scan(spark, root)
      require(scan.count() == 100 &&
        scan.where($"id".between(50, 149)).count() == 0,
        s"loc round $r: converged state must be 100 live rows minus " +
          "the deleted range")
      val snap = LakeTable.snapshot(spark, root)
      require(snap.files.forall(a => !a.path.startsWith("/") &&
        a.dv.forall(d => !d.path.startsWith("/"))),
        s"loc round $r: every reference (DV sidecars included) must " +
          s"be local after convergence: ${snap.files.map(_.path)}")
    }
    sb.append(s"- localize-vs-MOR-delete race (round 20, new): $nLoc ")
    sb.append(f"rounds in $wallL%.1f s — a mid-flight straddle has ")
    sb.append("exactly one winner (both ops rewrite Add identities) ")
    sb.append("and every loser aborted typed on the file guard ")
    sb.append(s"($locAborts ConcurrentCommitException across $nLoc ")
    sb.append(s"rounds); localize committed $locWins/$nLoc, delete ")
    sb.append(s"$locDelWins/$nLoc (staggered rounds may serialize ")
    sb.append("both cleanly); retrying any loser from a fresh ")
    sb.append("snapshot converged every round to 100 live rows with ")
    sb.append("every reference (DV sidecars included) local\n")
    spark.stop()

    Files.write(Paths.get("SCALEPROBE.md"),
      sb.toString.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    println(sb.toString)
    println("COMMIT-RACE-PASS")
  }
}
