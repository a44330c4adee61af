package graft.lake

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Model-based check of the delta-encoded commit log: a random
  * interleaving of appends, multi-file commits, file-replacing
  * rewrites, restores and vacuums must reconstruct, at EVERY surviving
  * version, exactly the file list a trivial in-memory model predicts.
  * The log's failure modes — a delta applied to the wrong base, a
  * checkpoint trusted when stale, vacuum dropping the walk-back path —
  * all surface here as a set difference at some version.
  */
class DeltaLogPropertySpec extends AnyFunSuite with SparkSpec {

  private def df(tag: String) = {
    import spark.implicits._
    Seq((tag, 1L)).toDF("tag", "n").coalesce(1)
  }

  test("random op sequences: files(v) equals the model at every surviving version") {
    val rng = new scala.util.Random(20260813L)
    for (round <- 0 until 3) {
      val dir = Files.createTempDirectory(s"logprop${round}_").toString + "/t"
      val t = new IncrementalTable(spark, dir, collectStats = false)
      // version -> expected file set (the model); grows as we commit
      val model = scala.collection.mutable.Map.empty[Long, Set[String]]
      val vacuumedBelow = scala.collection.mutable.Set.empty[Long]
      var cutoff = 0L

      def current: Set[String] =
        t.latestVersion.map(model).getOrElse(Set.empty)

      for (step <- 0 until 28) {
        rng.nextInt(10) match {
          case 0 | 1 | 2 | 3 => // append 1-2 files
            val cur = current // capture BEFORE the commit moves latest
            val staged = (0 until 1 + rng.nextInt(2))
              .flatMap(i => t.stage(df(s"a$round-$step-$i")))
            val v = t.commitFiles(staged, Set.empty, "append")
            model(v) = cur ++ staged
          case 4 | 5 => // rewrite a random referenced file into a new one
            val cur = current
            if (cur.nonEmpty) {
              val victim = cur.toSeq(rng.nextInt(cur.size))
              val staged = t.stage(df(s"rw$round-$step"))
              val v = t.commitFiles(staged, Set(victim), "rewrite")
              model(v) = cur - victim ++ staged
            }
          case 6 => // full replace (checkpoint-like full-list commit)
            val staged = t.stage(df(s"full$round-$step"))
            val cur = current
            val v = t.commitFiles(staged, cur, "replace")
            model(v) = staged.toSet
          case 7 => // restore to a random surviving version
            val candidates = model.keys.filter(_ >= cutoff).toSeq.sorted
            if (candidates.nonEmpty) {
              val target = candidates(rng.nextInt(candidates.size))
              val v = t.restore(target)
              model(v) = model(target)
            }
          case 8 => // vacuum a random keep-window
            t.latestVersion.foreach { latest =>
              val keep = 1 + rng.nextInt(5)
              t.vacuum(keepLast = keep)
              cutoff = math.max(cutoff, latest - keep + 1)
              model.keys.filter(_ < cutoff).foreach(vacuumedBelow += _)
            }
          case 9 => // reader with a COLD cache replays the whole log
            val t2 = new IncrementalTable(spark, dir, collectStats = false)
            model.keys.filter(_ >= cutoff).foreach { v =>
              assert(t2.files(v).toSet === model(v),
                s"cold reconstruction of v$v diverged (round $round step $step)")
            }
        }
        // the same-instance view must agree after every step
        model.keys.filter(_ >= cutoff).foreach { v =>
          assert(t.files(v).toSet === model(v),
            s"files($v) diverged from the model (round $round step $step)")
        }
        vacuumedBelow.foreach(v =>
          assert(!t.versionExists(v), s"vacuumed v$v still has a manifest"))
      }
    }
  }
}
