package graft.sinks

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Crash-window pins for the [[Dfs.writeSmall]] swap protocol (round 7
  * ADVICE: the old delete-then-rename version had a window with no
  * live file at all — for CdcStream's bucket marker that silently
  * re-adopted whatever modulus a restarted sink was started with).
  * Each test constructs the exact on-disk state a crash at that point
  * leaves behind, then proves reads heal to an acknowledged value.
  */
class DfsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def freshDir(): Path = {
    val d = java.nio.file.Files.createTempDirectory("graft-dfs").toString
    new Path(d)
  }

  test("writeSmall round-trips and replaces, leaving no protocol residue") {
    val dir = freshDir()
    val fs = Dfs.fs(spark, dir.toString)
    val p = new Path(dir, "marker")
    Dfs.writeSmall(fs, p, "16")
    assert(Dfs.readSmallString(fs, p) === "16")
    Dfs.writeSmall(fs, p, "32")
    assert(Dfs.readSmallString(fs, p) === "32")
    assert(!fs.exists(new Path(dir, "marker.tmp")), "stray .tmp after clean write")
    assert(!fs.exists(new Path(dir, "marker.old")), "stray .old after clean write")
  }

  test("crash between retire and promote: reads heal to the PREVIOUS acknowledged value") {
    val dir = freshDir()
    val fs = Dfs.fs(spark, dir.toString)
    val p = new Path(dir, "marker")
    Dfs.writeSmall(fs, p, "16")
    // crash state: live retired to .old, new value stranded in .tmp
    require(fs.rename(p, new Path(dir, "marker.old")))
    val out = fs.create(new Path(dir, "marker.tmp"), true)
    out.write("32".getBytes("UTF-8")); out.close()
    assert(Dfs.existsSmall(fs, p), "heal must restore existence")
    assert(Dfs.readSmallString(fs, p) === "16", "unacknowledged .tmp must never win")
  }

  test("crash between promote and .old cleanup: the NEW value wins, old is inert") {
    val dir = freshDir()
    val fs = Dfs.fs(spark, dir.toString)
    val p = new Path(dir, "marker")
    Dfs.writeSmall(fs, p, "16")
    // crash state: new value promoted, previous still at .old
    val out = fs.create(new Path(dir, "marker.old"), true)
    out.write("8".getBytes("UTF-8")); out.close()
    assert(Dfs.readSmallString(fs, p) === "16")
    // and the next clean write clears the leftover
    Dfs.writeSmall(fs, p, "32")
    assert(!fs.exists(new Path(dir, "marker.old")))
  }

  test("a stray .tmp alone (crash before any swap) is invisible") {
    val dir = freshDir()
    val fs = Dfs.fs(spark, dir.toString)
    val p = new Path(dir, "marker")
    val out = fs.create(new Path(dir, "marker.tmp"), true)
    out.write("99".getBytes("UTF-8")); out.close()
    assert(!Dfs.existsSmall(fs, p), "never-acknowledged write must not surface")
    Dfs.writeSmall(fs, p, "16")
    assert(Dfs.readSmallString(fs, p) === "16")
  }
}
