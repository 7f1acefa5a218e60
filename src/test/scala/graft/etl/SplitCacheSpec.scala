package graft.etl

import graft.SparkSpec
import java.nio.file.Files

/** Write-once memoization semantics (S2): second writer is a no-op, and
  * the cached scan equals the recomputed relation.
  */
class SplitCacheSpec extends SparkSpec {

  test("writeOnce materializes once and replays identically") {
    val dir = Files.createTempDirectory("splitcache").toString
    val live = Splits.leaveTwoOut(spark, sf()).orderBy("user_id", "domain")
    val first = SplitCache.writeOnce(spark, live, s"$dir/splits")
    val mtime = Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$dir/splits/_SUCCESS"))
    // second call must not rewrite (mode ignore) and must read same rows
    val second = SplitCache.writeOnce(spark,
      sys.error("recompute must not be forced"): org.apache.spark.sql.DataFrame,
      s"$dir/splits")
    assert(Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$dir/splits/_SUCCESS")) == mtime)
    assert(second.count() == first.count())
    assert(second.orderBy("user_id", "domain").collect()
      .sameElements(live.collect()))
  }

  test("partial write (no _SUCCESS marker) is recomputed, not trusted") {
    val dir = Files.createTempDirectory("splitcache").toString
    // simulate a crashed writer: directory exists, data file present,
    // no _SUCCESS commit marker
    val path = java.nio.file.Paths.get(s"$dir/splits")
    Files.createDirectories(path)
    Files.write(path.resolve("part-00000.parquet"), Array[Byte](0, 1, 2))
    val live = Splits.leaveTwoOut(spark, sf()).orderBy("user_id", "domain")
    val recovered = SplitCache.writeOnce(spark, live, s"$dir/splits")
    assert(Files.exists(path.resolve("_SUCCESS")))
    assert(recovered.count() == live.count())
  }
}
