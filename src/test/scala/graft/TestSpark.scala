package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (UTC, matching the driver). */
object TestSpark {
  /** Fixture root for the driver-generated parquet tables (overridable
    * for a machine with a different layout — r18 ADVICE: specs were
    * hard-coupling the absolute path). */
  val testdataRoot: String =
    sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata")
  def sfDir(sf: String): String = s"$testdataRoot/sf$sf"

  /** Temp dir that is recursively deleted on JVM exit (plain
    * File.deleteOnExit only handles empty directories). */
  def tempDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      try Files.walk(d).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => { Files.deleteIfExists(p); () })
      catch { case _: Throwable => () }
    }))
    d.toString
  }

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
