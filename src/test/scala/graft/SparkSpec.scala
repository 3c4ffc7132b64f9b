package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for operator specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSpec.session

  /** Temp directory that is ACTUALLY removed at JVM exit.
    * `File.deleteOnExit` silently no-ops on non-empty directories, so
    * parquet-filled test dirs accumulated across runs (ADVICE r13) —
    * this registers one shutdown-hook recursive walk instead.
    */
  def tempDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(tag)
    SparkSpec.registerForCleanup(d)
    d.toString
  }

  /** [[tempDir]] as a File — the shape most specs consume. */
  def tempDirFile(tag: String): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory(tag)
    SparkSpec.registerForCleanup(d)
    d.toFile
  }

  override def afterAll(): Unit = super.afterAll()
}

object SparkSpec {
  private val cleanupDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()
  private lazy val cleanupHook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      cleanupDirs.forEach { root =>
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
            .foreach(p => try java.nio.file.Files.deleteIfExists(p)
            catch { case _: Throwable => () })
        } catch { case _: Throwable => () }
      }))
  }
  def registerForCleanup(p: java.nio.file.Path): Unit = {
    cleanupHook
    cleanupDirs.add(p)
    ()
  }

  // One session per JVM: sbt forks a single test JVM, so specs share it.
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // match Verify/Bench: the events test table stores TIMESTAMP(NANOS)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
