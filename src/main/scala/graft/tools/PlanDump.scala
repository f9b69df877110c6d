package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of registered queries —
  * the `.explain("formatted")` audit loop (broadcasts where intended,
  * scans pruned/pushed, no stray shuffles). Not part of the library
  * surface.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> [name ...]
  * (no names = every registered query).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
  }
}
