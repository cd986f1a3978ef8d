package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan of registered queries.
  * `sbt "runMain graft.Explain sfDir q1 q2 ..."` (no names = all).
  * The plan-shape review loop: after a query goes oracle-green, read its
  * plan here and iterate until it is the plan you'd want at 100 TB
  * (broadcasts where intended, pushed filters, no stray exchanges). */
object Explain {
  def main(args: Array[String]): Unit = {
    val Seq(sfDir, names @ _*) = args.toSeq: @unchecked
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        println(s"==== $name ====")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"(failed to plan: $e)") }
      }
    spark.stop()
  }
}
