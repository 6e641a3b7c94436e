package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev-only plan inspector: prints a registered query's Window nodes so
  * partition specs can be eyeballed before the PlanShapeSpec sweep runs
  * (it caught d31's constant-folded-away partition spec — a lit(0)
  * group column folds out of the window spec unless the frame is
  * checkpointed first). Usage: runMain graft.tools.PlanDump <query> <sfDir>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(spark, args(1))
    val plan = df.queryExecution.executedPlan.toString
    plan.split("\n").filter(_.contains("Window")).foreach(println)
    println("== done ==")
  }
}
