package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Planted-star skew harness for the connected-components loop: ONE hub
  * node with H leaves — the exact shape where the default window-min
  * formulation degrades (every hub row hashes to one task, which then
  * sorts H rows alone while 31 cores idle) and the hub-split two-level
  * min (`spark.graft.cc.hubDegree`) is supposed to win. Measures both
  * formulations at growing H and verifies the label assignment exactly
  * at every cell (all nodes -> hub's id), so the A/B can never trade
  * correctness for speed. The star converges in one cycle by
  * construction; the harness therefore isolates the per-cycle star cost
  * (the thing the split changes) from cycle count (which the split does
  * not touch).
  *
  * Usage: runMain graft.tools.CCSkewBench [H csv] [hubDegree csv]
  * Defaults: H = 1e6,4e6,16e6; thresholds = 0,500000,-1
  * (0 = forced window path, -1 = AUTO (conf unset; the probes decide),
  * positive = forced hub-split at that degree).
  */
object CCSkewBench {
  def main(args: Array[String]): Unit = {
    val hs = args.headOption.getOrElse("1000000,4000000,16000000")
      .split(",").map(_.trim.toLong)
    val salts = args.lift(1).getOrElse("0,500000,-1")
      .split(",").map(_.trim.toLong)

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def star(h: Long): (DataFrame, DataFrame) = {
      // hub 0, leaves 1..h; seed roster must cover every node
      val edges = spark.range(1, h + 1)
        .select(lit(0L).as("a"), $"id".as("b"))
      val seed = spark.range(0, h + 1)
        .select($"id".as("doc_id"), $"id".as("lbl"))
      (seed, edges)
    }

    def setT(t: Long): Unit =
      if (t < 0) spark.conf.unset("spark.graft.cc.hubDegree") // AUTO
      else if (t == 0) spark.conf.set("spark.graft.cc.hubDegree", "window")
      else spark.conf.set("spark.graft.cc.hubDegree", t.toString)

    // warmup: small star on both paths (JIT + codegen)
    for (s <- salts) {
      setT(s)
      graft.datapipe.Dedup.connectedComponents(
        star(1000)._1, star(1000)._2, 4).count()
    }

    println(f"${"H"}%-10s ${salts.map(s => f"hubT=$s%-10d").mkString}")
    for (h <- hs) {
      val row = salts.map { s =>
        setT(s)
        val (seed, edges) = star(h)
        val t0 = System.nanoTime()
        val labels = graft.datapipe.Dedup.connectedComponents(seed, edges, 4)
        // exact verification folded into the timed consume: every node
        // labeled, every label the hub's id
        val bad = labels.filter($"lbl" =!= 0L).count()
        val n = labels.count()
        val dt = (System.nanoTime() - t0) / 1e9
        require(bad == 0L && n == h + 1,
          s"hubT=$s H=$h produced $n labels with $bad wrong — correctness bug")
        spark.catalog.clearCache()
        f"$dt%-9.2f "
      }
      println(f"$h%-10d ${row.mkString}")
    }
    spark.stop()
  }
}
