package graft

import org.apache.spark.sql.SparkSession

/** Round-8 verdict ask #8: measure the per-query cost of the
  * GraftExtensions injection load (delegating parser, resolution
  * rule, two planner strategies, 8 registered functions) that rides
  * every query. Run twice — SPARK_GRAFT_EXT=1/0 — and compare; the
  * workload is a tiny parse+plan+execute loop so fixed per-query
  * costs dominate. Result goes to SCALE.md; not part of the driver
  * contract. */
object ExtOverhead {
  def main(args: Array[String]): Unit = {
    val withExt = sys.env.get("SPARK_GRAFT_EXT").forall(_ == "1")
    val b = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    val spark = (if (withExt) b.config("spark.sql.extensions", "graft.GraftExtensions")
                 else b).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def loop(n: Int): Double = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) {
        // parse (through the delegating parser when injected) + plan
        // (through the injected rules/strategies) + a tiny execution
        spark.sql(s"SELECT sum(id * 2) AS s FROM range(0, 1000) WHERE id % 3 = $i")
          .collect()
        i += 1
      }
      (System.nanoTime() - t0) / 1e9
    }
    loop(100) // JIT warmup, uncounted
    val runs = (1 to 5).map(_ => loop(200))
    println(f"ext=$withExt runs=${runs.map(r => f"$r%.3f").mkString(",")} " +
      f"best=${runs.min}%.3f s / 200 queries = ${runs.min * 5}%.2f ms/query")
    spark.stop()
  }
}
