package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch main for isolating per-stage timings (not part of the
  * driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = graft.core.Tables(spark, dir, "documents")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    time("shingleSets")(graft.dedup.Dedup.shingleSets(docs).count())
    time("simhash")(graft.dedup.Dedup.simhash(docs).count())
    time("minhash_sig")(graft.dedup.Dedup.minhashSignature(docs).count())
    time("lsh_pairs")(graft.dedup.Dedup.minhashLshPairs(docs).count())
    time("simhash_pairs")(graft.dedup.Dedup.simhashPairs(docs).count())
    val a12 = graft.registry.LoadQueries.queries("a12_horizontal_sum")(spark, dir)
    time("a12_1st")(a12.count())
    time("a12_2nd")(a12.count())
    println("=== a12 plan ===")
    a12.explain("formatted")
    println("=== act_demand_blank plan ===")
    graft.extract.Extracts.actDemandBlank(spark, dir).explain("formatted")
    spark.stop()
  }
}
