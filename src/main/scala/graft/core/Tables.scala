package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated tables (TESTDATA.md).
  *
  * Every engine query reads through here so scan behavior is uniform:
  * plain columnar parquet scans that Catalyst can push filters into and
  * prune columns from. At cluster scale these would be partitioned
  * tables (e.g. by snapshot month); locally they are single files.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(all.contains(name), s"unknown table $name")
    if (name == "events") {
      // the driver wrote ts as parquet TIMESTAMP(NANOS), which Spark
      // rejects; read nanos as long (legacy conf) and convert via
      // INTEGER division (a double division would lose precision on
      // ~1e18 nano values)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
