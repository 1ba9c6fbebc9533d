package graft

/** Dev tool: dump ONE registered query's result to parquet for ad-hoc
  * oracle comparison while iterating (the round driver and
  * tools/check_oracle.py always run the FULL set via graft.Verify).
  *
  * {{{ sbt "Test/runMain graft.QueryProbe q_name /root/testdata/sf0.01 /tmp/out" }}}
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSession.spark
    val df = queries.Registry.byName(args(0)).fn(spark, args(1))
    df.write.mode("overwrite").parquet(args(2))
    println("ROWS=" + spark.read.parquet(args(2)).count())
  }
}
