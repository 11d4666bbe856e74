package graft

import org.apache.spark.sql.SparkSession

object TmpRepro2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Seq((1L, "en"), (2L, "de"), (3L, "en")).toDF("doc_id", "lang")
      .createOrReplaceTempView("t_docs")
    Seq((1L, 3L), (2L, 1L)).toDF("doc_id", "dup_of")
      .createOrReplaceTempView("t_flag")
    val sql =
      """SELECT x.doc_id AS doc_id, f.dup_of AS dup_of
        |FROM t_docs x LEFT JOIN t_flag f ON f.doc_id = x.doc_id
        |WHERE f.dup_of IN (SELECT doc_id FROM t_docs WHERE lang = 'en')""".stripMargin
    println("stock: " + spark.sql(sql).collect().sortBy(_.toString).toSeq)
    println("door:  " + graft.sql.CqcSql.solve(spark, sql).collect().sortBy(_.toString).toSeq)
    println("explain:\n" + graft.sql.CqcSql.explain(spark, sql))
    spark.stop()
  }
}
