package graft

import org.apache.spark.sql.SparkSession

/** Plan-pin aid (test tree only): print the door's dry-run routing dump
  * for named SparkEntry SQL-door entries — the evidence BASELINE.md
  * records next to isolated re-measures.
  *
  *   sbt "Test/runMain graft.PinPlans [sfDir]"
  */
object PinPlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val t = graft.sources.Tables
    // sql_cqc_q2 (TPC-H Q2 text, 9 relations incl. the MIN subquery)
    t.part(spark, d).createOrReplaceTempView("q2_part")
    t.supplier(spark, d).createOrReplaceTempView("q2_supplier")
    t.partsupp(spark, d).createOrReplaceTempView("q2_partsupp")
    t.nation(spark, d).createOrReplaceTempView("q2_nation")
    t.region(spark, d).createOrReplaceTempView("q2_region")
    println("=== sql_cqc_q2 ===")
    println(graft.sql.CqcSql.explain(spark,
      """SELECT s.s_acctbal AS s_acctbal, s.s_name AS s_name, n.n_name AS n_name,
        |       p.p_partkey AS p_partkey, p.p_brand AS p_brand,
        |       ps.ps_supplycost_c AS ps_supplycost_c
        |FROM q2_part p, q2_supplier s, q2_partsupp ps, q2_nation n, q2_region r
        |WHERE p.p_partkey = ps.ps_partkey AND s.s_suppkey = ps.ps_suppkey
        |  AND p.p_size >= 15 AND p.p_type = 'STANDARD'
        |  AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
        |  AND r.r_name = 'EUROPE'
        |  AND ps.ps_supplycost_c =
        |      (SELECT MIN(ps2.ps_supplycost_c)
        |       FROM q2_partsupp ps2, q2_supplier s2, q2_nation n2, q2_region r2
        |       WHERE ps2.ps_partkey = ps.ps_partkey AND s2.s_suppkey = ps2.ps_suppkey
        |         AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
        |         AND r2.r_name = 'EUROPE')""".stripMargin))
    // sql_ref_q9 (trade band self-join)
    t.trade(spark, d).createOrReplaceTempView("Trade")
    println("=== sql_ref_q9 ===")
    println(graft.sql.CqcSql.explain(spark,
      """SELECT t1.T_ID AS t1_id, CAST(UNIX_MILLIS(t1.T_DTS) AS BIGINT) AS t1_dts_ms,
        |    t1.T_TT_ID AS t1_tt_id, t1.T_TRADE_PRICE AS t1_price,
        |    t2.T_ID AS t2_id, CAST(UNIX_MILLIS(t2.T_DTS) AS BIGINT) AS t2_dts_ms,
        |    t2.T_TT_ID AS t2_tt_id, t2.T_TRADE_PRICE AS t2_price,
        |    t1.T_S_SYMB AS t_s_symb, t1.T_CA_ID AS t_ca_id
        |FROM Trade t1, Trade t2
        |WHERE t1.T_TT_ID LIKE '%B%' AND t2.T_TT_ID LIKE '%S%'
        |    AND t1.T_CA_ID = t2.T_CA_ID AND t1.T_S_SYMB = t2.T_S_SYMB
        |    AND t1.T_DTS <= t2.T_DTS AND t1.T_DTS + interval '90' day >= t2.T_DTS
        |    AND t1.T_TRADE_PRICE * 1.2 < t2.T_TRADE_PRICE""".stripMargin))
    // the three WCOJ entries + rank entries are API-level (no SQL door);
    // their plan shape is pinned by PlanShapeSpec/WcojSpec — print the
    // cost-picked hypercube side for the square as the pin
    //
    // cqc_rst (r15 pin evidence): the driver's 30x/16x sweep reading on
    // untouched code — dump the routed plan for the IDENTICAL body as
    // SQL text (R(a,b) ⋈ S(b,c) ⋈ T(c,e,f), r.a < t.e)
    import org.apache.spark.sql.functions.col
    t.edges(spark, d).toDF("a", "b").createOrReplaceTempView("rst_r")
    t.edges(spark, d).toDF("b", "c").createOrReplaceTempView("rst_s")
    t.lineitem(spark, d).where(col("l_orderkey") % 200 === 1)
      .select((col("l_partkey") % 100).as("c"), col("l_quantity").as("e"),
        col("l_suppkey").as("f")).createOrReplaceTempView("rst_t")
    println("=== cqc_rst (as text) ===")
    println(graft.sql.CqcSql.explain(spark,
      """SELECT r.a AS a, r.b AS b, s.c AS c, t.f AS f
        |FROM rst_r r, rst_s s, rst_t t
        |WHERE r.b = s.b AND s.c = t.c AND r.a < t.e""".stripMargin))
    // wcoj_square (r15 pin evidence): the cost-picked hypercube side at
    // THIS parallelism + input stats — calls the REAL Lftj.autoSide
    // (package-private; this main lives in package graft for exactly
    // that), so the printed pin can never drift from what the engine
    // picks
    val ew = t.edgesWide(spark, d)
    val statBytes = ew.queryExecution.optimizedPlan.stats.sizeInBytes
    val cores = spark.sparkContext.defaultParallelism.max(1)
    println(s"=== wcoj_square === edgesWide statBytes=$statBytes cores=$cores " +
      s"side=${graft.wcoj.Lftj.autoSide(spark, statBytes, 4)}")
    spark.stop()
  }
}
