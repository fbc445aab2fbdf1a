package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator surface mapped from the reference's operator
  * inventory (SURVEY §2) onto the driver's TPC-H-ish test tables. Every
  * query here has a DuckDB oracle in SparkEntry.oracleSql; numeric outputs
  * are decimal/integer only (float aggregation order is engine-specific and
  * would break hash comparison).
  */
object RelationalOps {

  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** q1: pricing summary — groupBy aggregate with integer-exact sums
    * (A8-style counters at relational scale). Money crosses the oracle
    * boundary as integer cents (BIGINT): DECIMAL physical encodings hash
    * differently across engines even when values are identical
    * (CORRECTNESS_r01 q1/q3 post-mortem), integer cents are bit-identical
    * everywhere. _e2 = cents, _e4 = cents x discount-percent units. */
  def q1Pricing(s: SparkSession, dir: String): DataFrame = {
    val qtyE2 = (col("l_quantity").cast("decimal(18,2)") * 100).cast("long")
    val priceE2 = (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    val discE2 = (col("l_discount").cast("decimal(18,2)") * 100).cast("long")
    table(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(qtyE2).as("sum_qty_e2"),
        sum(priceE2).as("sum_base_price_e2"),
        sum(priceE2 * (lit(100L) - discE2)).as("sum_disc_price_e4"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** q2: revenue per market segment — broadcast dim join (J1-class). */
  def q2SegmentRevenue(s: SparkSession, dir: String): DataFrame = {
    val orders = table(s, dir, "orders")
    val cust = table(s, dir, "customer")
    orders.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        // integer cents across the oracle boundary (see q1 note)
        sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
          .as("revenue_e2"))
      .orderBy("c_mktsegment")
  }

  /** q3: argmax per group — top-1 window (O4, test_tables.py:284-292). */
  def q3BestOrderPerCustomer(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    table(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("o_custkey"),
        col("o_orderkey").as("best_order"),
        // integer cents across the oracle boundary (see q1 note)
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("best_price_e2"))
      .orderBy("o_custkey")
  }

  /** q4: left-anti join — the checkpoint-resume primitive (S7). */
  def q4CustomersWithoutOrders(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "customer")
      .join(table(s, dir, "orders"),
            col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  /** q5: left-semi join — selective work-list filter (F2/J5). */
  def q5ActiveSuppliers(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "supplier")
      .join(table(s, dir, "lineitem")
              .filter(col("l_shipdate") >= lit("2000-06-01").cast("timestamp")),
            col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy("s_suppkey")

  /** q6: broadcast interval (range) join — the crop-config lookup J1
    * (joradp_parse.py:84-90) re-expressed over the documents table. */
  def q6RangeConfigJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cfg = Seq(
      (0L, 99L, "band_a"), (100L, 249L, "band_b"),
      (250L, 449L, "band_c"), (450L, 999L, "band_d"))
      .toDF("lo", "hi", "band")
    table(s, dir, "documents")
      .withColumn("k", col("doc_id") % 1000)
      .join(broadcast(cfg), col("k").between(col("lo"), col("hi")))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_docs"),
           min(col("doc_id")).as("min_doc"),
           max(col("doc_id")).as("max_doc"))
      .orderBy("band")
  }

  /** q7: gap-threshold sessionization — the relational form of the
    * reference's 1-D clustering (A2, table_detection.py:387-441):
    * lag + cumulative sum over event time, 1800 s gap. */
  def q7Sessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    table(s, dir, "events")
      .withColumn("sec", col("ts").cast("timestamp").cast("long"))
      .withColumn("gap", col("sec") - lag(col("sec"), 1).over(w))
      .withColumn("brk", when(col("gap").isNull || col("gap") > 1800, 1).otherwise(0))
      .withColumn("sess", sum(col("brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"))
      .agg(max(col("sess")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** q8: proximity dedup — lag-window form of A3
    * (table_detection.py:461-481): drop events within 60 s of the previous
    * event of the same user. */
  def q8EventDedup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    table(s, dir, "events")
      .withColumn("sec", col("ts").cast("timestamp").cast("long"))
      .withColumn("gap", col("sec") - lag(col("sec"), 1).over(w))
      .filter(col("gap").isNull || col("gap") > 60)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_kept"))
      .orderBy("user_id")
  }

  /** q9: mean + banding (A6, textheight-median.py:204-219 — the file name
    * says median, the code computes mean; we keep mean): per-lang mean
    * char count, band = n_chars div (3*avg/10), integer arithmetic only. */
  def q9Banding(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
    val avg = docs.groupBy(col("lang"))
      .agg(floor(sum(col("n_chars")).cast("double") / count(lit(1)))
             .cast("long").as("avg_chars"))
    docs.join(avg, "lang")
      .withColumn("tol", greatest(lit(1L), expr("(3 * avg_chars) div 10")))
      .withColumn("band", expr("n_chars div tol"))
      .groupBy(col("lang"), col("band"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "band")
  }

  /** q10: row x column grid cells (J6, TATR notebook cell 45): cells as the
    * interval intersection of sorted rows and columns. */
  def q10GridCells(s: SparkSession, dir: String): DataFrame = {
    val rows = table(s, dir, "lineitem").select(col("l_linenumber").as("rid"))
      .distinct()
      .withColumn("ry1", col("rid") * 20)
      .withColumn("ry2", col("rid") * 20 + 18)
    val cols = table(s, dir, "part").select(col("p_size").as("cid"))
      .distinct()
      .withColumn("cx1", col("cid") * 15)
      .withColumn("cx2", col("cid") * 15 + 12)
    rows.crossJoin(cols)
      .select(col("rid"), col("cid"),
              col("cx1").as("x1"), col("ry1").as("y1"),
              col("cx2").as("x2"), col("ry2").as("y2"))
      .orderBy("rid", "cid")
  }

  /** q12: embedded-JSON parsing — the reference's ast.literal_eval of
    * stringified lists in work-list CSVs (S8,
    * joradp_correct_add_table_data.py:107) re-expressed as from_json over
    * the events props column. */
  def q12JsonExtract(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("k")).as("sum_k"),
           min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** q13: the banded re-order correction pass (A6 pipeline op,
    * textheight-median.py:204-222) over synthetic integer regions derived
    * from orders — DuckDB-oracles BandReorder.reorder's relational core
    * (floor-mean tolerance, integer band rounding, (band, x) rank).
    *
    * SYNCED DERIVATION — the synthetic region columns below are duplicated
    * verbatim in SQL in SparkEntry.oracleSql("q13_reband") CTE `r`; any
    * edit here must change that CTE identically (the r2 tie-safety bug was
    * exactly this pair drifting). */
  def q13Reband(s: SparkSession, dir: String): DataFrame = {
    val regions = table(s, dir, "orders")
      .filter(col("o_orderkey") % 13 === 0)
      .select(
        col("o_orderkey").as("region_id"),
        (col("o_orderkey") % 40).as("doc_id"),
        (col("o_orderkey") % 5).as("page"),
        (col("o_orderkey") * 7 % 300).as("x1"),
        (col("o_orderkey") * 11 % 400).as("y1"))
      .withColumn("y2", col("y1") + 20 + col("region_id") % 15)
      // position must be UNIQUE per (doc, page) — it is the final window
      // tiebreaker in reorder(); a non-unique synthetic position (e.g.
      // region_id % 100) leaves full sort-key ties (orderkeys o and
      // o+31200 collide on every other derived column) and ROW_NUMBER
      // then orders them engine-arbitrarily, breaking the oracle compare
      .withColumn("position", col("region_id"))
    graft.pipeline.BandReorder.reorder(regions)
      .select(col("doc_id"), col("page"), col("position"), col("region_id"))
      .orderBy("doc_id", "page", "position")
  }

  /** q14: the J7 token-in-crop join relationally (TATR cell 27
    * objects_to_crops): synthetic integer tokens vs padded table crops,
    * IoB >= 0.5 selection expressed exactly-integer (2*inter >= area),
    * coordinates translated into the crop frame.
    *
    * SYNCED DERIVATION — the token/crop column formulas are duplicated in
    * SparkEntry.oracleSql("q14_token_crop") CTEs `tokens`/`crops`; edit
    * both sides together. */
  def q14TokenCrop(s: SparkSession, dir: String): DataFrame = {
    val tokens = table(s, dir, "lineitem")
      .filter(col("l_orderkey") % 53 === 0)
      .select(
        col("l_orderkey").as("token_id"),
        (col("l_orderkey") % 8).as("page"),
        (col("l_orderkey") * 19 % 600).as("tx1"),
        (col("l_orderkey") * 31 % 800).as("ty1"))
      .withColumn("tx2", col("tx1") + 30)
      .withColumn("ty2", col("ty1") + 12)
    val crops = table(s, dir, "part")
      .filter(col("p_partkey") % 41 === 0)
      .select(
        col("p_partkey").as("crop_id"),
        (col("p_partkey") % 8).as("page"),
        (col("p_partkey") * 7 % 400).as("cx1"),
        (col("p_partkey") * 11 % 500).as("cy1"))
      .withColumn("cx2", col("cx1") + 200)
      .withColumn("cy2", col("cy1") + 250)
    tokens.join(crops, "page")
      .withColumn("iw", greatest(lit(0L), least(col("tx2"), col("cx2")) -
                                          greatest(col("tx1"), col("cx1"))))
      .withColumn("ih", greatest(lit(0L), least(col("ty2"), col("cy2")) -
                                          greatest(col("ty1"), col("cy1"))))
      .withColumn("inter", col("iw") * col("ih"))
      .withColumn("tarea", (col("tx2") - col("tx1")) * (col("ty2") - col("ty1")))
      // IoB >= 0.5 ⟺ 2·inter >= token area (exact integers, no division)
      .filter(col("inter") * 2 >= col("tarea"))
      .select(col("crop_id"), col("token_id"),
              (col("tx1") - col("cx1")).as("rx1"),
              (col("ty1") - col("cy1")).as("ry1"),
              (col("tx2") - col("cx1")).as("rx2"),
              (col("ty2") - col("cy1")).as("ry2"))
      .orderBy("crop_id", "token_id")
  }

  /** q11: IoU best-match join (J4, test_tables.py:279-332): synthetic
    * integer boxes from two tables, best-IoU GT per prediction via window
    * argmax; all ratios kept in scaled integer space (iou_e6).
    *
    * SYNCED DERIVATION — the pred/gt box formulas are duplicated in
    * SparkEntry.oracleSql("q11_iou_match") CTEs `preds`/`gts`; edit both
    * sides together. */
  def q11IouBestMatch(s: SparkSession, dir: String): DataFrame = {
    val preds = table(s, dir, "orders")
      .filter(col("o_orderkey") % 97 === 0)
      .select(
        col("o_orderkey").as("pred_id"),
        (col("o_orderkey") % 4).as("page"),
        (col("o_orderkey") * 13 % 400).as("px1"),
        (col("o_orderkey") * 29 % 400).as("py1"))
      .withColumn("px2", col("px1") + 40 + col("pred_id") % 60)
      .withColumn("py2", col("py1") + 30 + col("pred_id") % 45)
    val gts = table(s, dir, "customer")
      .filter(col("c_custkey") % 31 === 0)
      .select(
        col("c_custkey").as("gt_id"),
        (col("c_custkey") % 4).as("page"),
        (col("c_custkey") * 17 % 400).as("gx1"),
        (col("c_custkey") * 23 % 400).as("gy1"))
      .withColumn("gx2", col("gx1") + 45 + col("gt_id") % 55)
      .withColumn("gy2", col("gy1") + 35 + col("gt_id") % 40)
    val joined = preds.join(gts, "page")
      .withColumn("iw", greatest(lit(0L), least(col("px2"), col("gx2")) -
                                          greatest(col("px1"), col("gx1"))))
      .withColumn("ih", greatest(lit(0L), least(col("py2"), col("gy2")) -
                                          greatest(col("py1"), col("gy1"))))
      .withColumn("inter", col("iw") * col("ih"))
      .withColumn("parea", (col("px2") - col("px1")) * (col("py2") - col("py1")))
      .withColumn("garea", (col("gx2") - col("gx1")) * (col("gy2") - col("gy1")))
      .withColumn("iou_e6",
        expr("(inter * 1000000) div (parea + garea - inter)"))
    val w = Window.partitionBy(col("pred_id"))
      .orderBy(col("iou_e6").desc, col("gt_id").asc)
    joined.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("pred_id"), col("gt_id"), col("iou_e6"),
              (col("iou_e6") >= 500000).cast("int").as("matched"))
      .orderBy("pred_id")
  }
}
