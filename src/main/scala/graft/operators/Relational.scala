package graft.operators

import graft.{Graft, GraftQuery}
import graft.functions.SafeMath._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Reference-shaped relational operators (SURVEY.md §2.2–§2.5) re-expressed
  * as single declarative DataFrame plans over the driver testdata.
  *
  * The reference enumerated groups with driver loops of filter+sum actions
  * (156 jobs for the alphabet stat, `pyspark_stats.py:82-94`); every query
  * here collapses that shape to ONE `groupBy` — one shuffle, partial+final
  * hash aggregation, whole-stage codegen.
  *
  * Scale stance (100 TB): joins against genuinely tiny dims (`nation`,
  * `region`, literal token tables) carry an explicit `broadcast` hint; joins
  * against tables that grow with the dataset (`part`, `customer`, `orders`)
  * are left unhinted so Catalyst/AQE picks broadcast at small SF and
  * sort-merge/shuffled-hash — with AQE skew splitting — at scale.
  */
object Relational {

  /** P2+J1+A1 — group by first letter of part name, total quantity.
    * Reference: 26-letter driver loop, `pyspark_stats.py:82-94`.
    */
  object AlphabetCount extends GraftQuery {
    val name = "q_alphabet_count"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val li = Graft.table(spark, sfDir, "lineitem")
      val part = Graft.table(spark, sfDir, "part")
      li.join(part, li("l_partkey") === part("p_partkey"))
        .groupBy(substring(col("p_name"), 1, 1).as("letter"))
        .agg(exactSum(col("l_quantity")).as("total_qty"), count(lit(1)).as("n_items"))
        .orderBy("letter")
    }
    val oracle = Some(
      """SELECT substr(p_name,1,1) AS letter,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS total_qty,
        |       count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** A3 — grouped average with ÷0→0 semantics (`pyspark_stats.py:91-94`). */
  object AlphabetAvg extends GraftQuery {
    val name = "q_alphabet_avg"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val li = Graft.table(spark, sfDir, "lineitem")
      val part = Graft.table(spark, sfDir, "part")
      // two-phase distinct rewrite: aggregating to (letter, orderkey) first
      // makes the order count a plain row count and the quantity sum a
      // re-sum of exact decimal partials — countDistinct beside a plain sum
      // would Expand the joined fact 2×. Same bits (decimal addition is
      // associative), half the aggregated row volume.
      li.join(part, li("l_partkey") === part("p_partkey"))
        .groupBy(substring(col("p_name"), 1, 1).as("letter"), col("l_orderkey"))
        .agg(sum(graft.plans.DecimalExpressions.double_to_decimal6(col("l_quantity"))).as("q"))
        .groupBy("letter")
        .agg(sum(col("q")).cast("double").as("sq"), count(lit(1)).as("n_orders"))
        .select(
          col("letter"),
          safeDiv(col("sq"), col("n_orders").cast("double")).as("avg_qty_per_order"),
          col("n_orders"))
        .orderBy("letter")
    }
    val oracle = Some(
      """SELECT substr(p_name,1,1) AS letter,
        |       CASE WHEN count(DISTINCT l_orderkey) = 0 THEN 0.0
        |            ELSE CAST(sum(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE)
        |                 / CAST(count(DISTINCT l_orderkey) AS DOUBLE) END AS avg_qty_per_order,
        |       count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** J1 — broadcast dim chain customer→nation→region
    * (reference hand-rolls this with pandas probes, `pyspark_stats.py:27-37`).
    */
  object BcastJoin extends GraftQuery {
    val name = "q_bcast_join"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val c = Graft.table(spark, sfDir, "customer")
      val n = Graft.table(spark, sfDir, "nation")
      val r = Graft.table(spark, sfDir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select(
          col("c_custkey"), col("c_name"),
          col("n_name").as("nation"), col("r_name").as("region"))
        .orderBy("c_custkey")
    }
    val oracle = Some(
      """SELECT c_custkey, c_name, n_name AS nation, r_name AS region
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY c_custkey""".stripMargin)
  }

  /** P7 — semi-join restriction (`pyspark_yolox.py:147-148`). */
  object SemiJoin extends GraftQuery {
    val name = "q_semi_join"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val s = Graft.table(spark, sfDir, "supplier")
      val li = Graft.table(spark, sfDir, "lineitem")
      s.join(li, s("s_suppkey") === li("l_suppkey"), "left_semi")
        .select(col("s_nationkey")).distinct()
        .orderBy("s_nationkey")
    }
    val oracle = Some(
      """SELECT DISTINCT s_nationkey FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
        |ORDER BY s_nationkey""".stripMargin)
  }

  /** Anti-join — customers with no high-value order (absent from the
    * reference; completes the join family). The 400k threshold keeps the
    * result non-empty at every scale factor (plain "no orders" is empty —
    * the synthetic data covers every customer).
    */
  object AntiJoin extends GraftQuery {
    val name = "q_anti_join"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val c = Graft.table(spark, sfDir, "customer")
      val o = Graft.table(spark, sfDir, "orders")
        .filter(col("o_totalprice") > lit(400000.0))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    }
    val oracle = Some(
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** P3 — substring-containment "cities" (reference loops 6 cities ×
    * 6 sums = 36 jobs, `pyspark_stats.py:108-119`). One pass: theta-join the
    * fact against a broadcast literal token dim on `contains`.
    */
  object CityAvg extends GraftQuery {
    val name = "q_city_avg"
    private val tokens = Seq("widget", "gizmo", "gear", "bolt", "rod", "plate")
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import spark.implicits._
      val li = Graft.table(spark, sfDir, "lineitem")
      val part = Graft.table(spark, sfDir, "part")
      val dim = tokens.toDF("token")
      li.join(part, li("l_partkey") === part("p_partkey"))
        .join(broadcast(dim), col("p_name").contains(col("token")))
        .groupBy("token")
        .agg(exactSum(col("l_quantity")).as("sq"), count(lit(1)).as("n_items"))
        .select(col("token"),
          safeDiv(col("sq"), col("n_items").cast("double")).as("avg_qty"),
          col("n_items"))
        .orderBy("token")
    }
    private val values = tokens.map(t => s"('$t')").mkString(", ")
    val oracle = Some(
      s"""SELECT token,
         |       CASE WHEN count(*) = 0 THEN 0.0
         |            ELSE CAST(sum(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE)
         |                 / CAST(count(*) AS DOUBLE) END AS avg_qty,
         |       count(*) AS n_items
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN (VALUES $values) tok(token) ON p_name LIKE '%' || token || '%'
         |GROUP BY token ORDER BY token""".stripMargin)
  }

  /** P4 — case-insensitive containment, whole-set vs subset averages
    * (reference `people_in_places_with_people`, `pyspark_stats.py:125-153`).
    */
  object SubsetAvg extends GraftQuery {
    val name = "q_people_places"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val li = Graft.table(spark, sfDir, "lineitem")
      val part = Graft.table(spark, sfDir, "part")
      val isSub = lower(col("p_name")).contains("widget")
      // one scan: conditional aggregation for the subset, then explode the
      // single agg row into the two output metrics (the reference made two
      // full passes, `pyspark_stats.py:126-137`)
      li.join(part, li("l_partkey") === part("p_partkey"))
        .agg(
          exactSum(col("l_quantity")).as("sq_all"),
          count(lit(1)).as("n_all"),
          exactSum(when(isSub, col("l_quantity"))).as("sq_sub"),
          count(when(isSub, 1)).as("n_sub"))
        .select(explode(array(
          struct(lit("avg_all").as("metric"),
            safeDiv(col("sq_all"), col("n_all").cast("double")).as("value")),
          struct(lit("avg_widget_parts").as("metric"),
            safeDiv(coalesce(col("sq_sub"), lit(0.0)),
              col("n_sub").cast("double")).as("value")))).as("r"))
        .select(col("r.metric").as("metric"), col("r.value").as("value"))
        .orderBy("metric")
    }
    val oracle = Some(
      """SELECT 'avg_all' AS metric,
        |       CASE WHEN count(*) = 0 THEN 0.0
        |            ELSE CAST(sum(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE)
        |                 / CAST(count(*) AS DOUBLE) END AS value
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |UNION ALL
        |SELECT 'avg_widget_parts' AS metric,
        |       CASE WHEN count(*) = 0 THEN 0.0
        |            ELSE CAST(sum(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE)
        |                 / CAST(count(*) AS DOUBLE) END AS value
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE lower(p_name) LIKE '%widget%'
        |ORDER BY metric""".stripMargin)
  }

  /** P5 — string-length bands in one pass (reference runs 3 separate
    * filter+sum passes, `pyspark_stats.py:156-200`). Bands sized to the
    * testdata's 7–12-char part names.
    */
  object NameLenBands extends GraftQuery {
    val name = "q_namelen_bands"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val li = Graft.table(spark, sfDir, "lineitem")
      val part = Graft.table(spark, sfDir, "part")
      val band = when(length(col("p_name")) < 9, "under_9")
        .when(length(col("p_name")) <= 10, "9_to_10")
        .otherwise("over_10")
      li.join(part, li("l_partkey") === part("p_partkey"))
        .groupBy(band.as("band"))
        .agg(exactSum(col("l_quantity")).as("sq"), count(lit(1)).as("n_items"))
        .select(col("band"),
          safeDiv(col("sq"), col("n_items").cast("double")).as("avg_qty"),
          col("n_items"))
        .orderBy("band")
    }
    val oracle = Some(
      """SELECT CASE WHEN length(p_name) < 9 THEN 'under_9'
        |            WHEN length(p_name) <= 10 THEN '9_to_10'
        |            ELSE 'over_10' END AS band,
        |       CASE WHEN count(*) = 0 THEN 0.0
        |            ELSE CAST(sum(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE)
        |                 / CAST(count(*) AS DOUBLE) END AS avg_qty,
        |       count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** A6 — distinct values (reference: `np.unique` on a collected column,
    * `pyspark_dominant.py:76-78`). Stays distributed here.
    */
  object DistinctValues extends GraftQuery {
    val name = "q_distinct_colors"
    def run(spark: SparkSession, sfDir: String): DataFrame =
      Graft.table(spark, sfDir, "part")
        .select(col("p_brand")).distinct().orderBy("p_brand")
    val oracle = Some("SELECT DISTINCT p_brand FROM part ORDER BY p_brand")
  }

  /** A7 — value counts in one shuffle (reference rescans the full collected
    * table once per distinct key, O(k·N), `pyspark_dominant.py:80-84`).
    */
  object ValueHistogram extends GraftQuery {
    val name = "q_color_histogram"
    def run(spark: SparkSession, sfDir: String): DataFrame =
      Graft.table(spark, sfDir, "part")
        .groupBy("p_brand").agg(count(lit(1)).as("n")).orderBy("p_brand")
    val oracle = Some(
      "SELECT p_brand, count(*) AS n FROM part GROUP BY 1 ORDER BY 1")
  }

  /** A9 — mode / argmax-by-count with a total tie-break order
    * (reference: k-means `palette[argmax(counts)]`, `pyspark_dominant.py:47-48`).
    */
  object Mode extends GraftQuery {
    val name = "q_mode"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val counts = Graft.table(spark, sfDir, "part")
        .groupBy("p_type", "p_brand").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("p_type")
        .orderBy(col("n").desc, col("p_brand").asc)
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("p_type"), col("p_brand").as("mode_brand"), col("n"))
        .orderBy("p_type")
    }
    val oracle = Some(
      """SELECT p_type, p_brand AS mode_brand, n FROM (
        |  SELECT p_type, p_brand, count(*) AS n,
        |         row_number() OVER (PARTITION BY p_type
        |                            ORDER BY count(*) DESC, p_brand ASC) AS rn
        |  FROM part GROUP BY p_type, p_brand)
        |WHERE rn = 1 ORDER BY p_type""".stripMargin)
  }

  /** O1+F8 — nearest of 6 literal centroids in (quantity, discount, tax)
    * space, then histogram (reference: nearest-primary-color argmin +
    * 6 filter+count jobs, `pyspark_dominant.py:107-124`). Integer centroids
    * keep every distance an identical IEEE expression in both engines.
    */
  object ClosestPrimary extends GraftQuery {
    val name = "q_closest_primary"
    private val centroids: Seq[(Int, Int, Int)] =
      Seq((5, 0, 0), (15, 0, 0), (25, 0, 0), (35, 0, 0), (45, 0, 0), (10, 1, 1))
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val li = Graft.table(spark, sfDir, "lineitem")
      val dists = array(centroids.map { case (a, b, c) =>
        (col("l_quantity") - lit(a)) * (col("l_quantity") - lit(a)) +
          (col("l_discount") - lit(b)) * (col("l_discount") - lit(b)) +
          (col("l_tax") - lit(c)) * (col("l_tax") - lit(c))
      }: _*)
      li.select(array_position(dists, array_min(dists)).as("primary_idx"))
        .groupBy("primary_idx").agg(count(lit(1)).as("n"))
        .orderBy("primary_idx")
    }
    private val distSql = centroids.map { case (a, b, c) =>
      s"(l_quantity-$a)*(l_quantity-$a) + (l_discount-$b)*(l_discount-$b) + (l_tax-$c)*(l_tax-$c)"
    }.mkString("[", ", ", "]")
    val oracle = Some(
      s"""SELECT list_indexof(ds, list_aggregate(ds, 'min')) AS primary_idx,
         |       count(*) AS n
         |FROM (SELECT $distSql AS ds FROM lineitem)
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** J3+F12 — pivot/heatmap: nation × market segment counts (reference:
    * pandas merge+transpose, `plots.py:30-40`). Conditional aggregation keeps
    * empty cells 0 in both engines (Spark `pivot` would yield NULL).
    */
  object PivotHeatmap extends GraftQuery {
    val name = "q_pivot_heatmap"
    private val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val c = Graft.table(spark, sfDir, "customer")
      val n = Graft.table(spark, sfDir, "nation")
      val cells = segs.map(s =>
        count(when(col("c_mktsegment") === s, 1)).as(s.toLowerCase))
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(cells.head, cells.tail: _*)
        .orderBy("nation")
    }
    private val cellSql = segs.map(s =>
      s"count(*) FILTER (WHERE c_mktsegment = '$s') AS ${s.toLowerCase}").mkString(",\n       ")
    val oracle = Some(
      s"""SELECT n_name AS nation,
         |       $cellSql
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** J2 — the full fact rollup: customer → orders → lineitem, per-customer
    * order count / exact revenue / safe average (reference: hand-rolled
    * reverse broadcast join + driver sums, `pyspark_yolox.py:151-176`).
    */
  object PerCustomerRollup extends GraftQuery {
    val name = "q_per_landmark_rollup"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val c = Graft.table(spark, sfDir, "customer")
      val o = Graft.table(spark, sfDir, "orders")
      val li = Graft.table(spark, sfDir, "lineitem")
      val revenue = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      // Two-level aggregation instead of countDistinct-next-to-sum: the
      // mixed distinct/non-distinct agg makes the planner Expand the joined
      // fact 2×. Rolling lineitem up to its (unique) order first shuffles
      // only (orderkey, decimal) pairs, the per-customer count becomes a
      // plain count of order rows, and the decimal partial sums re-sum
      // exactly (decimal addition is associative — same bits as exactSum).
      val perOrder = li.groupBy(col("l_orderkey"))
        .agg(sum(graft.plans.DecimalExpressions.double_to_decimal6(revenue)).as("order_rev"))
      val perCust = o.join(perOrder, o("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), sum(col("order_rev")).as("rev_dec"))
      perCust.join(c, col("o_custkey") === c("c_custkey"))
        .select(col("c_custkey"), col("n_orders"),
          col("rev_dec").cast("double").as("revenue"),
          safeDiv(col("rev_dec").cast("double"),
            col("n_orders").cast("double")).as("avg_order_revenue"))
        .orderBy("c_custkey")
    }
    val oracle = Some(
      """SELECT c_custkey, count(DISTINCT o_orderkey) AS n_orders,
        |       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue,
        |       CASE WHEN count(DISTINCT o_orderkey) = 0 THEN 0.0
        |            ELSE CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(27,6))) AS DOUBLE)
        |                 / CAST(count(DISTINCT o_orderkey) AS DOUBLE) END AS avg_order_revenue
        |FROM orders
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)
  }

  /** Top-k with total order (absent from the reference — SURVEY §2.5). */
  object TopK extends GraftQuery {
    val name = "q_topk_orders"
    def run(spark: SparkSession, sfDir: String): DataFrame =
      Graft.table(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    val oracle = Some(
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin)
  }

  /** Set ops — customers active in both open and finished orders
    * (absent from the reference — SURVEY §2.5).
    */
  object SetOps extends GraftQuery {
    val name = "q_set_ops"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val o = Graft.table(spark, sfDir, "orders")
      val a = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      val b = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      a.intersect(b).orderBy("o_custkey")
    }
    val oracle = Some(
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin)
  }

  /** Grouping sets / rollup — nation × segment with subtotal rows
    * (absent from the reference — SURVEY §2.4). NULL indicator cells are
    * coalesced to a sentinel so null-ordering differences can't bite.
    */
  object RollupGroupingSets extends GraftQuery {
    val name = "q_rollup"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val c = Graft.table(spark, sfDir, "customer")
      val n = Graft.table(spark, sfDir, "nation")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .rollup(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .select(
          coalesce(col("n_name"), lit("(ALL)")).as("nation"),
          coalesce(col("c_mktsegment"), lit("(ALL)")).as("segment"),
          col("n_customers"))
        .orderBy("nation", "segment")
    }
    val oracle = Some(
      """SELECT coalesce(n_name, '(ALL)') AS nation,
        |       coalesce(c_mktsegment, '(ALL)') AS segment,
        |       count(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name, c_mktsegment)
        |ORDER BY nation, segment""".stripMargin)
  }

  /** Cube — all 2^2 grouping combinations over (returnflag, linestatus)
    * (completes the grouping-sets family next to [[RollupGroupingSets]]).
    * Same sentinel treatment for the NULL indicator cells.
    */
  object CubeAgg extends GraftQuery {
    val name = "q_cube"
    def run(spark: SparkSession, sfDir: String): DataFrame =
      Graft.table(spark, sfDir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_items"), exactSum(col("l_quantity")).as("total_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("(ALL)")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("(ALL)")).as("linestatus"),
          col("n_items"), col("total_qty"))
        .orderBy("returnflag", "linestatus")
    val oracle = Some(
      """SELECT coalesce(l_returnflag, '(ALL)') AS returnflag,
        |       coalesce(l_linestatus, '(ALL)') AS linestatus,
        |       count(*) AS n_items,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS total_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin)
  }

  /** Full outer join — open-order vs finished-order counts per customer,
    * keys coalesced explicitly on both engines (completes the join family:
    * inner/broadcast, semi, anti, as-of, range, full outer).
    */
  object FullOuterJoin extends GraftQuery {
    val name = "q_full_outer"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val o = Graft.table(spark, sfDir, "orders")
      val open = o.filter(col("o_orderstatus") === "O")
        .groupBy(col("o_custkey").as("k_open")).agg(count(lit(1)).as("n_open"))
      val fin = o.filter(col("o_orderstatus") === "F")
        .groupBy(col("o_custkey").as("k_fin")).agg(count(lit(1)).as("n_finished"))
      open.join(fin, col("k_open") === col("k_fin"), "full_outer")
        .select(coalesce(col("k_open"), col("k_fin")).as("custkey"),
          coalesce(col("n_open"), lit(0L)).as("n_open"),
          coalesce(col("n_finished"), lit(0L)).as("n_finished"))
        .orderBy("custkey")
    }
    val oracle = Some(
      """SELECT coalesce(a.k_open, b.k_fin) AS custkey,
        |       coalesce(a.n_open, 0) AS n_open,
        |       coalesce(b.n_finished, 0) AS n_finished
        |FROM (SELECT o_custkey AS k_open, count(*) AS n_open
        |      FROM orders WHERE o_orderstatus = 'O' GROUP BY 1) a
        |FULL JOIN (SELECT o_custkey AS k_fin, count(*) AS n_finished
        |           FROM orders WHERE o_orderstatus = 'F' GROUP BY 1) b
        |  ON a.k_open = b.k_fin
        |ORDER BY custkey""".stripMargin)
  }

  /** EXCEPT — customers with open orders but no finished order (completes
    * the set-op family next to [[SetOps]]' INTERSECT; UNION is implicit in
    * the as-of machinery).
    */
  object ExceptOp extends GraftQuery {
    val name = "q_except"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val o = Graft.table(spark, sfDir, "orders")
      val a = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      val b = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      a.except(b).orderBy("o_custkey")
    }
    val oracle = Some(
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin)
  }

  /** Unpivot/melt — the inverse of [[PivotHeatmap]]: wide per-segment count
    * columns back to (nation, segment, n) rows via `stack` (the relational
    * spelling of the reference's pandas transpose, `plots.py:37`). The
    * oracle unpivots with a portable UNION ALL.
    */
  object Unpivot extends GraftQuery {
    val name = "q_unpivot"
    private val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val wide = PivotHeatmap.run(spark, sfDir)
      val stackArgs = segs.map(s => s"'$s', ${s.toLowerCase}").mkString(", ")
      wide.select(col("nation"),
          expr(s"stack(${segs.length}, $stackArgs) AS (segment, n)"))
        .orderBy("nation", "segment")
    }
    private def armSql(s: String) =
      s"""SELECT n_name AS nation, '$s' AS segment, count(*) FILTER (WHERE c_mktsegment = '$s') AS n
         |FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY 1""".stripMargin
    val oracle = Some(
      segs.map(armSql).mkString("", "\nUNION ALL\n", "\nORDER BY nation, segment"))
  }

  val all: Seq[GraftQuery] = Seq(
    AlphabetCount, AlphabetAvg, BcastJoin, SemiJoin, AntiJoin, CityAvg,
    SubsetAvg, NameLenBands, DistinctValues, ValueHistogram, Mode,
    ClosestPrimary, PivotHeatmap, PerCustomerRollup, TopK, SetOps,
    RollupGroupingSets, CubeAgg, FullOuterJoin, ExceptOp, Unpivot)
}
