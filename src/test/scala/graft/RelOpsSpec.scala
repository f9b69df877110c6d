package graft

import graft.pipeline.RelOps

/** Structural checks for the general relational surface
  * ([[graft.pipeline.RelOps]]) — the value-level truth lives in the
  * DuckDB oracle compare; these pin invariants and estimator quality. */
class RelOpsSpec extends SparkSpec {
  import spark.implicits._

  private val SF = "/root/testdata/sf0.001"

  test("topkOrders returns exactly 10 rows in non-increasing order") {
    val rows = RelOps.topkOrders(spark, SF)
      .as[(Long, String, Long)].collect().toSeq
    assert(rows.size == 10)
    val vals = rows.map(_._3)
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b })
  }

  test("rollupRevenue subtotals are consistent with the grand total") {
    val rows = RelOps.rollupRevenue(spark, SF)
      .as[(String, String, Long, Long)].collect().toSeq
    val grand = rows.find(r => r._1 == "ALL" && r._2 == "ALL").get
    val leaves = rows.filter(r => r._1 != "ALL" && r._2 != "ALL")
    val priTotals = rows.filter(r => r._1 != "ALL" && r._2 == "ALL")
    assert(leaves.map(_._4).sum == grand._4)
    assert(priTotals.map(_._4).sum == grand._4)
    assert(leaves.map(_._3).sum == grand._3)
  }

  test("hllDistinctUsers estimates within sketch tolerance of exact") {
    // sf0.01: 150 distinct users per type > 2m, the raw estimator's
    // operating range (m=64 registers, standard error ~13%; 3 sigma).
    val rows = RelOps.hllDistinctUsers(spark, "/root/testdata/sf0.01")
      .as[(String, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (_, estMicro, exact) =>
      val est = estMicro / 1e6
      assert(math.abs(est - exact) / exact <= 0.4,
        s"est $est vs exact $exact")
    }
    // Documented raw-estimator property: far below m distincts (sf0.001
    // has 15 users), the uncorrected estimate biases HIGH — the linear-
    // counting correction is deliberately omitted (libm ln is not
    // cross-engine portable, and the oracle must replay exactly).
    val small = RelOps.hllDistinctUsers(spark, SF)
      .as[(String, Long, Long)].collect().toSeq
    small.foreach { case (_, estMicro, exact) =>
      assert(estMicro / 1e6 >= exact.toDouble)
    }
  }

  test("hllRollingUsers merges daily sketches within tolerance") {
    val rows = RelOps.hllRollingUsers(spark, "/root/testdata/sf0.01")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(rows.size >= 25) // one row per active day of the 30-day span
    rows.foreach { case (day, estMicro, exact) =>
      assert(exact > 0)
      assert(math.abs(estMicro / 1e6 - exact) / exact <= 0.4,
        s"day $day: est ${estMicro / 1e6} vs exact $exact")
    }
    // full 7-day windows must see a large share of the 150-user pool
    assert(rows.map(_._3).max >= 100)
  }

  test("thetaOverlapUsers estimates pair overlap within KMV tolerance") {
    val rows = RelOps.thetaOverlapUsers(spark, "/root/testdata/sf0.01")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(rows.size == 10) // C(5,2) event-type pairs
    rows.foreach { case (a, b, estMicro, exact) =>
      assert(a < b)
      assert(exact > 0)
      // k=128 KMV at ~150 distincts/side: generous 3-sigma-ish bound
      assert(math.abs(estMicro / 1e6 - exact) / exact <= 0.5,
        s"$a/$b: est ${estMicro / 1e6} vs exact $exact")
    }
    // sf0.001 has 15 users/type < k: the sketch IS the set — exact
    val small = RelOps.thetaOverlapUsers(spark, SF)
      .as[(String, String, Long, Long)].collect().toSeq
    small.foreach { case (a, b, estMicro, exact) =>
      assert(estMicro == exact * 1000000L,
        s"$a/$b: sub-k sketch must be exact")
    }
  }

  test("eventsHourly buckets cover the event range with exact counts") {
    val rows = RelOps.eventsHourly(spark, SF)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(rows.map(_._3).sum == 1000L) // sf0.001 events total
    assert(rows.forall(_._1 % 3600 == 0))
  }

  test("q6Forecast applies every scan predicate (non-vacuous, bounded)") {
    val r = RelOps.q6Forecast(spark, "/root/testdata/sf0.01").collect()
    assert(r.length == 1)
    val (cnt, rev) = (r(0).getLong(0), r(0).getLong(1))
    assert(cnt > 0 && rev > 0)
    // a predicate-free sum would be far larger: the filters must bite
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    assert(cnt < li.count() / 10)
  }

  test("q13OrderDist buckets every customer exactly once") {
    val rows = RelOps.q13OrderDist(spark, SF)
      .as[(Long, Long)].collect().toSeq
    val cust = spark.read.parquet(s"$SF/customer.parquet").count()
    assert(rows.map(_._2).sum == cust) // partition of the customer set
    val orders = spark.read.parquet(s"$SF/orders.parquet").count()
    assert(rows.map(r => r._1 * r._2).sum == orders) // counts re-add
  }

  test("q15TopSupplier returns the argmax supplier(s) of the quarter") {
    val rows = RelOps.q15TopSupplier(spark, "/root/testdata/sf0.01")
      .as[(Long, String, Long)].collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.map(_._3).distinct.size == 1) // all carry the max value
  }

  test("q1Pricing aggregates the six flag/status groups consistently") {
    val rows = RelOps.q1Pricing(spark, SF).collect()
    assert(rows.length == 6) // A/N/R x F/O with N-F present in this data
    rows.foreach { r =>
      val (sumQty, sumBase, sumDp, sumCh) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val (avgQty, avgPrice, avgDisc, n) =
        (r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9))
      assert(n > 0)
      assert(avgQty == sumQty / n && avgPrice == sumBase / n)
      assert(avgDisc >= 0 && avgDisc < 1000000L) // discount in [0, 1)
      // charge >= disc_price (tax >= 0), disc_price <= base price
      assert(sumCh >= sumDp && sumDp <= sumBase)
    }
    // filter excludes some rows: grand count < full table size
    val total = rows.map(_.getLong(9)).sum
    val full = spark.read.parquet(s"$SF/lineitem.parquet").count()
    assert(total < full && total > 0)
  }

  test("q4LateOrders counts each order at most once per priority") {
    val rows = RelOps.q4LateOrders(spark, SF)
      .as[(String, Long)].collect().toSeq
    val orders = spark.read.parquet(s"$SF/orders.parquet").count()
    assert(rows.map(_._2).sum <= orders) // semi join cannot duplicate
    assert(rows.map(_._2).sum > 0)
    assert(rows.map(_._1).distinct.size == rows.size)
  }

  test("q12PriorityClass partitions every joined line into one class") {
    val rows = RelOps.q12PriorityClass(spark, SF)
      .as[(String, Long, Long)].collect().toSeq
    val li = spark.read.parquet(s"$SF/lineitem.parquet").count()
    // inner join on a key orders always has: classes partition the lines
    assert(rows.map(r => r._2 + r._3).sum == li)
    assert(rows.exists(_._2 > 0) && rows.exists(_._3 > 0))
  }

  test("q17SmallQtyRevenue is one bounded row (the filters bite)") {
    val r = RelOps.q17SmallQtyRevenue(spark, "/root/testdata/sf0.01")
      .collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) > 0)
    // small-quantity lines of one brand: far below total revenue
    val all = spark.read
      .parquet("/root/testdata/sf0.01/lineitem.parquet")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.col("l_extendedprice") * 1e6)
          .cast("long"))).head.getLong(0)
    assert(r(0).getLong(0) < all / 100)
  }

  test("q19BrandRevenue applies the disjunction non-vacuously") {
    val r = RelOps.q19BrandRevenue(spark, "/root/testdata/sf0.01")
      .collect()
    assert(r.length == 1)
    val (cnt, rev) = (r(0).getLong(0), r(0).getLong(1))
    assert(cnt > 0 && rev > 0)
    val li = spark.read
      .parquet("/root/testdata/sf0.01/lineitem.parquet").count()
    assert(cnt < li / 10) // the brand/size/qty conjuncts must prune
  }

  test("q2MinCostSupp keeps exactly the per-part min cost (ties and all)") {
    val rows = RelOps.q2MinCostSupp(spark, "/root/testdata/sf0.01")
      .as[(Long, String, String, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    // every row for a part carries the same (minimal) cost
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._5).distinct.size == 1)
    }
  }

  test("q8MarketShare emits exact integer shares within bounds") {
    val rows = RelOps.q8MarketShare(spark, "/root/testdata/sf0.01")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1).sorted == Seq(1995L, 1996L))
    rows.foreach { case (_, num, den, ppm) =>
      assert(num >= 0 && num <= den)
      assert(ppm == num * 1000000L / den)
    }
  }

  test("q21WaitingSupp: sole-latest wait counts stay within order count") {
    val rows = RelOps.q21WaitingSupp(spark, "/root/testdata/sf0.001")
      .as[(String, Long)].collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 > 0))
    // each waited order contributes exactly one (order, sole supplier)
    // pair, so the total cannot exceed the finalized-order count
    val fOrders = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")
      .where($"o_orderstatus" === "F").count()
    assert(rows.map(_._2).sum <= fOrders)
  }

  test("cubeRevenue adds the column marginals rollup omits") {
    val cube = RelOps.cubeRevenue(spark, SF)
      .as[(String, String, Long, Long)].collect().toSeq
    val roll = RelOps.rollupRevenue(spark, SF)
      .as[(String, String, Long, Long)].collect().toSeq
    // cube ⊇ rollup, and the extra rows are exactly the (ALL, status)
    // marginals for each non-ALL status
    assert(roll.toSet.subsetOf(cube.toSet))
    val extra = cube.toSet -- roll.toSet
    assert(extra.nonEmpty && extra.forall(r => r._1 == "ALL" && r._2 != "ALL"))
    // the status marginals also sum to the grand total
    val grand = cube.find(r => r._1 == "ALL" && r._2 == "ALL").get
    assert(extra.toSeq.map(_._4).sum == grand._4)
  }

  test("basketPairs equals the naive per-order pair count with exact lift") {
    val sf = "/root/testdata/sf0.01"
    val baskets = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect().toSeq
    val freq = baskets.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nOrders = baskets.map(_._1).distinct.size.toLong
    val support = baskets.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.size) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val want = support
      .map { case ((a, b), s) => (a, b, s) }
      .sortBy { case (a, b, s) => (-s, a, b) }.take(20)
      .map { case (a, b, s) =>
        (a, b, s, freq(a), freq(b),
          (BigInt(s) * nOrders * 1000000L / (BigInt(freq(a)) * freq(b)))
            .toLong)
      }
    val got = RelOps.basketPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
      .sortBy(r => (-r._3, r._1, r._2))
    assert(got == want)
    assert(got.size == 20 && got.forall(_._6 > 0L))
    // lift must discriminate: not all pairs at the independence line
    assert(got.map(_._6).distinct.size > 1)
  }

  test("pivotDailyValues cross-tab columns re-sum to per-type totals") {
    val rows = RelOps.pivotDailyValues(spark, "/root/testdata/sf0.01")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.size == 30) // one row per active epoch-day of the fixture
    val fromPivot = Map(
      "click" -> rows.map(_._2).sum, "error" -> rows.map(_._3).sum,
      "purchase" -> rows.map(_._4).sum, "signup" -> rows.map(_._5).sum,
      "view" -> rows.map(_._6).sum)
    val direct = RelOps.events(spark, "/root/testdata/sf0.01")
      .groupBy($"event_type")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.round($"value" * 1e6).cast("long")))
      .as[(String, Long)].collect().toMap
    assert(fromPivot == direct)
  }

  test("q9ProfitByNation covers all supplier nations with bounded years") {
    val rows = RelOps.q9ProfitByNation(spark, "/root/testdata/sf0.01")
      .as[(String, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    // years come from l_shipdate's 1995-2001 domain
    assert(rows.forall(r => r._2 >= 1995L && r._2 <= 2001L))
    // the (nation, year) grid is bounded: ≤ 25 nations × 7 ship years
    // (at sf0.01 every cell is populated — red parts ship everywhere)
    assert(rows.size <= 25 * 7)
    // grouping key is unique
    assert(rows.map(r => (r._1, r._2)).distinct.size == rows.size)
  }

  test("q11ImportantParts keeps only above-threshold shares of the total") {
    val rows = RelOps.q11ImportantParts(spark, "/root/testdata/sf0.01")
      .as[(Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    // recompute the nation-wide total the threshold compares against
    val total = {
      import org.apache.spark.sql.functions._
      val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      val supp = spark.read.parquet("/root/testdata/sf0.01/supplier.parquet")
      val nat = spark.read.parquet("/root/testdata/sf0.01/nation.parquet")
        .where(col("n_name") === "NATION_7")
      li.join(supp, col("l_suppkey") === col("s_suppkey"))
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .agg(sum(round(col("l_extendedprice") * 1e6).cast("long")))
        .head.getLong(0)
    }
    rows.foreach { case (_, v) =>
      assert(BigInt(v) * 1000 > BigInt(total))
    }
  }

  test("q16SupplierCnt excludes negative-balance suppliers from counts") {
    val rows = RelOps.q16SupplierCnt(spark, "/root/testdata/sf0.01")
      .as[(String, String, Int, Long)].collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.forall(_._4 > 0))
    assert(rows.forall(r => r._1 != "Brand#1"))
    val sizes = Set(1, 4, 9, 16, 25, 36, 49)
    assert(rows.forall(r => sizes.contains(r._3)))
    // counts can never exceed the clean-supplier population
    val clean = spark.read
      .parquet("/root/testdata/sf0.01/supplier.parquet")
      .where($"s_acctbal" >= 0).count()
    assert(rows.forall(_._4 <= clean))
  }

  test("q20ExcessShippers winners each dominate some small-part's 1997 qty") {
    val rows = RelOps.q20ExcessShippers(spark, "/root/testdata/sf0.01")
      .as[(Long, String)].collect().toSeq
    assert(rows.nonEmpty)
    // strictly fewer than all suppliers qualify (the share test bites)
    val supp = spark.read
      .parquet("/root/testdata/sf0.01/supplier.parquet").count()
    assert(rows.size < supp)
    assert(rows.map(_._1).distinct.size == rows.size)
  }

  test("q22GlobalSales only keeps above-average dormant balances") {
    val rows = RelOps.q22GlobalSales(spark, "/root/testdata/sf0.01")
      .as[(String, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    // per-segment average of kept customers must exceed the global
    // positive average (each kept balance does individually)
    val cust = spark.read
      .parquet("/root/testdata/sf0.01/customer.parquet")
      .select(org.apache.spark.sql.functions.round($"c_acctbal" * 1e6)
        .cast("long").as("a"))
    val pos = cust.where($"a" > 0)
      .agg(org.apache.spark.sql.functions.sum($"a"),
        org.apache.spark.sql.functions.count($"a")).head
    val (s, n) = (pos.getLong(0), pos.getLong(1))
    rows.foreach { case (_, numcust, tot) =>
      assert(numcust > 0)
      assert(tot * n > s * numcust) // avg(kept) > avg(positive)
    }
  }
}
