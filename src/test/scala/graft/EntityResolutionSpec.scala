package graft

import org.apache.spark.sql.functions._
import graft.operators.EntityResolution

/** Match -> cluster -> survivorship invariants on hand-built records. */
class EntityResolutionSpec extends SparkSpec {

  import spark.implicits._

  // three true entities: the "acme corp" family (ids 1,2,3 — 3 links via
  // transitivity: 1-2 direct, 2-3 direct, 1-3 is distance 2 but also
  // within bound), the "zeta ltd" pair (10, 11), and a singleton (20)
  private lazy val recs = Seq(
    (1L, "acme corp", null.asInstanceOf[String], 10.0),
    (2L, "acme corpx", "B1", 20.0),
    (3L, "acme corpxy", "B2", 30.0),
    (10L, "zeta ltd", "B3", 40.0),
    (11L, "zete ltd", null.asInstanceOf[String], 50.0),
    (20L, "omega gmbh", "B4", 60.0)
  ).toDF("id", "name", "brand", "price")

  test("matchPairs: blocked + verified, ordered, no self/dup pairs") {
    val pairs = EntityResolution.matchPairs(recs, "id", "name", 2)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs == Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L)))
  }

  test("transitive closure groups the acme family into one entity") {
    val ents = EntityResolution
      .resolve(recs, "id", "name", Seq("brand", "price"), 2)
      .orderBy("entity_id").collect()
    assert(ents.map(_.getLong(0)).toSeq == Seq(1L, 10L, 20L))
    val byId = ents.map(r => r.getLong(0) -> r).toMap
    // acme: 3 records, canonical name from id 1, brand survives from the
    // FIRST NON-NULL in id order (id 2), price from id 1
    assert(byId(1L).getLong(1) == 3L)
    assert(byId(1L).getString(2) == "acme corp")
    assert(byId(1L).getString(3) == "B1")
    assert(byId(1L).getDouble(4) == 10.0)
    // zeta: brand from id 10 (11 is null)
    assert(byId(10L).getLong(1) == 2L)
    assert(byId(10L).getString(3) == "B3")
    // singleton survives untouched
    assert(byId(20L).getLong(1) == 1L)
    assert(byId(20L).getString(2) == "omega gmbh")
  }

  test("cluster with every attr null survives as null") {
    val allNull = Seq(
      (1L, "solo name", null.asInstanceOf[String]),
      (2L, "solo namex", null.asInstanceOf[String])
    ).toDF("id", "name", "brand")
    val got = EntityResolution.resolve(allNull, "id", "name", Seq("brand"), 2)
      .collect()
    assert(got.length == 1 && got(0).isNullAt(3))
  }

  test("sorted-neighborhood: exactly the within-window matches, " +
    "partition-invariant, distributed rank == single-node reference") {
    val recs = (0 until 60).map { i =>
      val base = f"item$i%03d"
      (i.toLong, if (i % 10 == 3) base.replace('0', 'o') else base)
    }.toDF("id", "name")
    val got = EntityResolution.sortedNeighborhoodPairs(
        recs, "id", "name", col("name"), window = 4, maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    // single-node reference: sort, window, verify
    val sorted = recs.as[(Long, String)].collect()
      .sortBy { case (id, n) => (n, id) }
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expect = (for {
      i <- sorted.indices; j <- (i + 1) until math.min(i + 4, sorted.length)
      l = lev(sorted(i)._2, sorted(j)._2) if l <= 2
    } yield {
      val (x, y) = (sorted(i)._1, sorted(j)._1)
      (math.min(x, y), math.max(x, y), l)
    }).toSet
    assert(got == expect, s"got ${got.size} vs expect ${expect.size}")
    val again = EntityResolution.sortedNeighborhoodPairs(
        recs.repartition(7), "id", "name", col("name"), window = 4,
        maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(again == got)
  }

  test("maxDist 0 still links exact same-name records, not near ones") {
    val dup = Seq((1L, "same exact"), (2L, "same exact"), (3L, "same exacz"))
      .toDF("id", "name")
    val ents = EntityResolution.resolve(dup, "id", "name", Nil, 0)
      .orderBy("entity_id").collect().map(_.getLong(0)).toSeq
    assert(ents == Seq(1L, 3L))
  }

  test("fellegiSunter: hand-checked weights, null gamma, sign structure") {
    import graft.functions.FixedLog.log2Fp
    val F = graft.functions.FixedLog.FracBits
    // 4 records, two blocks ("acme *"), city attr: {x, x, y, null}
    // u(city): values x,x,y -> sum f(f-1) = 2, N(N-1) = 6 -> u = 1/3
    val recs = Seq(
      (1L, "acme east", Some("x")), (2L, "acme west", Some("x")),
      (3L, "acme north", Some("y")), (4L, "acme south", None))
      .toDF("id", "name", "city")
    val out = EntityResolution.fellegiSunterScore(recs, "id",
        Seq(substring_index(col("name"), " ", 1)), Seq("city"))
      .orderBy(col("id_a"), col("id_b"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    // all 6 pairs share the "acme" first-token block
    assert(out.map(p => (p._1, p._2)) ==
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    val wAgree = log2Fp(9) - log2Fp(10) - log2Fp(2) + log2Fp(6)
    val wDis = log2Fp(1) - log2Fp(10) - log2Fp(4) + log2Fp(6)
    // agree(1,2): m/u = 0.9/(1/3) = 2.7 -> positive ~log2(2.7) bits
    assert(out(0) == ((1L, 2L, 1L, wAgree)))
    assert(wAgree > (1L << F) && wAgree < 2L * (1L << F)) // in (1, 2) bits
    // disagree(1,3): (1-m)/(1-u) = 0.1/(2/3) -> negative
    assert(out(1) == ((1L, 3L, 0L, wDis)) && wDis < 0)
    // null city on either side -> zero contribution
    assert(out(2) == ((1L, 4L, 0L, 0L)))
    assert(out(5) == ((3L, 4L, 0L, 0L)))
  }

  test("fellegiSunter: rarer attributes weigh more; partition invariant") {
    // plate is nearly unique (u tiny) -> agreement outweighs the common
    // color's agreement
    // 41 shares 7's first-token block (n2), its rare plate (p7), and
    // its color (c1), but not its full name
    val recs = (1L to 40L).map(i => (i, s"n${i % 5} t${i % 7}",
      s"c${i % 2}", s"p$i")) :+ ((41L, "n2 t5", "c1", "p7"))
    val df = recs.toDF("id", "name", "color", "plate")
    val keys = Seq(substring_index(col("name"), " ", 1),
      substring_index(col("name"), " ", -1))
    val out = EntityResolution.fellegiSunterScore(df, "id", keys,
        Seq("color", "plate"))
      .as[(Long, Long, Long, Long)].collect()
    val byPair = out.map(p => (p._1, p._2) -> p._4).toMap
    // (7, 41): plate agrees (rare) -> strongly positive overall
    assert(byPair.contains((7L, 41L)) && byPair((7L, 41L)) > 0)
    val shuffled = EntityResolution.fellegiSunterScore(
        df.repartition(13), "id", keys, Seq("color", "plate"))
      .as[(Long, Long, Long, Long)].collect()
    assert(out.sorted.toSeq == shuffled.sorted.toSeq)
  }

  test("fellegiSunter: disjoint block passes — multi-key pairs emit " +
      "once, later-key-only and null-key pairs survive") {
    // k1/k2 overlap structure (r11 rewrite: pass i excludes pairs an
    // earlier key already found, replacing the union+distinct):
    //  1,2: share BOTH keys -> exactly one output row
    //  1,3: share only k2   -> found by the second pass
    //  4,5: k1 null on 4, share k2 -> the earlier-key exclusion must
    //       not drop a pair whose earlier key never matched (null)
    //  6:   both keys unique -> pairs with nobody
    val recs = Seq(
      (1L, Some("a"), "x", "v1"), (2L, Some("a"), "x", "v1"),
      (3L, Some("b"), "x", "v2"), (4L, None: Option[String], "y", "v3"),
      (5L, Some("c"), "y", "v3"), (6L, Some("d"), "z", "v4"))
      .toDF("id", "k1", "k2", "attr")
    val out = EntityResolution.fellegiSunterScore(recs, "id",
        Seq(col("k1"), col("k2")), Seq("attr"))
      .orderBy(col("id_a"), col("id_b"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.map(p => (p._1, p._2)) ==
      Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)),
      s"pair set wrong: $out")
    // and the multi-key pair carries the same score as its duplicate
    // would have (the old union+distinct kept one of two equal rows)
    assert(out.map(p => (p._1, p._2)).distinct.size == out.size)
  }

  test("goldenRecord: longest/mode/latest rules, null tolerance, " +
      "deterministic ties, partition invariance") {
    import EntityResolution._
    val df = Seq(
      // cluster 1: names of lengths 2,4,4 (tie -> 'dddd' > 'cccc');
      // brand mode 'x' (2 vs 1); latest ts=30 carries price 9.0
      (1L, 10L, "ab", Some("x"), Some(1.0)),
      (1L, 20L, "cccc", Some("x"), Some(5.0)),
      (1L, 30L, "dddd", Some("y"), Some(9.0)),
      // cluster 2: brand all null; latest row's price is null ->
      // latest NON-NULL (ts=40) must win, not null-at-ts-50
      (2L, 40L, "zz", None, Some(7.0)),
      (2L, 50L, "zzz", None, None))
      .toDF("cl", "ts", "name", "brand", "price")
    val out = EntityResolution.goldenRecord(df, $"cl", Seq(
        ("name", $"name", LongestPick),
        ("brand", $"brand", ModePick),
        ("price", $"price", LatestPick($"ts"))))
      .select($"cluster", $"n_members", $"name", $"brand", $"price")
      .as[(Long, Long, String, Option[String], Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 3L, "dddd", Some("x"), Some(9.0)),
      (2L, 2L, "zzz", None, Some(7.0))))
    val again = EntityResolution.goldenRecord(df.repartition(7), $"cl",
        Seq(("name", $"name", LongestPick),
          ("brand", $"brand", ModePick),
          ("price", $"price", LatestPick($"ts"))))
      .select($"cluster", $"n_members", $"name", $"brand", $"price")
      .as[(Long, Long, String, Option[String], Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(out == again)
  }
}
