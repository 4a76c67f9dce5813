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

  test("maxDist 0 still links exact same-name records, not near ones") {
    val dup = Seq((1L, "same exact"), (2L, "same exact"), (3L, "same exacz"))
      .toDF("id", "name")
    val ents = EntityResolution.resolve(dup, "id", "name", Nil, 0)
      .orderBy("entity_id").collect().map(_.getLong(0)).toSeq
    assert(ents == Seq(1L, 3L))
  }
}
