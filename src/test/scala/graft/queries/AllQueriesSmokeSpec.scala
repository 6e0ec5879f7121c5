package graft.queries

import graft.SparkTestBase

/** Every registered query must run on sf0.001, return rows-or-empty without
  * error, and be deterministic across two evaluations — the safety net for
  * queries without a DuckDB oracle and for SF-dependent data edges. */
class AllQueriesSmokeSpec extends SparkTestBase {

  private val emptyOkAtTinySf = Set(
    "q06_anti_join",       // every customer may have orders
    "q42_minhash_lsh",     // no near-dups planted in raw testdata
    "q43_ngram_jaccard",   // may have no overlapping shingle pairs
    "q45_embedding_neardup", // random vectors may all be < threshold
    "q127_incremental_dedup", // q42's pair universe restricted across the split
    "q129_knn_graph"       // random vectors may share no 16-bit sign band
  )

  graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and is deterministic on sf0.001") {
      val a = fn(spark, sfDir).collect()
      if (!emptyOkAtTinySf(name)) {
        assert(a.nonEmpty, s"$name returned 0 rows at sf0.001")
      }
      val b = fn(spark, sfDir).collect()
      assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq,
        s"$name is nondeterministic")
    }
  }

  test("query names are unique (no silent drop at the registry toMap)") {
    val names = graft.SparkEntry.modules.map(_._1)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query names: $dups")
    assert(graft.SparkEntry.queries.size === names.size)
  }

  test("entry() smoke: flagship returns rows on sf0.001") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key exists in queries and every query has a name") {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle keys without queries: ${o.diff(q)}")
    assert(q.forall(_.matches("q\\d+[a-z]?_[a-z0-9_]+")), "query naming convention")
  }
}
