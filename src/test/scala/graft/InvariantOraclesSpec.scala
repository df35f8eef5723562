package graft

/** Structural gate for [[InvariantOracles]] (r10 verdict item #1):
  * the SQL itself runs only under DuckDB (the scale-gate tool), so
  * the JVM spec pins the contract the tool depends on — every
  * invariant key is a registered query WITH a replay oracle (the
  * invariant supplements, never replaces, the small-SF gate), the
  * statement lists are staged temp-table pipelines ending in one
  * violations SELECT, and cross-dump references name queries that
  * exist. The SEMANTIC proof (pass on correct dumps at sf0.01/0.1/1,
  * fail on five classes of planted corruption including a pure
  * over-merge caught only by the reachability certificate) is run by
  * tools/oracle_compare_scale.py and recorded in SCALE_NOTES. */
class InvariantOraclesSpec extends SparkSpec {

  private val inv = SparkEntry.invariantSql

  test("exactly the measured-infeasible replay rows carry invariants") {
    // six from the sf1 tier + the three sf10-tier rows (r14): replays
    // green through sf1 but superlinear candidate volume past it
    assert(inv.keySet ==
      Set("q_kcore", "q_hits", "q_modularity", "q_dbscan", "q_ivfpq_topk",
        "q_ivfpq_indexed", "q_geo_radius", "q_jaro_rank", "q_fuzzy_match",
        "q_labelprop", "q_conductance"))
  }

  test("every invariant key is a registered query with a replay oracle") {
    inv.keySet.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"$k not in queries")
      assert(SparkEntry.oracleSql.contains(k),
        s"$k lost its replay oracle — invariants supplement the replay, never replace it")
    }
  }

  test("each invariant is a staged pipeline: temp-table stages, one final violations SELECT") {
    inv.foreach { case (k, stmts) =>
      assert(stmts.size >= 2, s"$k: need at least one stage + the violations SELECT")
      stmts.dropRight(1).foreach { s =>
        assert(s.trim.toUpperCase.startsWith("CREATE TEMP TABLE"),
          s"$k: non-final statement is not a temp-table stage: ${s.take(60)}")
      }
      val last = stmts.last.trim.toUpperCase
      assert(last.startsWith("SELECT") || last.startsWith("WITH"),
        s"$k: final statement must SELECT violations: ${stmts.last.take(60)}")
      // the tool treats >0 rows as failure; every check must be
      // labeled so a trip names its class
      assert(stmts.last.contains(" AS chk") || stmts.last.contains("' AS chk"),
        s"$k: violations must carry a chk label")
    }
  }

  test("temp table names are prefixed per query and never collide across statements") {
    val prefixes = Map("q_kcore" -> "kc_", "q_hits" -> "ht_",
      "q_modularity" -> "md_", "q_dbscan" -> "db_", "q_ivfpq_topk" -> "iv_",
      "q_ivfpq_indexed" -> "iv_", // shares the ivfpq pipeline verbatim
      "q_geo_radius" -> "gr_", "q_jaro_rank" -> "jr_",
      "q_fuzzy_match" -> "fz_", "q_labelprop" -> "lp_",
      "q_conductance" -> "cd_")
    inv.foreach { case (k, stmts) =>
      val names = stmts.dropRight(1).map { s =>
        s.trim.split("\\s+")(3) // CREATE TEMP TABLE <name>
      }
      assert(names.distinct == names, s"$k: duplicate temp table: $names")
      names.foreach(n => assert(n.startsWith(prefixes(k)),
        s"$k: temp table $n missing prefix ${prefixes(k)} — cross-query collision risk"))
    }
  }

  test("cross-dump references (r_<name>) point at registered queries") {
    val rRef = "r_(q_[a-z0-9_]+)".r
    inv.foreach { case (k, stmts) =>
      stmts.flatMap(s => rRef.findAllMatchIn(s).map(_.group(1))).foreach { ref =>
        assert(SparkEntry.queries.contains(ref),
          s"$k references engine dump r_$ref but $ref is not a registered query")
      }
    }
  }

  test("the modularity invariant consumes the verified labelprop dump, not its own unroll") {
    val m = inv("q_modularity").mkString("\n")
    assert(m.contains("r_q_labelprop"))
    // and never re-runs label propagation (the part that detonated)
    assert(!m.toLowerCase.contains("row_number"),
      "modularity invariant should not re-run the LPA vote unroll")
  }
}
