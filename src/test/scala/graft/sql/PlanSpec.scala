package graft.sql

import graft.SparkSpec

/** Physical-plan quality gates for the declared queries — the properties
  * that decide whether these plans survive a 100 TB scale-up: filters and
  * column pruning must reach the parquet scan, dimension-sized join sides
  * must broadcast (no shuffle of the fact side), and top-k must plan as
  * TakeOrderedAndProject (never a global sort of the full relation).
  * Asserted on explain text so the checks hold across AQE wrapping.
  */
class PlanSpec extends SparkSpec {
  private val dir = graft.SparkSpec.testDataDir

  private def plan(queries: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame],
                   name: String): String =
    queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q01: predicate pushdown + column pruning reach the lineitem scan") {
    val p = plan(ParityQueries.queries, "q01_scan_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull"), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate,"), p)
    // (the PushedFilters list is elided in toString past ~100 chars; the
    // returnflag equality shows in the post-scan Filter instead)
    assert(p.contains("= N)"), p)
    // projection pruning: price/discount/tax never leave the reader
    assert(!p.contains("l_extendedprice"), "scan reads pruned column")
  }

  test("q02: dimension side of the fact join broadcasts") {
    val p = plan(ParityQueries.queries, "q02_join_fact_dim")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q10: top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan(ParityQueries.queries, "q10_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("x25: ANN scans the corpus once with the query side broadcast") {
    val p = plan(ExtensionQueries.queries, "x25_ann_topk")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("x22: LSH candidates build one minhash pipeline (no duplicate agg)") {
    val p = plan(ExtensionQueries.queries, "x22_dedup_minhash_lsh")
    // the band aggregation appears once: bucket-group plan, not a self-join
    // that would evaluate the 16-column min() pipeline on both branches
    val aggCount = "partial_min\\(".r.findAllIn(p).length
    assert(aggCount <= 16, s"minhash agg duplicated: $aggCount partial mins")
  }

  test("x23: simhash pairs is a one-shuffle plan (no per-pair dedup agg)") {
    val p = plan(ExtensionQueries.queries, "x23_dedup_simhash")
    // two hash exchanges: the per-doc simhash bit-sum aggregation and the
    // chunk-bucket collect. The canonical-chunk kernel removed the third —
    // the old per-pair groupBy(i,j) dedup shuffle.
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 2, s"expected 2 hash exchanges, got $exchanges:\n$p")
    assert(p.contains("simhash_chunk_pairs"), p)
  }

  test("x43: benchmark shingle set broadcasts; corpus never shuffles on shingles") {
    val p = plan(ExtensionQueries.queries, "x43_decontaminate")
    // a broadcast join on the shingle value (never a sort-merge join, which
    // would shuffle the whole corpus's shingles); any hashpartitioning on s
    // belongs to the tiny benchmark side's distinct()
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled for the join:\n$p")
  }

  test("x42: semantic dedup materializes cells once, joins pairs on the cell id") {
    val p = plan(ExtensionQueries.queries, "x42_semantic_dedup")
    // the centroid-assignment pipeline (crossJoin of broadcast centroids +
    // window rank) runs ONCE inside a localCheckpoint; the visible plan
    // joins the materialized cells (ExistingRDD scan), so the expensive
    // stage is not re-evaluated per pair-join branch
    assert(p.contains("ExistingRDD"), s"cells not checkpointed:\n$p")
    // the within-cell pair join is an equi-join on cell (+ id inequality),
    // never a full cartesian of the corpus with itself
    assert(!p.contains("CartesianProduct"), s"cartesian pair join:\n$p")
  }

  test("x78: OHLC candles plan as ONE hash aggregation, no sort/window") {
    val p = plan(ExtensionQueries.queries, "x78_ohlc_resample")
    // min_by/max_by/min/max/count all partial-merge: one map-side partial
    // + one final agg after a single exchange; a row_number formulation
    // would show a Window + full per-partition Sort here
    assert(!p.contains("Window"), s"candle used a window plan:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$p")
    assert(p.contains("partial_min_by"), s"no map-side candle partials:\n$p")
  }

  test("x79: rolling time window is one exchange + one window stage") {
    val p = plan(ExtensionQueries.queries, "x79_rolling_time_window")
    // sum and count share the same (key, ts-range) frame, so Spark plans
    // them in ONE Window operator over one Exchange+Sort — not one stage
    // per aggregate
    val windows = "Window".r.findAllIn(p).length
    assert(windows == 1, s"expected 1 window stage, got $windows:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$p")
  }

  test("x81: mixture sampling broadcasts rates; the corpus never " +
      "shuffles for the join") {
    val p = plan(ExtensionQueries.queries, "x81_mixture_sample")
    // the domain-rate table is bounded metadata: it must reach the corpus
    // as a broadcast, never by shuffling the corpus onto domain keys
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled for rates:\n$p")
  }

  test("x77: novelty's first-occurrence map is map-side combined") {
    val p = plan(ExtensionQueries.queries, "x77_novelty")
    // the groupBy(shingle).min(id) build side must partial-aggregate
    // before its exchange — at 100 TB the un-combined shingle table is
    // the corpus token count
    assert("partial_min\\(".r.findFirstIn(p).isDefined,
      s"first-occurrence map not combined:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x86: DSIR weight table broadcasts; selection is TakeOrdered, " +
      "not a global sort") {
    val p = plan(ExtensionQueries.queries, "x86_dsir_selection")
    // the ≤1024-row bucket-weight table must reach the corpus features as
    // a broadcast (shuffling the feature stream onto bucket keys would
    // move the corpus), and the top-N cut must be per-partition heaps
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), s"top-N planned as sort:\n$p")
  }

  test("x87: IVF-PQ broadcasts the query probes; no cartesian product") {
    val p = plan(ExtensionQueries.queries, "x87_ann_ivf_pq")
    // candidates come from the cell equi-join with the probe side
    // broadcast — the corpus shuffles at most once (cell assignment),
    // never pairs with queries combinatorially
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x88: the Gopher table is narrow — no exchange before the signals") {
    val p = plan(ExtensionQueries.queries, "x88_gopher_filter")
    // one scan → project/filter chain; the only exchanges allowed are the
    // fixture spread() and the output orderBy's range exchange
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx <= 1, s"signal stage shuffled beyond spread():\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"decision table planned a join:\n$p")
  }

  test("x90: BM25 has no cartesian product and broadcasts corpus stats") {
    val p = plan(ExtensionQueries.queries, "x90_bm25_retrieval")
    // the 1-row N/Σdl constants and the query-term table must reach the
    // postings as broadcasts; no pairwise corpus blowup anywhere
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x89: sequence packing has no global sort and broadcasts offsets") {
    val p = plan(ExtensionQueries.queries, "x89_seq_packing")
    // the distributed prefix sum must not sort the corpus globally: the
    // only Sort allowed outside the final output ordering is the
    // in-bucket window sort (partitioned) and the one-row-per-bucket
    // offset window; bucket offsets reach rows as a broadcast
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"offsets shuffled the corpus:\n$p")
  }

  test("x95: the k-row codebook broadcasts; the corpus never cross-joins") {
    val p = plan(ExtensionQueries.queries, "x95_prototype_pruning")
    // assignment is one codegen'd NearestCentroid projection; the winning
    // cosine recompute joins the k-row centroid frame broadcast
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), s"codebook shuffled the corpus:\n$p")
  }

  test("x97: n-gram coverage is one narrow kernel pass — no join, no " +
      "window, no gram exchange") {
    val p = plan(ExtensionQueries.queries, "x97_topgram_coverage")
    assert(!p.contains("Window"), s"argmax regressed to a window:\n$p")
    assert(!p.contains("Join"), s"coverage planned a join:\n$p")
    // r20: the per-row TopNgramStats kernel replaced the two doc-keyed
    // aggregation shuffles that carried corpus × 9 positional gram
    // strings — the only exchange left is the output orderBy's range
    // partition; a hashpartitioning exchange means the gram blowup came
    // back
    assert(p.contains("top_ngram_stats"), s"kernel not in plan:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"gram-level exchange crept back:\n$p")
  }

  test("x98: shuffle order rides the prefix-sum broadcast, no merge join") {
    val p = plan(ExtensionQueries.queries, "x98_shuffle_order")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"offsets shuffled the corpus:\n$p")
  }

  test("x99: hard negatives scan the corpus once, queries broadcast") {
    val p = plan(ExtensionQueries.queries, "x99_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x100: label noise pairs only within cells — no cartesian product") {
    val p = plan(ExtensionQueries.queries, "x100_label_noise")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x101: epoch plan broadcasts; the corpus never shuffles for it") {
    val p = plan(ExtensionQueries.queries, "x101_epoch_upsample")
    // the per-domain (full, partial_bp) table is bounded metadata — it
    // must reach the corpus as a broadcast; the explode is narrow and
    // the output is exactly the requested budget
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled for epochs:\n$p")
  }

  test("x103: hashed BoW is one combined doc-scoped aggregation") {
    val p = plan(ExtensionQueries.queries, "x103_hashed_bow")
    // the signed sums must partial-aggregate before the (id, bucket)
    // exchange — the un-combined token stream IS the corpus token count
    assert(p.contains("partial_sum"), s"signed sums not map-side combined:\n$p")
    assert(!p.contains("Join"), s"hashed BoW planned a join:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$p")
  }

  test("x104: sparse cosine broadcasts the query entries; no cartesian") {
    val p = plan(ExtensionQueries.queries, "x104_sparse_cosine")
    // the probe entries must reach the corpus entry stream as a
    // broadcast on the bucket key — the inverted-index join; pairing
    // combinatorially would be the dense Θ(docs·dim) plan this avoids
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_sum"), s"dots not map-side combined:\n$p")
  }

  test("x106: epoch replay rides broadcasts end to end — no merge join, " +
      "no cartesian") {
    val p = plan(ExtensionQueries.queries, "x106_epoch_replay")
    // epochUpsample's plan table AND replayLayout's prefix-sum offsets
    // must both reach the replica stream as broadcasts
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"replica stream shuffled:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x108: token-budget rates broadcast; the corpus never shuffles") {
    val p = plan(ExtensionQueries.queries, "x108_token_mixture")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled for rates:\n$p")
    // the per-domain token sums must partial-aggregate before their
    // exchange — at 100 TB the un-combined doc stream is the corpus
    assert(p.contains("partial_sum"), s"token sums not map-side combined:\n$p")
  }

  test("x110: winnowing is one doc-keyed exchange, no join anywhere") {
    val p = plan(ExtensionQueries.queries, "x110_winnow_fingerprints")
    assert(!p.contains("Join"), s"winnow planned a join:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"expected ≤2 hash exchanges (windows + " +
      s"distinct), got $exchanges:\n$p")
  }

  test("x112: truncated recall scans the corpus with queries broadcast — " +
      "no cartesian") {
    val p = plan(ExtensionQueries.queries, "x112_truncated_recall")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the final recall join keys on (qid, nid) over bounded top-k rows —
    // ONE sort-merge there is fine; the VECTOR joins (query × corpus)
    // must never sort-merge, so at most one SMJ may appear in the plan
    val smj = "SortMergeJoin".r.findAllIn(p).length
    assert(smj <= 1, s"expected ≤1 SortMergeJoin (the bounded (qid,nid) " +
      s"recall join), got $smj — a vector join regressed to sort-merge:\n$p")
  }

  test("x113: winnow overlap enumerates inside fp buckets — no cartesian, " +
      "combined pair counts") {
    val p = plan(ExtensionQueries.queries, "x113_winnow_overlap")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count"), s"pair counts not combined:\n$p")
  }

  test("x127: HTML extraction is a narrow map + exactly ONE line-keyed " +
      "exchange (the dedup window) — no join anywhere") {
    val p = plan(ExtensionQueries.queries, "x127_html_extract")
    assert(!p.contains("Join"), s"extraction planned a join:\n$p")
    // hashpartitioning only: the output orderBy adds a rangepartitioning
    // and the fixture spread() a round-robin — neither moves with data
    // size the way the dedup shuffle does
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1,
      s"expected exactly the line-dedup exchange, got $exchanges:\n$p")
  }

  test("x128: the page tier adds only the doc-keyed reassembly agg — " +
      "two hash exchanges, still no join") {
    val p = plan(ExtensionQueries.queries, "x128_html_pages")
    assert(!p.contains("Join"), s"page tier planned a join:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 2,
      s"expected dedup + page-agg exchanges, got $exchanges:\n$p")
  }

  test("x114: snapshot diff joins hash projections, not text") {
    val p = plan(ExtensionQueries.queries, "x114_snapshot_diff")
    assert(!p.contains("CartesianProduct"), p)
    // the full-outer join's stream must carry md5 hashes, not documents:
    // no post-scan operator above the join may reference the text column
    val joinIdx = p.indexOf("FullOuter")
    assert(joinIdx > 0, s"no full-outer join planned:\n$p")
    assert(!p.substring(0, joinIdx).contains("text#"),
      s"text column rides above the diff join:\n$p")
  }

  test("x116: blocklist broadcasts onto the gram stream — no shuffle of " +
      "the corpus for the match") {
    val p = plan(ExtensionQueries.queries, "x116_blocklist")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count"), s"hit counts not combined:\n$p")
  }

  test("x117: percentile selection is one group-keyed exchange for both " +
      "windows") {
    val p = plan(ExtensionQueries.queries, "x117_percentile_select")
    assert(!p.contains("Join"), s"selection planned a join:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$p")
  }

  test("x119: centroid sums are map-side combined; no cartesian") {
    val p = plan(ExtensionQueries.queries, "x119_centroid_drift")
    // the (group, dim) integer sums must partial-aggregate before their
    // exchange — the un-combined stream is corpus rows × dims
    assert(p.contains("partial_sum"), s"component sums not combined:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x120: PII report is scan + one combined agg — no join") {
    val p = plan(ExtensionQueries.queries, "x120_pii_report")
    assert(!p.contains("Join"), s"report planned a join:\n$p")
    assert(p.contains("partial_sum"), s"totals not map-side combined:\n$p")
  }

  test("x121: entropy carries n from the scan — no second doc-keyed " +
      "exchange, no join, no window") {
    val p = plan(ExtensionQueries.queries, "x121_token_entropy")
    assert(!p.contains("Join"), s"entropy planned a join:\n$p")
    assert(!p.contains("Window"), s"entropy planned a window:\n$p")
    assert(p.contains("partial_count"), s"term counts not combined:\n$p")
  }

  test("x123: OPH signature mins are map-side combined; no cartesian") {
    val p = plan(ExtensionQueries.queries, "x123_dedup_minhash_oph")
    // word-boundary match: a bare contains("partial_min") is substring-
    // satisfied by partial_min_by, which is NOT the combine this gates
    assert("partial_min\\(".r.findFirstIn(p).isDefined,
      s"bucket mins not combined:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x107: config diff is one scan — no join anywhere in the plan") {
    val p = plan(ExtensionQueries.queries, "x107_filter_config_diff")
    // both configs decide off ONE signal pass; a second text scan or a
    // self-join would double the corpus bill for a 4-row report
    assert(!p.contains("Join"), s"config diff planned a join:\n$p")
    assert(p.contains("HashAggregate"), p)
  }

  // r14: the composites flipped to OPH signatures keep the bucket-join
  // posture — no cartesian anywhere in the verify/downstream plan. (The
  // signature stage itself is localCheckpointed inside nearDupPairs, so
  // its map-side-combined partial_min property is gated where the agg is
  // visible: the x123 test above.)
  for (name <- Seq("x84_canonical_keep", "x85_source_overlap",
      "x109_split_leakage", "x111_cluster_histogram",
      "x82_containment_lsh")) {
    test(s"$name: OPH path — no cartesian in the verify plan") {
      val p = plan(ExtensionQueries.queries, name)
      assert(!p.contains("CartesianProduct"), s"$name planned a cartesian:\n$p")
    }
  }

  test("x134: link graph is extraction + two chained combinable aggs — " +
      "no join, no Expand (the x56 count-distinct lesson)") {
    val p = plan(ExtensionQueries.queries, "x134_link_graph")
    assert(!p.contains("Join"), s"link graph planned a join:\n$p")
    assert(!p.contains("Expand"), s"count_distinct Expand crept in:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 2,
      s"expected per-target + per-pair exchanges, got $exchanges:\n$p")
    assert(p.contains("partial_count"), s"first agg not combined:\n$p")
  }

  test("x135: NB scoring joins the weight table token-keyed and the " +
      "1-row consts broadcast — no cartesian of data") {
    val p = plan(ExtensionQueries.queries, "x135_nb_quality")
    assert(!p.contains("CartesianProduct"), p)
    // the consts crossJoin is an explicit broadcast of ONE row
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("URL tier plans carry the kernel expressions, not the column " +
      "compositions (the 3,244-node pushed-filter regression pin)") {
    val p131 = plan(ExtensionQueries.queries, "x131_url_canon")
    assert(p131.contains("canonicalize_url"), p131.take(2000))
    val p134 = plan(ExtensionQueries.queries, "x134_link_graph")
    assert(p134.contains("canonicalize_url"), p134.take(2000))
    assert(p134.contains("registered_domain_of"), p134.take(2000))
    // the blowup signature: a reverted composition re-inflates regexp
    // node counts by an order of magnitude
    val regexps = "regexp_extract".r.findAllIn(p134).length
    assert(regexps < 200,
      s"x134 plan carries $regexps regexp nodes — composition crept back")
  }

  test("x138: anchor rollup — two chained combinable aggs, no Expand, " +
      "no join") {
    val p = plan(ExtensionQueries.queries, "x138_anchor_text")
    assert(!p.contains("Join"), s"anchor rollup planned a join:\n$p")
    assert(!p.contains("Expand"), s"count_distinct Expand crept in:\n$p")
  }

  // the robots tiers: rule parsing is window passes over KB-sized
  // per-domain bodies; admission joins stay keyed (domain, then the URL
  // key) — nothing may plan a cartesian; x137's only join is the
  // domain-keyed full-outer card merge
  for (name <- Seq("x133_robots_filter", "x136_crawl_frontier",
      "x137_domain_card")) {
    test(s"$name: admission stays keyed — no cartesian anywhere") {
      val p = plan(ExtensionQueries.queries, name)
      assert(!p.contains("CartesianProduct"), s"$name planned a cartesian:\n$p")
    }
  }

  test("x139: the gzip→WARC→HTTP chain stays a narrow map — the kernels " +
      "live inside the projections, no join, no extra exchange class") {
    val df = ExtensionQueries.queries("x139_warc_gz_http")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"the container chain planned a join:\n$p")
    // the byte tier must plan as expressions, not lose codegen shape:
    // gzip rides the fixture projection; gunzip sits in the per-file
    // aggregate's result expressions (which the physical node's
    // toString elides — assert it on the analyzed plan instead)
    assert(p.contains("gzip_bytes"), s"gzip kernel not in plan:\n$p")
    val lp = df.queryExecution.analyzed.toString
    assert(lp.contains("gunzip_to_string"),
      s"gunzip kernel not in logical plan:\n$lp")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x140: the HTTP envelope split is ONE combinable agg over a " +
      "narrow projection — one hash exchange, no join") {
    val p = plan(ExtensionQueries.queries, "x140_http_headers")
    assert(!p.contains("Join"), s"envelope split planned a join:\n$p")
    assert(p.contains("partial_count"), s"rollup not map-side combined:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected the one rollup exchange, got " +
      s"$exchanges:\n$p")
  }

  test("x142: PageRank iterations read the checkpointed edge list — " +
      "no cartesian, link extraction never re-derives above the " +
      "checkpoints") {
    val p = plan(ExtensionQueries.queries, "x142_pagerank")
    assert(!p.contains("CartesianProduct"), s"pagerank cartesian:\n$p")
    // the edge list (with folded out-weights) and rank tables are
    // localCheckpointed: the final plan consumes RDD scans, not a
    // re-expanded extraction pipeline
    assert(p.contains("Scan ExistingRDD"), s"edges not checkpointed:\n$p")
    assert(!p.contains("regexp_extract_all"),
      s"link extraction re-derived above the checkpoints:\n$p")
  }

  test("x143: sitemap discovery joins stay equi-joins and the rollup " +
      "is two chained combinable aggs — no Expand, no cartesian") {
    val p = plan(ExtensionQueries.queries, "x143_sitemap_discovery")
    assert(!p.contains("CartesianProduct"), s"sitemap cartesian:\n$p")
    assert(!p.contains("Expand"), s"count_distinct Expand crept in:\n$p")
    assert(p.contains("partial_count"), s"rollup not map-side combined:\n$p")
  }

  test("x144: the chunked chain stays a narrow map — the dechunk " +
      "kernel rides the projections, no join") {
    val df = ExtensionQueries.queries("x144_http_chunked")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"the chunked chain planned a join:\n$p")
    assert(p.contains("dechunk_body"), s"dechunk kernel not in plan:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x145: the schedule consumes the ONE checkpointed link stream — " +
      "no cartesian, extraction never re-derives, one politeness " +
      "window") {
    val p = plan(ExtensionQueries.queries, "x145_frontier_schedule")
    assert(!p.contains("CartesianProduct"), s"schedule cartesian:\n$p")
    assert(p.contains("Scan ExistingRDD"),
      s"link stream not checkpointed:\n$p")
    assert(!p.contains("regexp_extract_all"),
      s"link extraction re-derived above the checkpoints:\n$p")
    // exactly one slot-assignment window over the admitted candidates
    // (the robots admission itself is agg-based, not window-based)
    val windows = "Window \\[row_number".r.findAllIn(p).length
    assert(windows == 1, s"expected the one slot window, got $windows:\n$p")
  }

  test("x146: revisit resolution is a top-1 group limit plus one " +
      "digest equi-join — no full per-digest sort, no cartesian") {
    val p = plan(ExtensionQueries.queries, "x146_warc_revisit")
    assert(!p.contains("CartesianProduct"), s"revisit cartesian:\n$p")
    // the earliest-response window must plan as WindowGroupLimit (rank
    // pushdown), not a full sort of every digest group
    assert(p.contains("WindowGroupLimit"), s"top-1 not pushed down:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("x147: the charset chain stays join-free — the decode routing " +
      "rides the projections") {
    val p = plan(ExtensionQueries.queries, "x147_charset_bytes")
    assert(!p.contains("Join"), s"the charset chain planned a join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    // the latin1-view re-encode/decode pair is in-plan (StaticInvoke
    // renders the charset name)
    assert(p.contains("ISO-8859-1"), s"charset routing not in plan:\n$p")
  }

  test("x141: the crawl loop's final plan reads localCheckpointed hop " +
      "scans — no cartesian, no re-derivation of the link stream") {
    val p = plan(ExtensionQueries.queries, "x141_crawl_hops")
    assert(!p.contains("CartesianProduct"), s"crawl loop cartesian:\n$p")
    // each hop materialized once: the rollup consumes checkpoint scans,
    // not a re-expanded extraction pipeline (no regexp work may remain)
    assert(p.contains("Scan ExistingRDD"), s"hops not checkpointed:\n$p")
    assert(!p.contains("regexp_extract_all"),
      s"link extraction re-derived above the checkpoints:\n$p")
  }

  test("x150: the content-coding chain stays a narrow map — gunzip/" +
      "inflate ride the projections, no join") {
    val df = ExtensionQueries.queries("x150_content_encoding")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"the coding chain planned a join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    // BOTH decoders are in-plan (the gzip/deflate routing CASE)
    assert(p.contains("gunzip_to_string"), s"gunzip not in plan:\n$p")
    assert(p.contains("inflate_to_string"), s"inflate not in plan:\n$p")
  }

  test("x151: main-content extraction is windows + id-keyed " +
      "aggregation — the best-run pick is never a corpus self-join, " +
      "no cartesian, no Expand") {
    val p = plan(ExtensionQueries.queries, "x151_main_content")
    assert(!p.contains("CartesianProduct"), s"block tier cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Expand"), s"count_distinct Expand crept in:\n$p")
    // the run window and the best-run top-1 window both present
    val windows = "Window \\[".r.findAllIn(p).length
    assert(windows >= 2, s"expected run + best-run windows:\n$p")
  }

  test("x152: redirect hops stay keyed — no cartesian; the loop's " +
      "final plan reads checkpointed hop scans") {
    val p = plan(ExtensionQueries.queries, "x152_redirect_follow")
    assert(!p.contains("CartesianProduct"), s"redirect loop cartesian:\n$p")
    assert(p.contains("Scan ExistingRDD"), s"hops not checkpointed:\n$p")
  }

  test("x153: the robots-meta tier is join-free — flags ride the " +
      "projections as narrow regex work") {
    val p = plan(ExtensionQueries.queries, "x153_meta_robots")
    assert(!p.contains("Join"), s"the meta tier planned a join:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"narrow map planned a hash shuffle:\n$p")
  }

  test("x154: the nofollow rollup is ONE combinable aggregation over " +
      "the exploded anchors — no join, no Expand") {
    val p = plan(ExtensionQueries.queries, "x154_nofollow_edges")
    assert(!p.contains("Join"), s"the edge rollup planned a join:\n$p")
    assert(!p.contains("Expand"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$p")
  }

  test("x155: canonical clustering is ONE canonical-keyed aggregation " +
      "— the resolve/extract work rides the projections") {
    val p = plan(ExtensionQueries.queries, "x155_canonical_cluster")
    assert(!p.contains("Join"), s"clustering planned a join:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$p")
  }

  test("x156: the meta-charset chain keeps the decode routing in-plan " +
      "and every join id-keyed — no cartesian") {
    val p = plan(ExtensionQueries.queries, "x156_meta_charset")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("ISO-8859-1"), s"charset routing not in plan:\n$p")
  }

  test("x157: domain boilerplate removal is an anti-join on the census " +
      "key — no Expand (single-distinct census), no cartesian") {
    val p = plan(ExtensionQueries.queries, "x157_domain_boilerplate")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Expand"), s"count_distinct Expand crept in:\n$p")
    assert(p.contains("LeftAnti"), s"census removal is not an anti-join:\n$p")
  }

  test("x158: trap detection is the two-stage distinct — combinable " +
      "aggs only, no Expand, no join") {
    val p = plan(ExtensionQueries.queries, "x158_trap_templates")
    assert(!p.contains("Join"), s"trap rollup planned a join:\n$p")
    assert(!p.contains("Expand"), s"count_distinct Expand crept in:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 2,
      s"expected pre-agg + rollup exchanges, got $exchanges:\n$p")
  }

  test("x159: the revalidation plan stays url-keyed end to end — the " +
      "latest-capture window, priority agg, and join share one key") {
    val p = plan(ExtensionQueries.queries, "x159_revalidation_plan")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // every hash exchange is keyed on url
    val keys = "Exchange hashpartitioning\\(([a-z_#0-9]+)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(keys.nonEmpty && keys.forall(_.startsWith("url")),
      s"non-url exchange key in $keys:\n$p")
  }

  test("x161: HITS half-steps read the checkpointed edge list and the " +
      "max normalization is a broadcast 1-row join — no re-derivation, " +
      "no cartesian blowup") {
    val p = plan(ExtensionQueries.queries, "x161_hits")
    assert(p.contains("Scan ExistingRDD"), s"edges not checkpointed:\n$p")
    assert(!p.contains("regexp_extract_all"),
      s"link extraction re-derived above the checkpoint:\n$p")
    // the only nested-loop joins are the 1-row max broadcasts
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x166: the BOM precedence chain keeps every join id-keyed and " +
      "the UTF-16 decode routing in-plan") {
    val p = plan(ExtensionQueries.queries, "x166_bom_charset")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("UTF-16LE"), s"utf-16 routing not in plan:\n$p")
  }

  test("x165: the dedup store stays digest-keyed — the first-pick " +
      "window and the original join share one key; no cartesian") {
    val p = plan(ExtensionQueries.queries, "x165_dedup_store")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("x164: the WET round trip stays keyed — no cartesian, no " +
      "nested-loop blowup through write/parse/decode") {
    val p = plan(ExtensionQueries.queries, "x164_wet_roundtrip")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("x162: media sniffing is a join-free narrow map — the " +
      "signature CASE rides the projections") {
    val p = plan(ExtensionQueries.queries, "x162_media_sniff")
    assert(!p.contains("Join"), s"the sniff tier planned a join:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"narrow map planned a hash shuffle:\n$p")
  }

  test("x163: the soft-404 probe table broadcasts — the page corpus " +
      "never shuffles") {
    val p = plan(ExtensionQueries.queries, "x163_soft404")
    assert(p.contains("BroadcastHashJoin"), s"probe join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
    // the only hash exchange is the probe side's domain-sized distinct
    // (below its BroadcastExchange); the page corpus itself must not
    // shuffle on a key
    val keys = "Exchange hashpartitioning\\(([a-z_#0-9]+)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(keys.forall(_.startsWith("reg_domain")),
      s"the corpus shuffled for a domain-sized probe table: $keys\n$p")
  }

  test("x160: domain PageRank iterations read the checkpointed edge " +
      "list — no re-derivation of the link extraction") {
    val p = plan(ExtensionQueries.queries, "x160_domain_rank")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Scan ExistingRDD"), s"edges not checkpointed:\n$p")
    assert(!p.contains("regexp_extract_all"),
      s"link extraction re-derived above the checkpoint:\n$p")
  }

  test("x168: the language-profile table broadcasts and the corpus " +
      "never shuffles for the filter — only the funnel's " +
      "language-count-sized groupBy exchanges") {
    val p = plan(ExtensionQueries.queries, "x168_lang_gopher")
    assert(!p.contains("SortMergeJoin"), s"profile join shuffled:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    // every hash exchange is the funnel aggregation on the lang key
    val keys = "Exchange hashpartitioning\\(([a-z_#0-9]+)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(keys.forall(_.startsWith("lang")),
      s"the corpus shuffled on a non-lang key: $keys\n$p")
  }

  test("x169: the line-rule profile table broadcasts; the explode and " +
      "rules stay narrow (the only hash exchange is the r19 " +
      "language-count-sized duplicate-profile collapse below the " +
      "BroadcastExchange — the corpus never shuffles)") {
    val p = plan(ExtensionQueries.queries, "x169_c4_lang_lines")
    assert(p.contains("BroadcastHashJoin"), s"profile join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
    // every hash exchange keys on the profile table's lang column (the
    // dedup collapse); the exploded line stage itself must stay narrow
    val keys = "Exchange hashpartitioning\\(([a-z_#0-9]+)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(keys.forall(_.startsWith("lang")),
      s"the line stage shuffled on a non-lang key: $keys\n$p")
  }

  test("x173: the extended router is one narrow scan-fused pass — no " +
      "hash exchange, no join (the group filter is a plan-time " +
      "literal array)") {
    val p = plan(ExtensionQueries.queries, "x173_script_router_ext")
    assert(!p.contains("Exchange hashpartitioning"),
      s"the router shuffled:\n$p")
    assert(!p.contains("Join"), s"the router planned a join:\n$p")
  }

  test("x174: the non-latin Gopher funnel keeps the x168 shape — " +
      "profiles broadcast, every hash exchange on the lang key") {
    val p = plan(ExtensionQueries.queries, "x174_lang_gopher_ext")
    assert(!p.contains("SortMergeJoin"), s"profile join shuffled:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    val keys = "Exchange hashpartitioning\\(([a-z_#0-9]+)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(keys.forall(_.startsWith("lang")),
      s"the corpus shuffled on a non-lang key: $keys\n$p")
  }

  test("x176: the capstone plans no cartesian product and broadcasts " +
      "its profile tables; the only unkeyed exchange is the fixture " +
      "spread") {
    val p = plan(ExtensionQueries.queries, "x176_first_mile_capstone")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"),
      s"profile joins did not broadcast:\n$p")
    // dedup banding/verify and the funnel legitimately shuffle on their
    // keys; a RoundRobin exchange beyond the single fixture spread
    // would mean a stage lost its partitioner
    val rr = "RoundRobinPartitioning".r.findAllMatchIn(p).size
    assert(rr <= 1, s"unexpected unkeyed exchanges ($rr):\n$p")
  }

  test("x177: the shipped C4 profile table broadcasts; the corpus " +
      "never shuffles before the line explode") {
    val p = plan(ExtensionQueries.queries, "x177_c4_script_lines")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"),
      s"profile join did not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus-side shuffle join:\n$p")
  }

  test("x178: every CDXJ join stays keyed (no cartesian product) and " +
      "the offset window is file-partitioned, never global") {
    val p = plan(ExtensionQueries.queries, "x178_cdxj_index")
    assert(!p.contains("CartesianProduct"), p)
    // the offset prefix sum must ride the file key — a global window
    // here would serialize the whole store through one partition
    assert(p.contains("windowspecdefinition(file_id"),
      s"offset window not file-keyed:\n$p")
    assert(p.contains("hashpartitioning(file_id"),
      s"no file-keyed exchange feeding the window:\n$p")
  }
}
