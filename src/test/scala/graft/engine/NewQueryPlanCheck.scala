package graft.engine

import graft.SparkSpec

/** Plan-quality pins for the round-5 queries: column pruning must reach
  * the scan (a decode/scrub pipeline that drags `text`/`embedding` or
  * every column through mapPartitions is wrong at 100 TB). */
class NewQueryPlanCheck extends SparkSpec {

  private def scanSchema(q: String): String = {
    val plan = graft.SparkEntry.queries(q)(spark, sf0001)
      .queryExecution.executedPlan.toString
    "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan)
      .map(_.group(1)).getOrElse(s"NO SCAN in:\n$plan")
  }

  test("image decode scans only the id and size columns") {
    val s = scanSchema("c16_image_decode")
    assert(s.contains("doc_id") && s.contains("n_chars") && !s.contains("text:"),
      s"image decode over-reads: $s")
  }

  test("pii scrub scans only id + text") {
    val s = scanSchema("c15_pii_scrub")
    assert(s.contains("doc_id") && s.contains("text") && !s.contains("lang"),
      s"pii scrub over-reads: $s")
  }

  test("line dedup materializes only (doc, pos, line) at the checkpoint") {
    // the parquet scan sits behind lineDedup's localCheckpoint, so the
    // final plan starts at Scan ExistingRDD — assert the checkpointed
    // frame was pruned to the three working columns before materializing
    val plan = graft.SparkEntry.queries("c13_line_dedup")(spark, sf0001)
      .queryExecution.executedPlan.toString
    val rdd = "Scan ExistingRDD\\[([^\\]]*)\\]".r.findFirstMatchIn(plan)
      .map(_.group(1)).getOrElse(s"NO ExistingRDD in:\n$plan")
    assert(rdd.contains("doc") && rdd.contains("pos") && rdd.contains("line")
      && !rdd.contains("lang") && !rdd.contains("source"),
      s"line dedup checkpoint over-materializes: $rdd")
  }

  test("compression ratio scans only id + text") {
    val s = scanSchema("c15_compress_ratio")
    assert(s.contains("doc_id") && s.contains("text") && !s.contains("n_chars"),
      s"compress ratio over-reads: $s")
  }

  test("image resize scans only the id and size columns") {
    val s = scanSchema("c16_image_resize")
    assert(s.contains("doc_id") && s.contains("n_chars") && !s.contains("text:"),
      s"image resize over-reads: $s")
  }

  test("bigram NLL checkpoints only (doc, w1, w2) and joins shuffled-hash") {
    val plan = graft.SparkEntry.queries("c15_bigram_nll")(spark, sf0001)
      .queryExecution.executedPlan.toString
    val rdd = "Scan ExistingRDD\\[([^\\]]*)\\]".r.findFirstMatchIn(plan)
      .map(_.group(1)).getOrElse(s"NO ExistingRDD in:\n$plan")
    assert(rdd.contains("doc") && rdd.contains("w1") && rdd.contains("w2")
      && !rdd.contains("text"), s"bigram checkpoint over-materializes: $rdd")
    assert(plan.contains("ShuffledHashJoin"), s"count probe not shuffled-hash:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"sortful probe join:\n$plan")
  }

  test("datetime grammar pushes the status filter into the scan") {
    val plan = graft.SparkEntry.queries("b7_datetime_grammar")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("EqualTo(o_orderstatus,F)"),
      s"status filter not pushed:\n$plan")
  }

  test("audio decode scans only the id and size columns") {
    val s = scanSchema("c16_audio_decode")
    assert(s.contains("doc_id") && s.contains("n_chars") && !s.contains("text:"),
      s"audio decode over-reads: $s")
  }

  test("presto strings pushes the isin filter and prunes to three columns") {
    val plan = graft.SparkEntry.queries("b7_presto_strings")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("In(event_type"),
      s"isin filter not pushed:\n$plan")
    val s = scanSchema("b7_presto_strings")
    assert(s.contains("event_id") && s.contains("event_type") && s.contains("props")
      && !s.contains("value") && !s.contains("user_id"),
      s"presto strings over-reads: $s")
  }

  test("funnel plans one user-keyed exchange reused by all three windows and the agg") {
    val plan = graft.SparkEntry.queries("c9_funnel")(spark, sf0001)
      .queryExecution.executedPlan.toString
    val windows = "Window ".r.findAllIn(plan).length
    assert(windows == 3, s"expected 3 Window nodes, got $windows in:\n$plan")
    // one hash exchange feeds windows AND the per-user aggregate (same
    // key); only the final 1-row rollup adds a single-partition exchange
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx in:\n$plan")
    val sorts = "\\bSort \\[".r.findAllIn(plan).length
    assert(sorts == 1, s"expected the windows to share one sort, got $sorts in:\n$plan")
  }

  test("rep collapse scans only id + text and never shuffles the corpus under the gate") {
    // round 8: the digest aggregate runs inside the gate's checkpoint;
    // the registered query's own plan must be scan → broadcast semi-join
    // → project, pruned to the two working columns, with ZERO shuffle
    // exchanges (document text stays columnar in the scan)
    val s = scanSchema("c13_rep_collapse")
    assert(s.contains("doc_id") && s.contains("text")
      && !s.contains("lang") && !s.contains("source"),
      s"rep collapse over-reads: $s")
    val plan = graft.SparkEntry.queries("c13_rep_collapse")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"rep collapse shuffled the corpus under the gate:\n$plan")
  }

  test("winnow fingerprint stream is a zero-shuffle projection pruned to id + text") {
    // the signature build must never shuffle the corpus (the posting
    // list is the only thing that leaves the scan)
    val docs = Tables.read(spark, sf0001, "documents")
    val fp = graft.ops.Dedup.winnowFingerprints(docs, "doc_id", "text")
    val plan = fp.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"winnow signature build shuffles:\n$plan")
    val s = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan)
      .map(_.group(1)).getOrElse("NO SCAN")
    assert(s.contains("doc_id") && s.contains("text") && !s.contains("lang"),
      s"winnow over-reads: $s")
  }

  test("winnow pairs' final plan aggregates the checkpointed (doc, fp) postings only") {
    val plan = graft.SparkEntry.queries("c13_winnow_pairs")(spark, sf0001)
      .queryExecution.executedPlan.toString
    val rdd = "Scan ExistingRDD\\[([^\\]]*)\\]".r.findFirstMatchIn(plan)
      .map(_.group(1)).getOrElse(s"NO ExistingRDD in:\n$plan")
    assert(rdd.contains("doc") && rdd.contains("fp") && !rdd.contains("text"),
      s"winnow checkpoint over-materializes: $rdd")
    assert(plan.contains("ShuffledHashJoin"), s"pair join not shuffled-hash:\n$plan")
  }

  test("substring decontamination scans only doc_id for the removal pass under the gate") {
    // the doom set is computed behind checkpoints; the registered query's
    // own plan must be scan -> broadcast anti-join -> project, with the
    // corpus scan pruned to the id column and never hash-shuffled
    val plan = graft.SparkEntry.queries("c24_substring_decontaminate")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"removal pass not a broadcast anti-join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"corpus shuffled under the gate:\n$plan")
    val s = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan)
      .map(_.group(1)).getOrElse("NO SCAN")
    assert(s.contains("doc_id") && !s.contains("text"),
      s"removal pass over-reads: $s")
  }

  test("zscore outliers plans agg+join, not a per-group window") {
    val plan = graft.SparkEntry.queries("c6_zscore_outliers")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"zscore fell back to a window:\n$plan")
    val s = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan)
      .map(_.group(1)).getOrElse("NO SCAN")
    assert(!s.contains("props") && !s.contains("user_id"),
      s"zscore over-reads: $s")
  }

  test("window dist shares one exchange + sort between percent_rank and cume_dist") {
    val plan = graft.SparkEntry.queries("c9_window_dist")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("Window ".r.findAllIn(plan).length == 1,
      s"expected one Window node:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"expected one exchange:\n$plan")
    assert("\\bSort \\[".r.findAllIn(plan).length == 1,
      s"expected one sort:\n$plan")
  }

  test("heavy hitters folds partial sketches map-side") {
    val plan = graft.SparkEntry.queries("c8_heavy_hitters")(spark, sf0001)
      .queryExecution.executedPlan.toString
    // partial ObjectHashAggregate -> single exchange -> final: the
    // sketch, not the rows, crosses the wire
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2,
      s"no partial sketch aggregation:\n$plan")
    assert("Exchange".r.findAllIn(plan).length == 1,
      s"expected exactly one exchange:\n$plan")
  }

  test("salted agg plans two hash-aggregate phases with no extra exchange") {
    val plan = graft.SparkEntry.queries("c6_salted_agg")(spark, sf0001)
      .queryExecution.executedPlan.toString
    // phase 1 keyed (key, salt), phase 2 keyed (key): 2 logical aggs =
    // 4 HashAggregate nodes (partial+final each), exactly 2 exchanges
    val aggs = "HashAggregate".r.findAllIn(plan).length
    assert(aggs == 4, s"expected 4 HashAggregate nodes, got $aggs in:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges in:\n$plan")
  }
}
