"""Semantic tests for the corpus-curation operators (ext/corpus.py) —
properties the oracle hash can't express: sample stability under
repartitioning, packing capacity bounds, round-robin invariants,
single-pass funnel plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkgraft.ext import corpus
from sparkgraft.io.readers import read_table


def _docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents")


def test_hash_sample_stable_under_repartition(spark, sf_dir):
    """Membership must be a pure function of the row — repartitioning must
    not change the sample (the property seeded df.sample() lacks)."""
    docs = _docs(spark, sf_dir)
    a = {r.doc_id for r in corpus.hash_sample(docs, 10).select("doc_id").collect()}
    b = {
        r.doc_id
        for r in corpus.hash_sample(docs.repartition(7), 10).select("doc_id").collect()
    }
    assert a == b and len(a) > 0


def test_hash_sample_complement_disjoint_and_complete(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    ten = {r.doc_id for r in corpus.hash_sample(docs, 10).select("doc_id").collect()}
    all_ = {r.doc_id for r in corpus.hash_sample(docs, 100).select("doc_id").collect()}
    assert all_ == {r.doc_id for r in docs.select("doc_id").collect()}
    assert ten <= all_


def test_pack_sequences_capacity_bound(spark, sf_dir):
    """A bin may overflow only via its LAST doc (greedy one-pass rule):
    the exclusive prefix sum at entry is < capacity."""
    out = corpus.pack_sequences(_docs(spark, sf_dir), capacity=256).collect()
    by_bin: dict[tuple, list] = {}
    for r in sorted(out, key=lambda r: (r.source, r.doc_id)):
        by_bin.setdefault((r.source, r.seq_id), []).append(r.n_tokens)
    for toks in by_bin.values():
        entry_offsets = [sum(toks[:i]) for i in range(len(toks))]
        assert all(off < 256 for off in entry_offsets)


def test_pack_sequences_presplit_equals_default(spark, sf_dir):
    """Giant-source pre-split must be invisible in the output: chunk width
    7 (forcing many chunks per source) yields bit-identical seq_ids to the
    single-window default — the two-level prefix sum composes exactly."""
    docs = _docs(spark, sf_dir)
    split = {
        (r.source, r.doc_id, r.n_tokens, r.seq_id)
        for r in corpus.pack_sequences(docs, capacity=256, presplit_chunk=7).collect()
    }
    plain = {
        (r.source, r.doc_id, r.n_tokens, r.seq_id)
        for r in corpus.pack_sequences(docs, capacity=256).collect()
    }
    assert split == plain
    assert split


def test_pack_sequences_presplit_bounded_windows(spark, sf_dir):
    """With presplit on, no window over the DOC relation may partition by
    bare source (one task per giant source): fact windows partition by
    (source, __chunk); only the per-chunk totals relation (#chunks rows
    per source) may window on bare source."""
    out = corpus.pack_sequences(_docs(spark, sf_dir), presplit_chunk=1 << 20)
    plan = out._jdf.queryExecution().optimizedPlan()
    saw_fact_window = False
    for node in _walk_plan(plan):
        if node.getClass().getSimpleName() != "Window":
            continue
        spec = node.partitionSpec().toString()
        assert not node.partitionSpec().isEmpty(), "global window in presplit plan"
        if "__chunk" in spec:
            saw_fact_window = True
        else:
            # bare-source window: allowed only over the chunk-totals agg
            assert "__ct" in node.windowExpressions().toString(), (
                f"bare-source window over the doc relation: {node.toString()[:200]}"
            )
    assert saw_fact_window


def test_decontaminate_drops_planted_phrase(spark):
    bench = corpus.benchmark_shingles(spark, ("alpha beta gamma delta",), n=4)
    docs = spark.createDataFrame(
        [
            (1, "clean words only here today"),
            (2, "prefix alpha beta gamma delta suffix"),
            (3, "alpha beta gamma NOT-delta"),
        ],
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in corpus.decontaminate(docs, bench, n=4).collect()}
    assert kept == {1, 3}


def test_interleave_round_robin_invariant(spark, sf_dir):
    """Every doc at per-source position p must rank before every doc at
    position p+1, and mix_rank must be a dense permutation 1..N."""
    rows = corpus.interleave_sources(_docs(spark, sf_dir)).collect()
    assert sorted(r.mix_rank for r in rows) == list(range(1, len(rows) + 1))
    max_rank_at_pos: dict[int, int] = {}
    min_rank_at_pos: dict[int, int] = {}
    for r in rows:
        max_rank_at_pos[r.pos] = max(max_rank_at_pos.get(r.pos, 0), r.mix_rank)
        min_rank_at_pos[r.pos] = min(min_rank_at_pos.get(r.pos, 1 << 60), r.mix_rank)
    for p in sorted(max_rank_at_pos)[:-1]:
        if p + 1 in min_rank_at_pos:
            assert max_rank_at_pos[p] < min_rank_at_pos[p + 1]


def test_interleave_chunked_prefix_sum_equals_single_chunk(spark, sf_dir):
    """The two-level prefix sum must be invisible in the output: a chunk
    size forcing many chunks (3 positions per chunk) yields bit-identical
    mix_ranks to the effectively-unchunked default."""
    docs = _docs(spark, sf_dir)
    tiny = {
        (r.doc_id, r.mix_rank)
        for r in corpus.interleave_sources(docs, chunk=3).collect()
    }
    default = {
        (r.doc_id, r.mix_rank)
        for r in corpus.interleave_sources(docs).collect()
    }
    assert tiny == default
    assert tiny


def _walk_plan(node):
    yield node
    for i in range(node.children().size()):
        yield from _walk_plan(node.children().apply(i))


def test_decontaminate_plan_broadcasts_probe_corpus_never_shuffles_text(
    spark, sf_dir
):
    """Plan contract: the benchmark shingle set reaches the semi-join as a
    BroadcastExchange, and NO shuffle exchange partitions on the text or
    shingle columns — the corpus moves only as (small) id sets."""
    docs = _docs(spark, sf_dir)
    bench = corpus.benchmark_shingles(spark, ("alpha beta gamma delta",), n=4)
    out = corpus.decontaminate(docs, bench, n=4)
    root = out._jdf.queryExecution().executedPlan()
    assert "BroadcastExchange" in root.toString(), root.toString()
    # corpus-side only: the benchmark's internal distinct (LocalTableScan
    # source, KB-sized) may shuffle on sh; any shuffle whose subtree reads
    # the documents PARQUET must partition on ids, never text/shingles
    for node in _walk_plan(root):
        cls = node.getClass().getSimpleName()
        if not cls.startswith("ShuffleExchange"):
            continue
        subtree = node.toString()
        if "FileScan" not in subtree:
            continue  # benchmark-side shuffle: tiny by construction
        head = subtree.splitlines()[0]
        assert "text#" not in head and "sh#" not in head, (
            f"corpus text/shingles shuffled: {head}"
        )


def test_interleave_no_global_window_on_corpus(spark, sf_dir):
    """No window whose input scales with a per-source doc count may be
    unpartitioned (single-task). The two-level prefix sum leaves exactly
    one global window — over the per-CHUNK totals (max_pos/chunk rows),
    recognizable by its __ct running-sum expression. Walk the logical plan
    and check every partitionless Window node is that one."""
    out = corpus.interleave_sources(_docs(spark, sf_dir))
    plan = out._jdf.queryExecution().optimizedPlan()
    n_global = 0
    for node in _walk_plan(plan):
        if node.getClass().getSimpleName() != "Window":
            continue
        if node.partitionSpec().isEmpty():
            n_global += 1
            exprs = node.windowExpressions().toString()
            assert "__ct" in exprs, (
                f"global window over something other than chunk totals: {exprs}"
            )
    assert n_global == 1, f"expected exactly one (chunk-total) global window, saw {n_global}"


def test_split_assign_group_keyed_no_straddle(spark, sf_dir):
    """Keyed on source, every row of a source must land in ONE split, and
    all three splits must be populated when keyed per-doc."""
    docs = _docs(spark, sf_dir)
    by_source = corpus.split_assign(docs, key_col="source").collect()
    seen: dict[str, set] = {}
    for r in by_source:
        seen.setdefault(r.source, set()).add(r.split)
    assert all(len(s) == 1 for s in seen.values()), seen
    per_doc = {r.split for r in corpus.split_assign(docs, 10, 10).collect()}
    assert per_doc == {"train", "val", "test"}


def test_contamination_score_planted_overlap(spark):
    """Score = |doc-shingles ∩ bench| / |doc-shingles| on planted docs."""
    bench = corpus.benchmark_shingles(spark, ("alpha beta gamma delta",), n=4)
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),          # 1 shingle, hit -> 1.0
            (2, "x alpha beta gamma delta y"),      # 3 shingles, 1 hit
            (3, "totally clean words here now"),    # 2 shingles, 0 hits
            (4, "too short"),                       # <4 tokens: whole-doc shingle
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_shingles, r.n_contaminated, r.contamination)
        for r in corpus.contamination_score(docs, bench, n=4).collect()
    }
    assert got == {
        1: (1, 1, 1.0),
        2: (3, 1, round(1 / 3, 6)),
        3: (2, 0, 0.0),
        4: (1, 0, 0.0),
    }


def test_stratified_sample_exact_quotas(spark, sf_dir):
    """Every stratum must deliver exactly min(quota, stratum size) rows,
    and two runs must pick identical docs (determinism)."""
    docs = _docs(spark, sf_dir)
    full = {
        (r.lang, r.source): c
        for r, c in (
            (row, row.n)
            for row in docs.groupBy("lang", "source").agg(F.count("*").alias("n")).collect()
        )
    }
    out1 = corpus.stratified_sample(docs, quota=5).collect()
    out2 = {r.doc_id for r in corpus.stratified_sample(docs, quota=5).collect()}
    per_stratum: dict[tuple, int] = {}
    for r in out1:
        per_stratum[(r.lang, r.source)] = per_stratum.get((r.lang, r.source), 0) + 1
    for key, n_full in full.items():
        assert per_stratum.get(key, 0) == min(5, n_full), key
    assert {r.doc_id for r in out1} == out2


def test_quality_funnel_monotone_and_single_scan(spark, sf_dir):
    out = corpus.quality_funnel(_docs(spark, sf_dir))
    # plan BEFORE execution — post-collect AQE toString prints the initial
    # plan a second time, double-counting the scan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1, "funnel must be one pass over the corpus"
    rows = {r.stage: r.n_docs for r in out.collect()}
    assert rows["0_raw"] >= rows["1_lang"] >= rows["2_minlen"] >= rows["3_dedup"]
