"""Plan-shape guards: the physical plans behind the registry queries must
stay the plans the 100-TB design argues for. These assertions inspect the
formatted explain output (strategy names, scan schemas), not the data, so
they catch a lost broadcast hint, an accidental row-at-a-time Python UDF,
or a projection that stops reaching the parquet scan — regressions a
row-count correctness gate can never see and a benchmark only sees as an
unexplained slowdown.

Registry callables that run iterative jobs eagerly (connected components,
entity formation) are exercised end-to-end by tests/test_entry.py; here we
sweep every registry plan for globally-forbidden nodes and pin the shape
of the cheap, purely-lazy flagships.
"""

import io
from contextlib import redirect_stdout

import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    """Formatted physical-plan string for a DataFrame (pre-execution)."""
    try:
        jvm = df.sparkSession._jvm
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        return df._jdf.queryExecution().explainString(mode)
    except Exception:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()


@pytest.fixture(scope="module")
def plans(spark):
    """name -> formatted plan for every registry query at sf0.001."""
    out = {}
    for name, fn in entry_mod.queries().items():
        out[name] = _plan(fn(spark, SF_DIR))
    return out


#: Deliberate small-side cross joins: the brute-force ANN verifier joins a
#: broadcast query set against every document (O(Q*N) by contract), the
#: decontamination operator probes a broadcast benchmark n-gram set the same
#: way, and semantic_decontaminate attaches a single broadcast row carrying
#: the benchmark-embedding array. BroadcastNestedLoopJoin is the *intended*
#: strategy there; anywhere else it means an equi-join condition was lost.
BNLJ_ALLOWED = {
    "ann_topk",
    "ann_recall",
    "ann_ivf_recall",
    "decontaminate",
    "semantic_decontaminate",
}


def test_no_cartesian_product_anywhere(plans):
    """A CartesianProduct node means a join lost both its keys and its
    broadcast hint — at 100 TB that is a non-terminating query."""
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert offenders == []


def test_no_row_python_udf_anywhere(plans):
    """BatchEvalPython is the row-at-a-time Python UDF operator — the
    repo's contract is Arrow-vectorized kernels only (ArrowEvalPython,
    FlatMapGroupsInPandas, MapInPandas are the sanctioned shapes)."""
    offenders = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert offenders == []


def test_broadcast_nested_loop_only_where_deliberate(plans):
    offenders = [
        n
        for n, p in plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in BNLJ_ALLOWED
    ]
    assert offenders == []


def test_linkage_exact_pass_broadcasts_spine(plans):
    """criteria_pass promises a broadcast-hash-join probe of the spine
    (the spine is orders of magnitude smaller than the event table)."""
    assert "BroadcastHashJoin" in plans["linkage_exact_pass"]
    assert "SortMergeJoin" not in plans["linkage_exact_pass"]


def test_token_counts_prunes_document_columns(plans):
    """The documents scan must read only (doc_id, text): lang/source/
    n_chars are pruned. A scan reading all columns for a 2-column
    projection multiplies 100-TB scan bytes for nothing."""
    plan = plans["token_counts"]
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read, plan
    schema = read[0]
    assert "text" in schema
    for dropped in ("lang", "source", "n_chars"):
        assert dropped not in schema, schema


def test_aggregations_are_partial(plans):
    """Group-counts must map-side combine: two HashAggregate nodes
    (partial + final) around the key exchange."""
    assert plans["validity_filter"].count("HashAggregate") >= 2


def test_scan_filter_pushes_down(spark):
    """A predicate on a raw parquet column must reach the scan as a
    pushed filter, not a post-scan Filter over full row groups."""
    from pyspark.sql import functions as F

    df = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("lang") == "en")
        .select("doc_id")
    )
    plan = _plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, plan
    assert "lang" in pushed[0], pushed[0]


def test_pack_sequences_doc_window_is_bucket_partitioned(plans):
    """The distributed-prefix-sum contract: the corpus-sized window must
    be partitioned by the id-range bucket; the only unpartitioned-ish
    (single-partition) window may run over the tiny bucket-totals frame.
    A lost partition spec here silently serializes the whole corpus
    through one window task."""
    plan = plans["pack_sequences"]
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "no window in pack_sequences plan"
    doc_windows = [s for s in specs if "_bucket" in s.split(",")[0]]
    assert doc_windows, f"doc-level window lost its _bucket partition: {specs}"


def test_sessionize_single_shuffle_two_windows(plans):
    """sessionize's contract: lag and the running sum share one
    (key, ts) window spec — ONE Exchange, both Window execs downstream
    of it. A second Exchange means the specs diverged and the corpus
    shuffles twice."""
    import re

    plan = plans["sessionize"]
    nodes = re.findall(r"\(\d+\) (\w*Exchange|Window)", plan)
    assert nodes.count("Exchange") == 1, nodes
    assert nodes.count("Window") == 2, nodes


def test_corpus_mix_broadcasts_rates_never_shuffles_corpus(plans):
    """corpus_mix's contract: the per-source rates ride a
    BroadcastExchange back onto the corpus; the only hash Exchange is
    the tiny rates aggregation. The corpus side must reach the join
    without an Exchange of its own."""
    import re

    plan = plans["corpus_mix"]
    assert "BroadcastHashJoin" in plan
    hash_exchanges = re.findall(r"\(\d+\) Exchange", plan)
    assert len(hash_exchanges) == 1, plan[:2000]


def test_semantic_decontaminate_never_shuffles_corpus(plans):
    """semantic_decontaminate's contract: the corpus is scanned once,
    map-side only — the benchmark rides a single broadcast row
    (BuildRight BNLJ) and the only hash Exchange in the plan is the
    tiny benchmark-side collect_list aggregation."""
    import re

    plan = plans["semantic_decontaminate"]
    assert "BroadcastNestedLoopJoin" in plan and "BuildRight" in plan
    hash_exchanges = re.findall(r"\(\d+\) Exchange", plan)
    assert len(hash_exchanges) == 1, plan[:2000]


def test_split_corpus_is_map_side_only(plans):
    """split_corpus's contract: the assignment is a pure row-local
    function of the key — no Exchange of any kind may appear (a shuffle
    here means someone traded the deterministic hash for a stateful
    sampler)."""
    assert "Exchange" not in plans["split_corpus"], plans["split_corpus"][:2000]


def test_epoch_shuffle_is_one_range_exchange_no_global_sort(plans):
    """epoch_shuffle's contract: exactly one rangepartitioning Exchange
    and only within-partition sorts (Sort nodes with global=false). A
    global sort would funnel the epoch order through one task; a hash
    exchange would lose the sequential-read-replays-the-order property."""
    import re

    plan = plans["epoch_shuffle"]
    assert "rangepartitioning" in plan, plan[:2000]
    exchanges = re.findall(r"\(\d+\) Exchange", plan)
    assert len(exchanges) == 1, plan[:2000]
    for m in re.finditer(r"Sort \[([^\]]*)\], (\w+)", plan):
        assert m.group(2) == "false", f"global sort in epoch_shuffle: {m.group(0)}"
