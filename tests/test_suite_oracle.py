"""Every suite entry must match its DuckDB oracle at sf0.001 — the local
replica of the driver's t2 correctness gate."""

import pytest

from boostdb_spark import suite
from boostdb_spark.verify import run_one
from tests.conftest import SF_DIR

ALL = sorted(suite.spark_queries())


@pytest.mark.parametrize("name", ALL)
def test_oracle_match(spark, duck, name):
    problems = run_one(spark, duck, name, SF_DIR)
    assert not problems, f"{name}: {problems}"


def test_every_query_has_oracle_or_reason():
    missing = set(suite.spark_queries()) - set(suite.oracle_queries())
    # non-SQL-expressible ops may omit the oracle; keep the list explicit
    # approximate by design; ANN covered by tests/test_ann.py, sketch
    # aggregates by tests/test_timeseries_ops.py error-bound tests
    allowed_missing = {
        "ann_lsh_topk",
        "ann_ivf_topk",
        "ann_pq_topk",
        "agg_approx_count_distinct",
        "agg_approx_quantiles",
        # iterative argmax loop, not SQL-expressible; equivalence to the
        # classic sequential algorithm pinned in test_text_dedup_ops.py
        "txt_bpe_train",
        "txt_bpe_tokenize",
    }
    assert missing <= allowed_missing, f"queries without oracle: {missing}"


def test_compare_rejects_int_float_twin():
    """The driver hashes cell REPRESENTATIONS: BIGINT 3 vs DOUBLE 3.0 is
    a driver FAIL even though the values are numerically equal (round-9
    shipped dialect_recursive_cte red on exactly this). The local gate
    must replicate that — both for native int64/float64 columns and for
    object-dtype cells."""
    import numpy as np
    import pandas as pd

    from boostdb_spark.verify import compare

    ints = pd.DataFrame({"k": [1, 2], "v": [3, 4]})
    floats = pd.DataFrame({"k": [1, 2], "v": [3.0, 4.0]})
    problems = compare(floats, ints)
    assert problems and "representation mismatch" in problems[0], problems
    assert compare(ints.copy(), ints.copy()) == []
    assert compare(floats.copy(), floats.copy()) == []
    # object-dtype cells that survive .tolist() as numpy scalars (a
    # nullable int column coerces to float64 on BOTH engines' pandas
    # paths identically, so only non-null object cells carry the signal)
    obj_int = pd.DataFrame({"v": pd.Series([np.int64(3)], dtype=object)})
    obj_flt = pd.DataFrame({"v": pd.Series([3.0], dtype=object)})
    problems = compare(obj_flt, obj_int)
    assert problems and "representation mismatch" in problems[0], problems
    # bools are NOT ints for this purpose
    bools = pd.DataFrame({"v": [True, False]})
    assert compare(bools.copy(), bools.copy()) == []
    # r10 advice: a genuine VALUE mismatch with mixed dtypes (int 3 vs
    # float 4.0) must be reported as a value diff, not only as a
    # representation nit that points the fixer at the wrong problem
    a = pd.DataFrame({"v": [3]})
    b = pd.DataFrame({"v": [4.0]})
    problems = compare(a, b)
    assert problems and "value mismatch" in problems[0], problems
    assert "3" in problems[0] and "4.0" in problems[0]


def test_driver_window_is_certifiable():
    """The driver hash-checks only the first 50 exported queries: every
    one of those must be oracle-paired (hard signal, no wasted slots)
    — except the explicitly documented _ROWS_ONLY_WINDOWED set (the
    oracle-less ANN/BPE entries windowed for the driver's weaker
    rows-only check per the r10 verdict ask #2; their hash-gated
    certificate siblings must ride in the same window). The window
    must also include the LLM-pipeline families."""
    names = list(suite.spark_queries())
    window = names[:50]
    oracles = set(suite.oracle_queries())
    missing = [n for n in window if n not in oracles]
    assert set(missing) == set(suite._ROWS_ONLY_WINDOWED), (
        f"driver-window entries without oracle: {missing} "
        f"(allowed rows-only set: {sorted(suite._ROWS_ONLY_WINDOWED)})"
    )
    # when rows-only entries ARE windowed, their strong hash-gated
    # certificates must ride in the same window (r12: the set is empty
    # — ANN/BPE got their driver readings + certificates in r11)
    cert_of = {
        "ann_lsh_topk": "ann_recall_certified",
        "ann_ivf_topk": "ann_recall_certified",
        "ann_pq_topk": "ann_append_certified",
        "txt_bpe_train": "txt_bpe_roundtrip",
        "txt_bpe_tokenize": "txt_bpe_roundtrip",
    }
    for rows_only in suite._ROWS_ONLY_WINDOWED:
        cert = cert_of[rows_only]
        assert cert in window, f"{cert} must ride with its rows-only kin"
    llm_prefixes = ("dedup_", "txt_", "doc_", "emb_", "pipeline_")
    n_llm = sum(1 for n in window if n.startswith(llm_prefixes))
    assert n_llm >= 6, f"only {n_llm} LLM-pipeline entries in driver window"
    # window ordering list must stay consistent with the registry
    assert set(suite._WINDOW) <= set(names)
    assert len(suite._WINDOW) == len(set(suite._WINDOW)) == 50
