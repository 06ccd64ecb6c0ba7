"""Crawl-vs-oracle parity under a TRUE multi-executor cluster.

Gated behind SC_CLUSTER_TESTS=1: the run submits the full SparkCrawler
via `spark-submit --py-files` onto a local-cluster master (separate
executor JVMs + netty shuffle), which takes ~2-3 minutes and spawns its
own JVMs — too heavy for the default suite, where the same semantics
are already pinned in-process by tests/test_crawl_parity.py. Evidence
from ad-hoc runs is recorded in BENCH/cluster_parity.jsonl (1, 2 and 4
executors, both queue disciplines, all green 2026-08-19).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

pytestmark = pytest.mark.skipif(
    not os.environ.get("SC_CLUSTER_TESTS"),
    reason="cluster parity run is slow (spark-submit local-cluster); "
           "set SC_CLUSTER_TESTS=1 to enable")


def test_crawl_parity_under_local_cluster():
    from cluster_parity import _ensure_zip, submit_parity

    _ensure_zip()
    res = submit_parity(2)
    assert res["n_executors"] == 2
    for mode in ("random", "fifo", "random_bloom"):
        assert res["modes"][mode]["order_match"], mode
        assert res["modes"][mode]["seen_match"], mode
        assert res["modes"][mode]["crawled"] == \
            res["modes"][mode]["oracle_crawled"]
    assert res["all_match"]


def test_resume_across_jvm_lifetimes_under_local_cluster():
    """Snapshot written by one spark-submit JVM tree, resumed by a brand
    new one: the resumed crawl's final frontier state must equal an
    uninterrupted crawl's, and the uninterrupted run must match the
    reference oracle."""
    from cluster_parity import _ensure_zip, submit_resume

    _ensure_zip()
    res = submit_resume(2)
    second = res["second"]
    assert second["snapshot_found"]
    assert second["final_state_match"]
    assert second["seen_match"]
    assert second["uninterrupted_order_match"]
    assert second["uninterrupted_seen_match"]
    assert res["all_match"]
