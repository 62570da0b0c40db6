"""README/RESULTS throughput tables must match the latest BENCH_r*.json
to the digit (VERDICT r3 item 5: one source of truth — the docs carried
three different 'headline' numbers for the same metric in round 3)."""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_gen():
    spec = importlib.util.spec_from_file_location(
        "gen_perf_docs", os.path.join(REPO, "scripts", "gen_perf_docs.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_docs_match_their_named_bench_json():
    """The docs' generated blocks must match — to the digit — the bench
    json they NAME as their source. (The driver appends a new BENCH at
    every round's end after the last commit, so freshness vs the very
    latest file is the builder's per-round regen job; digit-consistency
    with the named source is what this CI guard pins.)"""
    gen = _load_gen()
    for name in ("README.md", "RESULTS.md"):
        src = gen.doc_source(name)
        assert src, f"{name} has no generated bench block"
        src_name, flat = gen.latest_bench(src)
        block = gen.render_block(src_name, flat)
        text = open(os.path.join(REPO, name)).read()
        assert block in text, (
            f"{name} drifted from {src} — run `python scripts/gen_perf_docs.py`"
        )


def test_generated_block_contains_core_modes():
    gen = _load_gen()
    src, flat = gen.latest_bench(gen.doc_source("README.md"))
    block = gen.render_block(src, flat)
    assert "updates/s" in block and "points/s" in block
    assert src in block
    for name in ("README.md", "RESULTS.md"):
        text = open(os.path.join(REPO, name)).read()
        assert block in text, f"{name} missing the generated bench block"
