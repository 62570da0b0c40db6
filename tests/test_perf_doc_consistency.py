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


def test_docs_match_latest_bench_json():
    gen = _load_gen()
    changed = gen.main(write=False)
    assert not changed, (
        f"{changed} drifted from the latest BENCH_r*.json — run "
        "`python scripts/gen_perf_docs.py`"
    )


def test_generated_block_contains_core_modes():
    gen = _load_gen()
    src, flat = gen.latest_bench()
    block = gen.render_block(src, flat)
    assert "updates/s" in block and "points/s" in block
    assert src in block
    for name in ("README.md", "RESULTS.md"):
        text = open(os.path.join(REPO, name)).read()
        assert block in text, f"{name} missing the generated bench block"
