"""docs/MIGRATION.md promises users a home for every reference symbol —
guard that every `online_gp_tpu...` dotted path it names actually
resolves, so the guide cannot rot as modules move."""

import importlib
import pathlib
import re

DOC = pathlib.Path(__file__).resolve().parents[1] / "docs" / "MIGRATION.md"


def test_every_named_module_path_resolves():
    text = DOC.read_text()
    paths = set(re.findall(r"`(online_gp_tpu(?:\.\w+)+)`", text))
    assert len(paths) > 15, "migration guide lost its symbol map"
    failures = []
    for dotted in sorted(paths):
        parts = dotted.split(".")
        # try as module, else as module.attr
        try:
            importlib.import_module(dotted)
            continue
        except ImportError:
            pass
        try:
            mod = importlib.import_module(".".join(parts[:-1]))
            if not hasattr(mod, parts[-1]):
                failures.append(dotted)
        except ImportError:
            failures.append(dotted)
    assert not failures, f"migration-doc paths do not resolve: {failures}"


def test_api_symbols_in_doc():
    """Every public task wrapper must appear in the migration guide."""
    import online_gp_tpu.api as api

    text = DOC.read_text()
    for name in api.__all__:
        assert name in text, f"api.{name} missing from docs/MIGRATION.md"
