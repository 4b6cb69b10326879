"""The reference's OWN test, on its OWN data: run the Tier A engine over
the 8 Project Gutenberg books shipped with the reference
(/root/reference/inputs/pg-*.txt, ~2.9 MB — the exact corpus
test-mr.sh:26-92 uses) and byte-compare the merged sorted output against
the pure-Python sequential executor, exactly the golden-diff protocol
(sequential oracle ↔ distributed engine, Makefile:33-37)."""

from __future__ import annotations

import glob

import pytest

from mr_spark.engine import get_app, run_files, run_sequential
from mr_spark.engine.sequential import to_text_lines

_GLOB = "/root/reference/inputs/pg-*.txt"


def _read_inputs() -> list[tuple[str, str]]:
    files = sorted(glob.glob(_GLOB))
    if not files:
        pytest.skip("reference corpus not present")
    return [(p, open(p, encoding="utf-8").read()) for p in files]


@pytest.mark.parametrize("app_name", ["wc", "indexer"])
def test_golden_diff_on_reference_corpus(spark, tmp_path, app_name):
    inputs = _read_inputs()
    app = get_app(app_name)
    golden = to_text_lines(run_sequential(inputs, app))
    engine = run_files(
        spark, _GLOB, app, str(tmp_path / f"out_{app_name}"), n_reduce=10
    )
    assert engine == golden
    assert len(golden) > 10_000  # real corpus, not a toy fixture
