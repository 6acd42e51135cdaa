"""Self-attributing diagnostics (`async_pipes_spark/diag.py`): the
driver-divergence fingerprints must be deterministic, append-only
under rotation (r10 ADVICE: the single-slot rotation could destroy
exactly the archives the investigation needs), and NEVER able to fail
the query that carries them."""

from __future__ import annotations

import json
import shutil
import tempfile
from pathlib import Path

import pytest

from async_pipes_spark import diag


@pytest.fixture()
def diag_dir(monkeypatch):
    d = Path(tempfile.mkdtemp(prefix="diag_"))
    monkeypatch.setattr(diag, "_DIAG_DIR", d)
    monkeypatch.setattr(diag, "_DIAG_FILE", d / "ivm_runs.jsonl")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_record_appends_jsonl(diag_dir):
    diag.record("q1", {"a": 1})
    diag.record("q2", {"b": [1, 2]})
    lines = [
        json.loads(ln)
        for ln in (diag_dir / "ivm_runs.jsonl").read_text().splitlines()
    ]
    assert [ln["query"] for ln in lines] == ["q1", "q2"]
    assert lines[0]["a"] == 1 and lines[1]["b"] == [1, 2]
    assert all("ts" in ln for ln in lines)


def test_rotation_never_clobbers_archives(diag_dir, monkeypatch):
    """Each rotation lands on the first FREE sequence suffix — a third
    full log must become .2, not overwrite .1 (the r10-advice fix)."""
    monkeypatch.setattr(diag, "_ROTATE_BYTES", 1)
    diag.record("gen1", {"marker": 1})
    diag.record("gen2", {"marker": 2})   # rotates gen1 -> .1
    diag.record("gen3", {"marker": 3})   # rotates gen2 -> .2, NOT over .1
    arch1 = (diag_dir / "ivm_runs.jsonl.1").read_text()
    arch2 = (diag_dir / "ivm_runs.jsonl.2").read_text()
    live = (diag_dir / "ivm_runs.jsonl").read_text()
    assert '"gen1"' in arch1 and '"gen2"' in arch2 and '"gen3"' in live


def test_record_is_best_effort(monkeypatch):
    """A broken diagnostics path must never raise into the query."""
    monkeypatch.setattr(
        diag, "_DIAG_DIR", Path("/proc/definitely/not/writable")
    )
    monkeypatch.setattr(
        diag, "_DIAG_FILE", Path("/proc/definitely/not/writable/x.jsonl")
    )
    diag.record("q", {"a": 1})  # must not raise


def test_frame_fingerprint_order_independent(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y"), (3, None)], "k int, v string")
    b = spark.createDataFrame([(3, None), (1, "x"), (2, "y")], "k int, v string")
    fa = diag.frame_fingerprint(a)
    fb = diag.frame_fingerprint(b.repartition(3))
    assert fa == fb and fa["n"] == 3 and fa["h"] is not None
    # a changed value moves the fingerprint
    c = spark.createDataFrame([(1, "x"), (2, "y"), (4, None)], "k int, v string")
    assert diag.frame_fingerprint(c) != fa
