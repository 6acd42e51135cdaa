"""Self-attributing run diagnostics for driver-environment divergences.

Round 9's driver run recorded hash mismatches for the two IVM contract
queries (v4/s32) that neither the same-HEAD sweep nor three isolated
re-runs could reproduce — rows and schema matched, values differed,
and every output is BIGINT cents, so the divergence has to be an
environmental input (session confs, temp roots, host state), not query
nondeterminism. This module is the instrumentation the round-10 plan
demands: the IVM queries record, per execution, a deterministic
fingerprint of every intermediate state (source lake, view table,
per-refresh stats) plus the environment knobs suspected of varying, to
``diagnostics/ivm_runs.jsonl`` at the repo root. The driver commits
working-tree changes at round close, so a driver-side red run leaves
its own fingerprints behind for the next session to diff against a
local green run — the failing STAGE becomes readable instead of
guessable.

Everything here is best-effort and side-effect-only: a read-only
checkout, a full disk, or a missing directory must never fail the
query that carries the instrumentation.
"""

from __future__ import annotations

import json
import os
import socket
import tempfile
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

#: repo root = parent of the package dir; diagnostics live in-repo so
#: the round-close auto-commit preserves driver-side records
_DIAG_DIR = Path(__file__).resolve().parents[1] / "diagnostics"
_DIAG_FILE = _DIAG_DIR / "ivm_runs.jsonl"
_ROTATE_BYTES = 2 << 20  # keep the artifact reviewable


def frame_fingerprint(df: DataFrame, cols: list[str] | None = None) -> dict:
    """Order-independent deterministic fingerprint of a DataFrame's
    contents: ``{"n": row_count, "h": sum(xxhash64(cols...))}`` in ONE
    job, no driver-side data. Two environments that hold the same
    multiset of rows produce the same fingerprint regardless of
    partitioning, task order, or file layout — so diffing fingerprints
    across runs attributes a divergence to the exact pipeline stage
    where the multisets stop agreeing."""
    cols = cols or df.columns
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        # sum in decimal space: xxhash64 spans the full int64 range and
        # a LongType sum overflows (an error under ANSI, a silent wrap
        # otherwise — either way not the stable fingerprint we want)
        F.sum(
            F.xxhash64(*[F.col(c) for c in cols]).cast("decimal(20,0)")
        ).alias("h"),
    ).collect()[0]
    return {"n": row["n"], "h": None if row["h"] is None else str(row["h"])}


def env_summary(spark: SparkSession) -> dict:
    """The environment inputs a driver run could plausibly vary."""

    def conf(key: str) -> str | None:
        try:
            return spark.conf.get(key, None)
        except Exception:
            return None

    return {
        "host": socket.gethostname(),
        "pid": os.getpid(),
        "tmpdir_env": os.environ.get("TMPDIR"),
        "tempdir": tempfile.gettempdir(),
        "tz_env": os.environ.get("TZ"),
        "cwd": os.getcwd(),
        "session_tz": conf("spark.sql.session.timeZone"),
        "shuffle_partitions": conf("spark.sql.shuffle.partitions"),
        "ansi": conf("spark.sql.ansi.enabled"),
        "local_dir": conf("spark.local.dir"),
        "master": conf("spark.master"),
    }


def record(query: str, payload: dict) -> None:
    """Append one JSON line ``{"query", "ts", **payload}`` to the
    diagnostics log. Best-effort by contract: any failure (read-only
    tree, disk full) is swallowed — instrumentation must never change
    a query's outcome."""
    try:
        _DIAG_DIR.mkdir(parents=True, exist_ok=True)
        if _DIAG_FILE.exists() and _DIAG_FILE.stat().st_size > _ROTATE_BYTES:
            # rotate to the first free sequence suffix — never clobber
            # an existing archive (the archives ARE the driver-side
            # fingerprints the divergence investigation runs on)
            n = 1
            while (_DIAG_DIR / f"ivm_runs.jsonl.{n}").exists():
                n += 1
            _DIAG_FILE.rename(_DIAG_DIR / f"ivm_runs.jsonl.{n}")
        line = json.dumps(
            {"query": query, "ts": round(time.time(), 3), **payload},
            sort_keys=True,
            default=str,
        )
        with open(_DIAG_FILE, "a") as f:
            f.write(line + "\n")
    except Exception:
        pass
