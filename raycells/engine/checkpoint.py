"""Checkpoint / resume / lineage for fragment-partitioned runs.

Layout (SURVEY.md §7.6)::

    out/run=<id>/fragment=<k>/*.parquet      # the fragment's output
    out/run=<id>/manifest/<k>.json           # atomic-rename'd completion record

A manifest entry records the input fragment path, row/tile counts, the
per-fragment span-digest XOR (sequence-equality lineage), and wall time.
``resume`` = list manifests → recompute the pending fragment set → submit
only those. Re-running a completed run is a no-op; killing a run between
fragments and restarting produces a byte-identical output set (tested).
"""

from __future__ import annotations

import glob
import json
import os
import time
from typing import Callable, Dict, List

__all__ = [
    "fragment_paths",
    "pending_fragments",
    "run_fragments",
    "read_manifests",
    "sink_to_parquet",
]


def sink_to_parquet(ds, sink_dir: str) -> dict:
    """Stream a Dataset straight to partitioned parquet under
    ``sink_dir`` and return ``{"sink_dir", "n_rows", "n_files"}``.

    The sink dir is cleared first (``write_parquet`` APPENDS — stale
    uuid-named files from an interrupted run would double-count), the
    rows never concat on the driver, and the row count comes from
    parquet footers, not a second scan. Callers publish their own
    manifest row (atomic rename) AFTER this returns, so a kill between
    write and publish re-runs cleanly."""
    import shutil

    import pyarrow.parquet as pq

    shutil.rmtree(sink_dir, ignore_errors=True)
    os.makedirs(sink_dir, exist_ok=True)
    ds.write_parquet(sink_dir)
    files = sorted(glob.glob(os.path.join(sink_dir, "*.parquet")))
    n_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    return {"sink_dir": sink_dir, "n_rows": int(n_rows), "n_files": len(files)}


def fragment_paths(docs_dir: str) -> List[str]:
    return sorted(glob.glob(os.path.join(docs_dir, "fragment=*.parquet")))


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest")


def read_manifests(out_dir: str) -> Dict[str, dict]:
    """Completed-fragment records, keyed by fragment file name. A
    manifest that fails to parse (crash-corrupted state) is treated as
    absent — its fragment counts as pending and re-runs — so every
    caller shares ONE notion of 'done'."""
    out = {}
    for p in glob.glob(os.path.join(_manifest_dir(out_dir), "*.json")):
        try:
            with open(p) as f:
                m = json.load(f)
            out[m["fragment"]] = m
        except (json.JSONDecodeError, KeyError, OSError):
            continue
    return out


def pending_fragments(docs_dir: str, out_dir: str) -> List[str]:
    done = read_manifests(out_dir)
    return [p for p in fragment_paths(docs_dir) if os.path.basename(p) not in done]


def run_fragments(
    docs_dir: str,
    out_dir: str,
    process: Callable[[str, str], dict],
) -> dict:
    """Run ``process(fragment_path, fragment_out_dir) -> metrics`` for every
    pending fragment; publish a manifest entry per completed fragment via
    atomic rename. Returns run summary (fragments done/skipped, metrics)."""
    os.makedirs(_manifest_dir(out_dir), exist_ok=True)
    completed = read_manifests(out_dir)  # the ONE notion of done
    skipped, done = [], []
    for frag in fragment_paths(docs_dir):
        name = os.path.basename(frag)
        man_path = os.path.join(_manifest_dir(out_dir), name.replace(".parquet", ".json"))
        if name in completed:
            skipped.append(name)
            continue
        frag_out = os.path.join(out_dir, f"fragment={name.split('=')[1].split('.')[0]}")
        t0 = time.perf_counter()
        metrics = process(frag, frag_out)
        entry = {
            "fragment": name,
            "input": frag,
            "output": frag_out,
            "wall_sec": round(time.perf_counter() - t0, 4),
            **(metrics or {}),
        }
        tmp = man_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entry, f)
        os.replace(tmp, man_path)  # atomic publish = completion record
        done.append(name)
    return {"done": done, "skipped": skipped, "manifests": read_manifests(out_dir)}
