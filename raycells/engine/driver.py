"""``ray job submit`` entrypoint: checkpoint-resumable flagship runs.

    python -m raycells.engine.driver --docs-dir /tmp/raycells_docs/sf0.01 \
        --out /tmp/raycells_out/run1 [--level 8] [--num-cpus 8]

The input is processed fragment-by-fragment (the Lance/Parquet fragment
layout from io/docsource.py). Per fragment the flagship pipeline writes
partitioned parquet under ``out/fragment=K/`` and publishes a manifest
entry (atomic rename) with row/tile counts, the span-sequence digest
XOR (lineage of the per-row invariant), and per-stage wall time
(SURVEY.md §7.6). Re-running skips completed fragments; killing a run
between fragments and restarting produces a byte-identical output set
(tests/test_engine.py pins this).

The job driver owns the Ray session (guarded init — the graft driver
contract forbids library-level ray.init).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time

from raycells.engine import checkpoint, pipeline as pl
from raycells.engine import shuffle as shuffle_mod


def process_fragment(frag_path: str, frag_out: str, level: int = 8) -> dict:
    """One fragment: flagship per-cell aggregate + span-digest lineage."""
    import ray.data as rd

    from raycells.engine import stages
    from raycells.io import docsource

    t0 = time.perf_counter()
    # scope the pipeline to THIS fragment only; the aggregate pass never
    # touches span text, so it uses the text-pruned read (the lineage
    # digest pass below reads the full spans — it must hash the text)
    ds = docsource.read_documents_media(frag_path)
    ex = pl.explode_stage(ds)

    partials = ex.map_batches(
        lambda b: stages.decode_stats(b, emit="partials", level=level),
        batch_format="pyarrow",
    )
    agg = shuffle_mod.merge_cell_agg(partials, key="key", key_out="cell_id")
    # a kill after write_parquet but before the manifest publish leaves
    # stale uuid-named files behind; write_parquet appends rather than
    # truncates, so the re-run must start from an empty fragment dir or
    # the output double-counts
    import shutil

    shutil.rmtree(frag_out, ignore_errors=True)
    os.makedirs(frag_out, exist_ok=True)
    agg.write_parquet(frag_out)
    pipe_sec = time.perf_counter() - t0
    exec_stats = agg.stats()  # per-fragment Ray Data execution profile

    # lineage: per-fragment XOR of span-sequence digests (order-free,
    # verifiable against the source at any later point). XOR is
    # associative, so the digests combine MAP-SIDE (one partial row per
    # batch) and the driver folds O(blocks), never O(docs).
    parts = (
        rd.read_parquet(frag_path)
        .map_batches(docsource.span_digest_xor_partial, batch_format="pyarrow")
        .to_pandas()
    )
    mask = 0xFFFFFFFFFFFFFFFF
    xor = 0
    for hi, lo in zip(parts["xor_hi"], parts["xor_lo"]):
        xor ^= ((int(hi) & mask) << 64) | (int(lo) & mask)
    n_docs_in = int(parts["n_docs"].sum())
    # tile count = Σ n_tiles over the per-cell aggregate just written —
    # summing the few-thousand-row output parquet is free, where
    # ``ex.count()`` re-executed the whole read+explode a third time
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    n_tiles = pc.sum(
        pq.read_table(frag_out, columns=["n_tiles"])["n_tiles"]
    ).as_py() or 0
    return {
        "rows_in": n_docs_in,
        "tiles": int(n_tiles),
        "span_digest_xor": f"{xor:032x}",
        "pipeline_sec": round(pipe_sec, 3),
        # per-partition metrics (SURVEY.md §4.2): the fragment's Ray Data
        # execution profile rides in its manifest for later inspection
        "dataset_stats": exec_stats[:8192],
    }


def run_dedup_job(docs_dir: str, out_dir: str, threshold: float = 0.5) -> dict:
    """Streamed near-dup pair extraction over the WHOLE corpus (dedup is
    global — fragments can't pair independently): MinHash+LSH verified
    pairs write straight to ``out/pairs/*.parquet`` (dedup.py sink mode
    — the pair table never needs one heap, VERDICT r3 #9) and ONE
    manifest row publishes the job's completion + counts via atomic
    rename. Re-running with the manifest present is a no-op."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from raycells.io import docsource
    from raycells.io.docsource import spans_text_concat
    from raycells.text import dedup as dd

    man_path = os.path.join(out_dir, "manifest", "dedup_pairs.json")
    sink_dir = os.path.join(out_dir, "pairs")
    if os.path.exists(man_path):
        try:
            with open(man_path) as f:
                entry = json.load(f)
        except ValueError:
            entry = None  # torn manifest → recompute
        if entry is not None:
            # the manifest alone is not proof the sink survived: verify
            # the pair parquet file count still matches before skipping
            # (a deleted/partially-lost sink would otherwise report
            # skipped with stale counts forever — ADVICE r4)
            n_on_disk = len(glob.glob(os.path.join(sink_dir, "*.parquet")))
            if n_on_disk == entry.get("n_files"):
                return {"done": [], "skipped": ["dedup_pairs"], "manifest": entry}
    os.makedirs(os.path.dirname(man_path), exist_ok=True)
    t0 = time.perf_counter()
    docs = docsource.read_documents(docs_dir).map_batches(
        lambda b: pa.table(
            {
                "doc_key": pc.cast(b["doc_id"], pa.string()),
                "text": spans_text_concat(b["spans"]),
            }
        ),
        batch_format="pyarrow",
    )
    summary = dd.minhash_near_dup_pairs(
        docs, col="text", id_col="doc_key", threshold=threshold,
        sink_dir=sink_dir,
    )
    entry = {
        "job": "dedup_pairs",
        "input": docs_dir,
        "threshold": threshold,
        "wall_sec": round(time.perf_counter() - t0, 4),
        **summary,
    }
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(entry, f)
    os.replace(tmp, man_path)  # atomic publish = completion record
    return {"done": ["dedup_pairs"], "skipped": [], "manifest": entry}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--level", type=int, default=8)
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument(
        "--mode", choices=["flagship", "dedup"], default="flagship",
        help="flagship = per-fragment cell aggregate; dedup = whole-corpus "
             "near-dup pair sink (out/pairs/*.parquet + one manifest row)",
    )
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    if args.mode == "dedup":
        summary = run_dedup_job(args.docs_dir, args.out)
        print(
            json.dumps(
                {
                    "done": summary["done"],
                    "skipped": summary["skipped"],
                    "n_pairs": summary["manifest"].get("n_pairs"),
                    "n_files": summary["manifest"].get("n_files"),
                }
            )
        )
    else:
        summary = checkpoint.run_fragments(
            args.docs_dir,
            args.out,
            lambda frag, out: process_fragment(frag, out, level=args.level),
        )
        print(
            json.dumps(
                {
                    "done": summary["done"],
                    "skipped": summary["skipped"],
                    "fragments": len(summary["manifests"]),
                }
            )
        )
    ray.shutdown()


if __name__ == "__main__":
    main()
