"""Interleaved text+media document source.

The engine's primary input (BASELINE.json ``input_hint``) is a Lance table

    doc_id: string
    spans:  list<struct<kind: string, text: string, media_ref: string, offset: int32>>

``lance`` is not importable in this environment, so the format adapter
falls back to a directory of Parquet fragments with the identical logical
schema (SURVEY.md preamble). Fragmented layout (``fragment=K.parquet``)
is what makes runs checkpoint-resumable: the checkpoint manifest tracks
completed fragments (engine/checkpoint.py).

Per-row invariant: **span-sequence equality** — the ordered tuple sequence
``(kind, text, media_ref)`` of every document must survive the pipeline
byte-identically. ``span_digests`` computes the per-doc blake2b digest
used to verify it at the sink.
"""

from __future__ import annotations

import hashlib
import os
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from raycells.io.tilestore import REF_PREFIX

WORDS = (
    "the quick brown fox jumps over lazy dog a span of text about rasters "
    "tiles cells masks nodata joins polygons rings levels hilbert curves "
    "streams batches arrows buffers shuffles actors lineage manifests"
).split()

SPANS_TYPE = pa.list_(
    pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
)
DOC_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", SPANS_TYPE)])


def _doc_spans(doc_index: int) -> List[dict]:
    """Deterministic spans for one document (seeded by the doc index alone,
    so any fragmenting of the generation reproduces identical rows)."""
    h = hashlib.blake2b(str(doc_index).encode(), digest_size=16).digest()
    n_spans = 1 + h[0] % 8
    spans = []
    offset = 0
    for j in range(n_spans):
        b = h[(j + 1) % 16]
        is_media = (b % 10) < 3  # ~30% media spans
        if is_media:
            k = doc_index * 16 + j
            # ~20% of media spans point at shared "hot" tiles (dedup fixture)
            seed = (k % 997) if (b % 5 == 0) else k
            spans.append(
                {
                    "kind": "media",
                    "text": "",
                    "media_ref": f"{REF_PREFIX}{seed}",
                    "offset": offset,
                }
            )
            offset += 1
        else:
            nw = 3 + (b % 10)
            words = [WORDS[(doc_index + j * 7 + w * 13) % len(WORDS)] for w in range(nw)]
            text = " ".join(words)
            spans.append(
                {"kind": "text", "text": text, "media_ref": "", "offset": offset}
            )
            offset += len(text) + 1
    return spans


def generate_interleaved_docs(
    out_dir: str, n_docs: int, n_fragments: int = 4, force: bool = False
) -> str:
    """Write the interleaved-document table as Parquet fragments (idempotent:
    skips fragments that already exist unless ``force``)."""
    os.makedirs(out_dir, exist_ok=True)
    per = (n_docs + n_fragments - 1) // n_fragments
    for f in range(n_fragments):
        path = os.path.join(out_dir, f"fragment={f}.parquet")
        if os.path.exists(path) and not force:
            continue
        lo, hi = f * per, min((f + 1) * per, n_docs)
        doc_ids = [f"doc-{i:012d}" for i in range(lo, hi)]
        spans = [_doc_spans(i) for i in range(lo, hi)]
        tbl = pa.table(
            {"doc_id": doc_ids, "spans": pa.array(spans, type=SPANS_TYPE)},
            schema=DOC_SCHEMA,
        )
        tmp = path + ".tmp"
        # many row groups per fragment so pruned reads (read_documents_media)
        # can split work finer than the fragment count
        pq.write_table(tbl, tmp, row_group_size=max(1024, (hi - lo) // 16))
        os.replace(tmp, path)  # atomic publish
    return out_dir


def read_documents(path: str, **kwargs):
    """Documents directory/file → ray Dataset (Lance when importable, else
    the Parquet-fragment adapter with the identical logical schema)."""
    import ray.data as rd

    try:  # pragma: no cover - lance absent in this sandbox
        import lance  # noqa: F401

        return rd.read_lance(path, **kwargs)
    except ImportError:
        return rd.read_parquet(path, **kwargs)


def read_documents_media(
    path: str, span_fields=("kind", "media_ref"), num_blocks: int = None
):
    """Projection-pushdown document read for pipelines that never touch
    span TEXT (the flagship media path): only ``doc_id`` and the
    requested span subfields are read from the Parquet leaves, so the
    text payload — which dominates the table at scale — never leaves
    storage. Span *elements* are all kept (only subfields are pruned),
    so ``span_idx`` positions and the per-doc span order are unchanged.

    Planning is row-group-granular but task count stays PINNED: row
    groups are coalesced into ≈``num_blocks`` contiguous ranges (driver
    task overhead must not grow with input size — CLAUDE.md). With
    ``lance`` installed this becomes a plain column projection on
    ``read_lance``."""
    import glob as _glob

    import ray.data as rd

    if num_blocks is None:
        import ray

        num_blocks = 2 * int(ray.cluster_resources().get("CPU", 8))
    if path.endswith(".parquet"):  # single fragment (the resumable driver)
        files = [path]
    else:
        files = sorted(_glob.glob(os.path.join(path, "*.parquet")))
    rgs = []  # (path, row_group)
    for fp in files:
        rgs.extend((fp, rg) for rg in range(pq.ParquetFile(fp).metadata.num_row_groups))
    n_chunks = max(1, min(num_blocks, len(rgs)))
    bounds = np.linspace(0, len(rgs), n_chunks + 1).astype(int)
    items = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        if hi > lo:
            chunk = rgs[lo:hi]
            items.append(
                {
                    "paths": "\x1f".join(p for p, _ in chunk),
                    "groups": "\x1f".join(str(g) for _, g in chunk),
                }
            )
    leafs = ["doc_id"] + [f"spans.list.element.{f}" for f in span_fields]

    def load(batch: pa.Table) -> pa.Table:
        tables = []
        for paths, groups in zip(
            batch["paths"].to_pylist(), batch["groups"].to_pylist()
        ):
            by_file: dict = {}
            for p, g in zip(paths.split("\x1f"), groups.split("\x1f")):
                by_file.setdefault(p, []).append(int(g))
            for p, gs in by_file.items():
                tables.append(pq.ParquetFile(p).read_row_groups(gs, columns=leafs))
        return pa.concat_tables(tables)

    ds = rd.from_items(items, override_num_blocks=len(items))
    return ds.map_batches(load, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# span utilities (vectorized over Arrow list<struct> columns)
# ---------------------------------------------------------------------------

def _spans_parts(spans: pa.ChunkedArray):
    """Flatten a spans column → (parent_indices, kind, text, media_ref, offset)."""
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    flat = spans.flatten()
    return (
        parent,
        flat.field("kind"),
        flat.field("text"),
        flat.field("media_ref"),
        flat.field("offset"),
    )


def spans_text_concat(spans) -> pa.Array:
    """Per-doc concatenation of the TEXT spans (space-joined, span
    order preserved) — the flat text view the dedup/text-analysis
    operators take over the interleaved table. Pure Arrow kernels:
    filter kind=='text', rebuild per-doc list offsets by searchsorted
    over the (sorted) parent indices, one ``binary_join``."""
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    n = len(spans)
    parent, kind, text, _, _ = _spans_parts(spans)
    mask = pc.equal(kind, "text")
    p_t = parent[mask.to_numpy(zero_copy_only=False)]
    t_t = text.filter(mask)
    offsets = np.searchsorted(p_t, np.arange(n + 1)).astype(np.int32)
    la = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), t_t)
    return pc.binary_join(la, " ")


def span_digests(batch: pa.Table) -> pa.Table:
    """Per-doc blake2b digest over the ordered (kind, text, media_ref)
    sequence — the span-sequence-equality invariant snapshot."""
    parent, kind, text, ref, _ = _spans_parts(batch["spans"])
    # one bytes blob per span, vectorized join via Arrow
    blobs = pc.binary_join_element_wise(kind, text, ref, "\x1f")
    blobs = blobs.to_pylist()
    n = batch.num_rows
    digests = []
    start = 0
    counts = np.bincount(parent, minlength=n)
    for d in range(n):
        h = hashlib.blake2b(digest_size=16)
        for j in range(start, start + counts[d]):
            h.update(blobs[j].encode())
            h.update(b"\x1e")
        digests.append(h.hexdigest())
        start += counts[d]
    return pa.table(
        {"doc_id": batch["doc_id"], "span_digest": pa.array(digests, pa.string())}
    )


def span_digest_xor_partial(batch: pa.Table) -> pa.Table:
    """Map-side combine of the lineage digest: ONE row per batch holding
    the XOR of every per-doc span digest in it (128-bit, split into two
    int64 bit-pattern halves — CLAUDE.md: uint64 > 2^63 can't ride Arrow
    int64 directly) plus the doc count. XOR is associative and
    commutative, so the driver folds O(blocks) partials into the same
    fragment digest the per-doc fold produced."""
    t = span_digests(batch)
    xor = 0
    for d in t["span_digest"].to_pylist():
        xor ^= int(d, 16)
    hi = np.array([(xor >> 64) & 0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
    lo = np.array([xor & 0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
    return pa.table(
        {
            "n_docs": pa.array([batch.num_rows], pa.int64()),
            "xor_hi": pa.array(hi.view(np.int64)),
            "xor_lo": pa.array(lo.view(np.int64)),
        }
    )


def span_digests_md5(batch: pa.Table) -> pa.Table:
    """Per-doc MD5 digest over the ordered span sequence, with a DuckDB
    mirror: md5(string_agg(kind || chr(31) || text || chr(31) || media_ref,
    chr(30) ORDER BY span_idx)) — the oracle-checkable form of the
    span-sequence-equality invariant."""
    parent, kind, text, ref, _ = _spans_parts(batch["spans"])
    blobs = pc.binary_join_element_wise(kind, text, ref, "\x1f").to_pylist()
    n = batch.num_rows
    counts = np.bincount(parent, minlength=n)
    digests = []
    start = 0
    for d in range(n):
        joined = "\x1e".join(blobs[start : start + counts[d]])
        digests.append(hashlib.md5(joined.encode()).hexdigest())
        start += counts[d]
    return pa.table(
        {"doc_id": batch["doc_id"], "digest": pa.array(digests, pa.string())}
    )


def explode_media_spans(batch: pa.Table) -> pa.Table:
    """spans list<struct> → one row per media span: (doc_id, span_idx,
    media_ref). Pure Arrow kernels; span order is preserved via span_idx so
    the sequence invariant can be re-verified downstream."""
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent = pc.list_parent_indices(spans)
    flat = spans.flatten()
    # span index within each doc = global flat position − doc's list offset
    parent_np = parent.to_numpy(zero_copy_only=False)
    offsets = np.asarray(spans.offsets)
    span_idx = np.arange(len(parent_np), dtype=np.int32) - offsets[parent_np].astype(
        np.int32
    )
    doc_ids = pc.take(batch["doc_id"], parent)
    tbl = pa.table(
        {
            "doc_id": doc_ids,
            "span_idx": pa.array(span_idx, pa.int32()),
            "media_ref": flat.field("media_ref"),
            "kind": flat.field("kind"),
        }
    )
    tbl = tbl.filter(pc.equal(tbl["kind"], "media"))
    return tbl.drop_columns(["kind"])


# ---------------------------------------------------------------------------
# JSONL document source (training-data interchange format)
# ---------------------------------------------------------------------------

def ensure_documents_jsonl(parquet_path: str, out_dir: str, n_shards: int = 4) -> str:
    """Idempotently mirror a documents parquet table as sharded JSONL
    (one object per line — the common training-data interchange format).
    Sharding is deterministic by row position so re-runs are byte-stable;
    a ``_DONE`` marker skips completed mirrors."""
    import json
    import os

    import pyarrow.parquet as pq

    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(parquet_path)
    cols = {name: t[name].to_pylist() for name in t.column_names}
    n = t.num_rows
    for s in range(n_shards):
        with open(os.path.join(out_dir, f"part-{s:03d}.jsonl"), "w") as f:
            for i in range(s, n, n_shards):
                f.write(
                    json.dumps(
                        {k: cols[k][i] for k in t.column_names},
                        ensure_ascii=False,
                        sort_keys=True,
                    )
                )
                f.write("\n")
    with open(done, "w") as f:
        f.write("ok")
    return out_dir


def ensure_documents_csv(parquet_path: str, out_dir: str, n_shards: int = 4) -> str:
    """Idempotently mirror a documents parquet table as sharded CSV
    (header per shard, stdlib quoting — the lowest-common-denominator
    interchange format). Same deterministic row-position sharding and
    ``_DONE`` idempotence as the JSONL mirror."""
    import csv
    import os

    import pyarrow.parquet as pq

    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(parquet_path)
    names = t.column_names
    cols = {name: t[name].to_pylist() for name in names}
    n = t.num_rows
    for s in range(n_shards):
        with open(
            os.path.join(out_dir, f"part-{s:03d}.csv"), "w", newline=""
        ) as f:
            w = csv.writer(f)
            w.writerow(names)
            for i in range(s, n, n_shards):
                w.writerow([cols[k][i] for k in names])
    with open(done, "w") as f:
        f.write("ok")
    return out_dir


def read_documents_csv(csv_dir: str, num_blocks: int = None):
    """Documents from sharded CSV via ``ray.data.read_csv`` — the same
    downstream schema as the parquet read (int columns re-pinned to
    int64; the Arrow CSV reader infers per shard), block count pinned
    like every other small-table read."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    kw = {"override_num_blocks": num_blocks} if num_blocks else {}
    ds = rd.read_csv(csv_dir, file_extensions=["csv"], **kw)

    def normalize(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "text": b["text"],
                "lang": b["lang"],
                "source": b["source"],
                "n_chars": pc.cast(b["n_chars"], pa.int64()),
            }
        )

    return ds.map_batches(normalize, batch_format="pyarrow")


def read_documents_jsonl(jsonl_dir: str, num_blocks: int = None):
    """Documents from sharded JSONL via ``ray.data.read_json`` — the same
    downstream schema as the parquet read, so every text operator works
    unchanged on either source. Casts int columns back to int64
    (read_json may widen/narrow per shard) and pins the block count like
    the parquet reads (per-task driver overhead must not grow with
    shard count)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    kw = {"override_num_blocks": num_blocks} if num_blocks else {}
    ds = rd.read_json(jsonl_dir, file_extensions=["jsonl"], **kw)

    def normalize(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "text": b["text"],
                "lang": b["lang"],
                "source": b["source"],
                "n_chars": pc.cast(b["n_chars"], pa.int64()),
            }
        )

    return ds.map_batches(normalize, batch_format="pyarrow")
