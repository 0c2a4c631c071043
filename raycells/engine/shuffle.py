"""Shuffle strategy: salting + two-stage aggregation.

Wide operations (groupby over ``cell_id``) are the engine's only
all-to-all exchanges. Two defenses (SURVEY.md §7.5):

1. **Partial aggregation**: combine inside ``map_batches`` first — one
   output row per (key, salt) per batch — so the shuffle moves partials,
   not tiles. At 100 TB the pre-aggregated exchange is ~10^4× smaller
   than shuffling raw tile rows.
2. **Salting**: 60% of tiles land in 3 dense city boxes, so raw
   ``cell_id`` keys are heavily skewed. Partials are keyed by
   ``(cell_id, hash(doc) % SALT)``; the final (small) groupby re-merges
   over ``cell_id``. SALT defaults to 8 — enough to split a hot cell
   across executors without inflating the partial count.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = [
    "partial_cell_agg",
    "merge_cell_agg",
    "salted_cell_aggregate",
    "salted_aggregate",
]

DEFAULT_SALT = 8


def partial_cell_agg(batch: pa.Table, key: str = "cell_id", salt: int = DEFAULT_SALT) -> pa.Table:
    """Per-batch combiner: one row per (key, salt-bucket) with partial
    sums/counts/min/max. Runs inside map_batches BEFORE the shuffle."""
    if "doc_id" in batch.column_names:
        salt_col = (
            pd.util.hash_array(batch["doc_id"].to_numpy(zero_copy_only=False)) % salt
        )
    else:
        salt_col = 0
    df = pd.DataFrame(
        {
            "key": batch[key].to_numpy(zero_copy_only=False),
            "salt": salt_col,
            "mean_val": batch["mean_val"].to_numpy(zero_copy_only=False),
            "valid_count": batch["valid_count"].to_numpy(zero_copy_only=False),
            "nodata_count": batch["nodata_count"].to_numpy(zero_copy_only=False),
            "min_val": batch["min_val"].to_numpy(zero_copy_only=False),
            "max_val": batch["max_val"].to_numpy(zero_copy_only=False),
        }
    )
    g = df.groupby(["key", "salt"], sort=False)
    out = g.agg(
        n_tiles=("mean_val", "size"),
        sum_mean=("mean_val", "sum"),
        valid_count=("valid_count", "sum"),
        nodata_count=("nodata_count", "sum"),
        min_val=("min_val", "min"),
        max_val=("max_val", "max"),
    ).reset_index()
    return pa.Table.from_pandas(out, preserve_index=False)


def merge_cell_agg(ds, key: str = "key", key_out: str = "cell_id"):
    """Final merge over the (already tiny) partials: groupby(cell) summing
    partial sums. Returns a Dataset of per-cell aggregates."""
    from ray.data.aggregate import Count, Max, Min, Sum

    merged = ds.groupby(key).aggregate(
        Sum("n_tiles", alias_name="n_tiles"),
        Sum("sum_mean", alias_name="sum_mean"),
        Sum("valid_count", alias_name="valid_count"),
        Sum("nodata_count", alias_name="nodata_count"),
        Min("min_val", alias_name="min_val"),
        Max("max_val", alias_name="max_val"),
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = t["n_tiles"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = t["sum_mean"].to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            avg = s / n
        t = t.append_column("avg_tile_mean", pa.array(avg))
        t = t.drop_columns(["sum_mean"])
        if key in t.column_names and key != key_out:
            t = t.rename_columns(
                [key_out if c == key else c for c in t.column_names]
            )
        return t

    return merged.map_batches(finalize, batch_format="pyarrow")


def salted_aggregate(
    ds,
    key: str,
    sums: Sequence[str] = (),
    mins: Sequence[str] = (),
    maxs: Sequence[str] = (),
    count_alias: str = "n_rows",
    salt: int = DEFAULT_SALT,
    salt_col: str = "doc_id",
):
    """Generic two-stage salted aggregate: map-side partials on
    (key, hash(salt_col) % salt) → shuffle the partials → final merge per
    key. Column names survive verbatim (oracle parity); the count column
    is named ``count_alias``."""
    from ray.data.aggregate import Max, Min, Sum

    sums, mins, maxs = list(sums), list(mins), list(maxs)

    def partial(batch: pa.Table) -> pa.Table:
        cols = {"key": batch[key].to_numpy(zero_copy_only=False)}
        if salt_col in batch.column_names and salt > 1:
            cols["salt"] = (
                pd.util.hash_array(
                    np.asarray(batch[salt_col].to_numpy(zero_copy_only=False))
                )
                % salt
            )
        else:
            cols["salt"] = np.zeros(batch.num_rows, dtype=np.int64)
        for c in set(sums + mins + maxs):
            cols[c] = batch[c].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(cols)
        spec = {count_alias: ("key", "size")}
        for c in sums:
            spec[f"sum_{c}"] = (c, "sum")
        for c in mins:
            spec[f"min_{c}"] = (c, "min")
        for c in maxs:
            spec[f"max_{c}"] = (c, "max")
        out = df.groupby(["key", "salt"], sort=False).agg(**spec).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    aggs = [Sum(count_alias, alias_name=count_alias)]
    aggs += [Sum(f"sum_{c}", alias_name=f"sum_{c}") for c in sums]
    aggs += [Min(f"min_{c}", alias_name=f"min_{c}") for c in mins]
    aggs += [Max(f"max_{c}", alias_name=f"max_{c}") for c in maxs]
    merged = partials.groupby("key").aggregate(*aggs)

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns([key if c == "key" else c for c in t.column_names])

    return merged.map_batches(rename, batch_format="pyarrow")


def salted_cell_aggregate(ds, key: str = "cell_id", salt: int = DEFAULT_SALT):
    """The standard two-stage pattern: map-side partials on (key, salt) →
    shuffle on the partials → final merge per key."""
    partials = ds.map_batches(
        lambda b: partial_cell_agg(b, key=key, salt=salt), batch_format="pyarrow"
    )
    return merge_cell_agg(partials, key="key", key_out=key)
