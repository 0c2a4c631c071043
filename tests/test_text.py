"""Text analysis + dedup operator tests (brute-force oracles, SURVEY.md §5.2)."""

import numpy as np
import pyarrow as pa
import pytest

from raycells.text import analysis as ta
from raycells.text import dedup as dd

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "completely different content here now",
    "",
    "a",
    "the quick brown fox jumps over the lazy dog",  # exact dup of [0]
]
IDS = ["d0", "d1", "d2", "d3", "d4", "d5"]


def _tbl():
    return pa.table({"doc_id": IDS, "text": TEXTS})


# ---------------------------------------------------------------------------
# analysis kernels (pure, no Ray)
# ---------------------------------------------------------------------------

def test_token_counts():
    out = ta.token_counts(_tbl()["text"])
    assert out.tolist() == [9, 9, 5, 0, 1, 9]


def test_word_hits():
    hits = ta.word_hits(_tbl()["text"], "the")
    assert hits.tolist() == [2, 2, 0, 0, 0, 2]


def test_char_metrics():
    m = ta.char_metrics(pa.chunked_array([["ab1 c!"]]))
    assert m["n_chars"][0] == 6
    assert m["n_alpha"][0] == 3
    assert m["n_digit"][0] == 1
    assert m["n_space"][0] == 1
    assert m["n_other"][0] == 1


def test_quality_metrics():
    out = ta.quality_metrics(_tbl())
    ok = out["quality_ok"].to_pylist()
    assert ok[0] and ok[1]          # long, alpha, has stopwords
    assert not ok[2]                # no stopword hits
    assert not ok[3] and not ok[4]  # too short


def test_lang_id_deterministic_ties():
    t = pa.table({"doc_id": ["x"], "text": ["nothing matching markers"]})
    out = ta.lang_id(t)
    assert out["lang_detected"].to_pylist() == ["und"]
    # 'a' is an en marker, 'agg' a de marker — en wins ties by declaration order
    t2 = pa.table({"doc_id": ["y"], "text": ["a agg"]})
    assert ta.lang_id(t2)["lang_detected"].to_pylist() == ["en"]


def test_fingerprint_identity_and_difference():
    fp = ta.fingerprint64(TEXTS)
    assert fp[0] == fp[5]
    assert fp[0] != fp[1]
    assert fp[3] != fp[4]
    # stable across calls
    assert ta.fingerprint64([TEXTS[0]])[0] == fp[0]


# ---------------------------------------------------------------------------
# dedup kernels (pure)
# ---------------------------------------------------------------------------

def test_content_hash_collision_free_here():
    h = dd.content_hash64(TEXTS)
    assert h[0] == h[5]
    assert len(set(h.tolist())) == 5


def test_shingles_and_jaccard():
    a = dd.char_shingles(TEXTS[0], 5)
    b = dd.char_shingles(TEXTS[1], 5)
    c = dd.char_shingles(TEXTS[2], 5)
    assert dd.jaccard(a, a) == 1.0
    assert dd.jaccard(a, b) > 0.6      # one-word difference
    assert dd.jaccard(a, c) < 0.1


def test_minhash_estimates_jaccard():
    mh = dd.MinHasher(256)
    sa = mh.signature(dd.char_shingles(TEXTS[0], 5))
    sb = mh.signature(dd.char_shingles(TEXTS[1], 5))
    est = (sa == sb).mean()
    true = dd.jaccard(dd.char_shingles(TEXTS[0], 5), dd.char_shingles(TEXTS[1], 5))
    assert abs(est - true) < 0.15


def test_simhash_hamming_tracks_similarity():
    sh = dd.simhash64(TEXTS)
    assert sh[0] == sh[5]
    d_near = dd._hamming64(sh[0:1], sh[1:2])[0]
    d_far = dd._hamming64(sh[0:1], sh[2:3])[0]
    assert d_near < d_far


# ---------------------------------------------------------------------------
# distributed pipelines (Ray)
# ---------------------------------------------------------------------------

@pytest.fixture()
def docs_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(_tbl())


def test_exact_dedup_pipeline(docs_ds):
    out = dd.exact_dedup(docs_ds).to_pandas()
    assert len(out) == 5
    # deterministic winner: min doc_id per hash
    assert "d5" not in set(out["doc_id"])
    assert "d0" in set(out["doc_id"])


def test_minhash_near_dup_pipeline(docs_ds):
    pairs = dd.minhash_near_dup_pairs(docs_ds, threshold=0.6).to_pandas()
    got = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert ("d0", "d1") in got or ("d1", "d5") in got  # near-dup found
    assert ("d0", "d5") in got                          # exact dup found
    assert all(a < b for a, b in got)
    # no cross-pairs with the unrelated doc
    assert not any("d2" in p for pair in got for p in pair)


def test_ngram_jaccard_small_fixture(docs_ds):
    pairs = dd.ngram_jaccard_near_dup_pairs(docs_ds, threshold=(4, 5)).to_pandas()
    got = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert ("d0", "d5") in got  # exact dup (J = 1)
    assert all(a < b for a, b in got)
    assert not any("d2" in p for pair in got for p in pair)


def test_ngram_jaccard_exact_recall_sf0001(ray_session):
    """The prefix-filter join is EXACT: its output equals brute-force
    all-pairs Jaccard (integer-threshold form) over the sf0.001 corpus —
    ids AND jaccard values. This is the recall-1.0 guarantee LSH lacks."""
    import pyarrow.parquet as pq
    import ray.data as rd

    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    ids = [str(i) for i in t["doc_id"].to_pylist()]
    texts = t["text"].to_pylist()
    sets = [dd.char_shingles(x, 5) for x in texts]
    num, den = 4, 5
    want = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            i = np.intersect1d(sets[x], sets[y], assume_unique=True).size
            u = sets[x].size + sets[y].size - i
            if den * i >= num * u:
                a, b = sorted((ids[x], ids[y]))
                want[(a, b)] = i / u if u else 1.0
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.string()), "text": t["text"]}))
    out = dd.ngram_jaccard_near_dup_pairs(ds, threshold=(num, den)).to_pandas()
    got = {(a, b): j for a, b, j in zip(out["id_a"], out["id_b"], out["jaccard"])}
    assert got == want and len(want) > 0


def test_simhash_near_dup_pipeline(docs_ds):
    pairs = dd.simhash_near_dup_pairs(docs_ds, max_hamming=3).to_pandas()
    got = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert ("d0", "d5") in got
    assert not any("d2" in p for pair in got for p in pair)


def test_embedding_near_dup_pipeline(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    base = rng.standard_normal((20, 64))
    near = base[0] + 0.01 * rng.standard_normal(64)  # ~cos 1.0 with row 0
    emb = np.vstack([base, near])
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(21), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in emb]),
        }
    )
    pairs = dd.embedding_near_dup_pairs(
        rd.from_arrow(t), threshold=0.95
    ).to_pandas()
    assert (0, 20) in set(zip(pairs["id_a"], pairs["id_b"]))


def test_simhash_chunk_params_pigeonhole():
    """The chunking must guarantee recall for ANY max_hamming: r+1
    chunks cover all 64 bits disjointly, so two hashes within Hamming
    <= r always share an exact chunk — including the old failure mode of
    r=8 with bits spread one-per-16-bit-chunk."""
    for r in (1, 3, 8, 15):
        params = dd.simhash_chunk_params(r)
        assert len(params) == r + 1
        covered = 0
        for shift, mask in params:
            covered |= mask << shift
        assert covered == (1 << 64) - 1
        # adversarial: r differing bits spread as far apart as possible
        bits = [(64 * i) // r for i in range(r)]
        a = np.uint64(0)
        b = np.uint64(0)
        for bit in bits:
            b |= np.uint64(1) << np.uint64(min(bit, 63))
        shared = any(
            (int(a) >> s) & m == (int(b) >> s) & m for s, m in params
        )
        assert shared, f"r={r}: no shared chunk for {int(b):064b}"


def test_simhash_pairs_match_brute_force_at_r8(ray_session):
    """End-to-end exactness at max_hamming=8: pipeline output must equal
    the brute-force all-pairs set (the old 4x16-bit layout lost pairs
    whose 4-8 differing bits spread one-per-chunk)."""
    import ray.data as rd

    base = "the quick brown fox jumps over the lazy dog near a quiet river bank at dawn".split()
    texts = [" ".join(base)]
    rng = np.random.default_rng(7)
    words = ["red", "blue", "tall", "old", "new", "wet", "dry", "hot"]
    for _ in range(40):
        t = list(base)
        for j in rng.choice(len(base), rng.integers(1, 4), replace=False):
            t[j] = words[rng.integers(0, len(words))]
        texts.append(" ".join(t))
    ids = [f"d{i:02d}" for i in range(len(texts))]
    sh = dd.simhash64(texts)
    want = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if bin(int(sh[i]) ^ int(sh[j])).count("1") <= 8:
                want.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    assert len(want) >= 5  # the fixture must actually exercise the range
    assert any(
        bin(int(sh[i]) ^ int(sh[j])).count("1") >= 4
        for i in range(len(texts))
        for j in range(i + 1, len(texts))
        if bin(int(sh[i]) ^ int(sh[j])).count("1") <= 8
    )
    t = pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})
    pairs = dd.simhash_near_dup_pairs(
        rd.from_arrow(t), id_col="doc_id", max_hamming=8
    ).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert got == want


def test_simhash128_pairs_match_brute_force_at_r12(ray_session):
    """Full recall at max_hamming=12 on the 128-bit path (VERDICT r4 #5):
    pipeline output must equal the brute-force all-pairs two-lane
    Hamming set — including pairs whose differing bits spread across
    both lanes and across the lane-straddling chunk."""
    import ray.data as rd

    base = (
        "the quick brown fox jumps over the lazy dog near a quiet river "
        "bank at dawn while tall birds watch from wet stones"
    ).split()
    texts = [" ".join(base)]
    rng = np.random.default_rng(11)
    words = ["red", "blue", "tall", "old", "new", "wet", "dry", "hot", "dim"]
    for _ in range(50):
        t = list(base)
        for j in rng.choice(len(base), rng.integers(1, 5), replace=False):
            t[j] = words[rng.integers(0, len(words))]
        texts.append(" ".join(t))
    ids = [f"d{i:02d}" for i in range(len(texts))]
    sh = dd.simhash128(texts)
    # lane 0 must stay the 64-bit simhash (the narrow path is a prefix)
    np.testing.assert_array_equal(sh[:, 0], dd.simhash64(texts))

    def ham(i, j):
        return (int(sh[i, 0]) ^ int(sh[j, 0])).bit_count() + (
            int(sh[i, 1]) ^ int(sh[j, 1])
        ).bit_count()

    want = {
        (ids[i], ids[j], ham(i, j))
        for i in range(len(texts))
        for j in range(i + 1, len(texts))
        if ham(i, j) <= 12
    }
    assert len(want) >= 5  # the fixture must actually exercise the range
    assert any(h >= 8 for _, _, h in want)  # beyond the 64-bit default r
    t = pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})
    pairs = dd.simhash128_near_dup_pairs(
        rd.from_arrow(t), id_col="doc_id", max_hamming=12
    ).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"], pairs["hamming"]))
    assert got == want


def test_token_hash_cache_eviction():
    """Cache eviction mid-stream must not KeyError on tokens cached
    before the wipe (regression: `missing` was computed pre-clear)."""
    from raycells.text import dedup

    old_max = dedup._TOKEN_HASHES_MAX
    dedup._TOKEN_HASHES.clear()
    try:
        dedup._TOKEN_HASHES_MAX = 4
        dedup._token_hashes(np.asarray(["a", "b", "c"], object))
        out = dedup._token_hashes(np.asarray(["a", "d"], object))
        ref = dedup._token_hashes(np.asarray(["a", "d"], object))
        assert np.array_equal(out, ref)
    finally:
        dedup._TOKEN_HASHES_MAX = old_max
        dedup._TOKEN_HASHES.clear()


def test_regex_token_counts_matches_re_findall():
    """The byte-class run counter must equal re.findall lengths for the
    BPE-ish pattern on arbitrary ASCII rows (incl. empty strings, runs
    at row boundaries, all-space rows, chunked arrays), and the non-ASCII
    fallback must agree with the same regexes."""
    import re

    rng = np.random.default_rng(99)
    alphabet = list("abz019 ,.{}:\"-") + ["  "]
    rows = [
        "".join(rng.choice(alphabet, size=rng.integers(0, 40)))
        for _ in range(300)
    ] + ["", " ", "a", "9", ",", "a9", "9a", "a a", '{"k": 69}', "zz99,,"]
    pats = {
        "tokens": re.compile(r"[a-z]+|[0-9]+|[^a-z0-9 ]"),
        "alpha": re.compile(r"[a-z]+"),
        "digit": re.compile(r"[0-9]+"),
        "punct": re.compile(r"[^a-z0-9 ]"),
    }
    half = len(rows) // 2
    arr = pa.chunked_array([pa.array(rows[:half]), pa.array(rows[half:])])
    got = ta.regex_token_counts(arr)
    for k, pat in pats.items():
        want = [len(pat.findall(s)) for s in rows]
        assert got[k].tolist() == want, k
    # non-ASCII row routes the batch through the re fallback
    got2 = ta.regex_token_counts(pa.chunked_array([pa.array(["héllo 42,", "a9"])]))
    assert got2["tokens"].tolist() == [
        len(pats["tokens"].findall("héllo 42,")),
        len(pats["tokens"].findall("a9")),
    ]


def test_fp_scratch_survives_cancellation_mid_init():
    """Regression (round 5): Ray cancels straggler tasks with an ASYNC
    exception; if one lands between allocating the 'ar' scratch and
    filling it with arange, the worker-persistent cache must NOT keep
    the uninitialized buffer (a poisoned 'ar' made every later
    fingerprint64 call in that worker read heap garbage)."""
    import numpy as np

    from raycells.text import analysis as ta

    saved = dict(ta._FP_SCRATCH)
    try:
        ta._FP_SCRATCH.clear()
        real_arange = np.arange
        calls = {"n": 0}

        def exploding_arange(*a, **k):
            calls["n"] += 1
            if calls["n"] == 1:
                raise KeyboardInterrupt("simulated ray.cancel")
            return real_arange(*a, **k)

        np.arange = exploding_arange
        try:
            try:
                ta._fp_scratch("ar", 100, np.int64)
            except KeyboardInterrupt:
                pass
            # the cache must not hold a half-initialized buffer
            assert "ar" not in ta._FP_SCRATCH
            ar = ta._fp_scratch("ar", 100, np.int64)
        finally:
            np.arange = real_arange
        assert ar.tolist() == list(range(100))
        # and the full hash path is healthy after the simulated kill
        h1 = ta.fingerprint64(["hello world", "x" * 500])
        ta._FP_SCRATCH.clear()
        h2 = ta.fingerprint64(["hello world", "x" * 500])
        assert h1.tolist() == h2.tolist()
    finally:
        ta._FP_SCRATCH.clear()
        ta._FP_SCRATCH.update(saved)


class TestStridedWindowFps:
    def test_matches_fingerprint64_of_substrings(self):
        texts = [
            "the quick brown fox jumps over the lazy dog " * 3,
            "",  # no windows
            "short",  # shorter than W
            "x" * 40,  # exactly one window
            "x" * 47,  # still one window (41..47 start past stride 0 only)
            "x" * 48,  # two windows
            "abcdefgh" * 25,
        ]
        ri, pos, h = ta.strided_window_fps(texts, 40, 8)
        exp = []
        for r, t in enumerate(texts):
            p = 0
            while p + 40 <= len(t):
                exp.append((r, p, int(ta.fingerprint64([t[p : p + 40]])[0])))
                p += 8
        got = list(zip(ri.tolist(), pos.tolist(), (int(x) for x in h)))
        assert got == exp

    def test_empty_and_all_short(self):
        for texts in ([], ["a", "bb", ""]):
            ri, pos, h = ta.strided_window_fps(texts, 40, 8)
            assert len(ri) == len(pos) == len(h) == 0

    def test_identical_windows_hash_equal_across_docs(self):
        a = "PREFIX--" + "shared forty character block here!!!...." + "--SUF"
        b = "OTHER-LEAD-IN---" + "shared forty character block here!!!...." + "Z"
        # plant the shared block at stride-aligned offsets in both docs
        a = a[: 8] + "shared forty character block here!!!....!"
        b = b[: 16] + "shared forty character block here!!!....!"
        ri, pos, h = ta.strided_window_fps([a, b], 40, 8)
        ha = {int(v) for r, v in zip(ri, h) if r == 0}
        hb = {int(v) for r, v in zip(ri, h) if r == 1}
        assert ha & hb  # the planted block collides exactly


class TestDupSpanSemantics:
    """Crafted-fixture pins for the duplicated-substring operators
    (parity tests cover the fixture corpus; these document intent)."""

    def _ds(self, texts, blocks=3):
        import ray.data as rd

        t = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        return rd.from_arrow(t).repartition(blocks)

    def test_planted_shared_block_yields_expected_span(self, ray_session):
        from raycells.text.dedup import dup_span_report

        shared = "0123456789" * 6  # 60 chars, stride-aligned at 0
        a = shared + "A-unique-tail-for-doc-a-000000000000000"
        b = shared + "B-different-tail-goes-here-999999999999"
        out = dup_span_report(self._ds([a, b]), w=40, s=8).to_pandas()
        # windows at p=0,8,16 fit inside the shared 60-char prefix and
        # repeat across both docs; p=24 crosses into the distinct tails
        # (24+40 > 60) — so each doc gets exactly [0, 56) with 3 windows
        assert len(out) == 2
        assert set(out["doc_id"]) == {0, 1}
        assert (out["span_start"] == 0).all()
        assert (out["span_end"] == 16 + 40).all()
        assert (out["n_windows"] == 3).all()

    def test_combined_plan_identical_on_crafted_docs(self, ray_session):
        import pandas as pd

        from raycells.text.dedup import dup_span_report

        texts = ["xy" * 40, "xy" * 40, "unique-" * 12, "xy" * 25 + "zz" * 12]
        direct = dup_span_report(self._ds(texts), combine=False)
        combined = dup_span_report(self._ds(texts), combine=True)
        pd.testing.assert_frame_equal(
            direct.to_pandas().reset_index(drop=True),
            combined.to_pandas().reset_index(drop=True),
        )


def test_shuffle_shards_block_count_invariant(ray_session):
    """The reshard manifest's partials are commutative-associative:
    the folded result is identical at 1, 3 and 8 read blocks."""
    import pandas as pd

    from raycells.pipelines import queries as q

    ref = None
    for nb in (1, 3, 8):
        saved = q.SMALL_TABLE_BLOCKS
        q.SMALL_TABLE_BLOCKS = nb
        try:
            t = q.q_shuffle_shards("/root/testdata/sf0.001").to_pandas()
        finally:
            q.SMALL_TABLE_BLOCKS = saved
        if ref is None:
            ref = t
        else:
            pd.testing.assert_frame_equal(ref, t)


class TestParagraphDedup:
    """Crafted-fixture pins for the C4-style paragraph dedup manifest:
    global first-(doc, idx) occurrence wins, within-doc repeats count as
    removed, tail segments shorter than PARA_W participate."""

    def _sf(self, tmp_path, texts):
        import pyarrow.parquet as pq

        t = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        return str(tmp_path)

    def test_cross_doc_within_doc_and_tail(self, ray_session, tmp_path):
        from raycells.pipelines.queries import q_paragraph_dedup

        w8 = " ".join(f"w{i}" for i in range(8))
        uniq = " ".join(f"u{i}" for i in range(8))
        other = " ".join(f"v{i}" for i in range(8))
        docs = [
            w8 + " " + uniq,            # doc 0: [w8, uniq] — both first
            w8 + " " + other,           # doc 1: [w8 dup, other first]
            other + " " + other,        # doc 2: both segs dup of doc1
            w8 + " tail",               # doc 3: [w8 dup, short tail first]
        ]
        out = (
            q_paragraph_dedup(self._sf(tmp_path, docs))
            .to_pandas()
            .set_index("doc_key")
            .sort_index()
        )
        assert list(out["n_segs"]) == [2, 2, 2, 2]
        assert list(out["n_kept"]) == [2, 1, 0, 1]
        assert list(out["n_removed"]) == [0, 1, 2, 1]
        assert list(out["chars_removed"]) == [
            0, len(w8), 2 * len(other), len(w8),
        ]


def test_leakage_safe_split_never_straddles_near_dup_pairs(ray_session):
    """Every MinHash near-dup pair must land on ONE side of the
    train/val split: both endpoints share a canonical cluster id, and
    the split keys on that id alone. Re-derives the per-doc split with
    the same rule and checks each verified pair agrees."""
    import numpy as np

    from raycells.engine.cc import connected_components
    from raycells.pipelines import queries as q
    from raycells.sim.hll import _hash64

    sf = "/root/testdata/sf0.001"
    # run the query first (exercises the broadcast stage end-to-end)
    out = q.q_leakage_safe_split(sf).to_pandas()
    assert set(out["split"]) <= {"train", "val"}
    assert out["n_docs"].sum() == 500

    pairs = q._minhash_pairs_cached(sf)
    comp = connected_components(pairs, a="id_a", b="id_b")
    canon = dict(zip(comp["node"], comp["root"]))

    def split_of(key: str) -> bool:
        ci = np.array([int(canon.get(key, key))], np.int64)
        return bool(_hash64(ci)[0] % np.uint64(10) == 0)

    for ka, kb in zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()):
        assert split_of(ka) == split_of(kb)


def test_lev1_pairs_mask_property():
    """The prefix+suffix rule must equal true Levenshtein ≤ 1 on random
    short-alphabet pairs (small alphabet maximizes repeated-char and
    transposition traps)."""
    from hypothesis import given, settings, strategies as st

    from raycells.text.analysis import lev1_pairs_mask

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    word = st.text(alphabet="abc", min_size=0, max_size=6)

    @settings(max_examples=300, deadline=None)
    @given(st.lists(st.tuples(word, word), min_size=1, max_size=8))
    def check(pairs):
        import numpy as np

        A = np.array([p[0] for p in pairs], dtype=object)
        B = np.array([p[1] for p in pairs], dtype=object)
        got = lev1_pairs_mask(A, B)
        want = np.array([lev(a, b) <= 1 for a, b in pairs])
        assert (got == want).all(), list(zip(A, B, got, want))

    check()


def test_fuzzy_match_long_tokens(tmp_path):
    """Tokens longer than the 16-char baseline width must widen the
    verify matrices, not raise (the chunk_docs length-cap lesson)."""
    import numpy as np

    from raycells.text.analysis import lev1_pairs_mask

    a = np.array(["x" * 40, "y" * 40], dtype=object)
    b = np.array(["x" * 39 + "z", "y" * 41], dtype=object)
    got = lev1_pairs_mask(a, b, width=41)
    assert got.tolist() == [True, True]
