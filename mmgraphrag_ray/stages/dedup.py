"""Deduplication operators (exact + near-dup families).

Exact dedup mirrors the reference's content-hash anti-join on insert
(preprocessing.py:107-118, 126-150 via storage.py:223-224 filter_keys): only
the first row per content hash survives.  The reference keeps "whichever was
inserted first"; a distributed run has no insertion order, so we make the
survivor deterministic: the row with the smallest `order_by` tuple.
(The reference has no near-dedup — SURVEY §2.8; the families below are the
training-data-pipeline extensions this engine adds as first-class operators.)

Near-dup families, all deterministic and shuffle-structured for scale:

- MinHash + LSH: word-shingle -> 128 minhash perms -> 16 bands x 8 rows ->
  groupby(band_id, band_hash) -> candidate pairs -> exact Jaccard verify ->
  connected components by iterative min-label propagation (groupby rounds).
- SimHash: 64-bit sign-of-weighted-token-hash fingerprint; candidates bucket
  by 16-bit chunks (Hamming <= 3 guarantees a shared chunk), verified by
  exact Hamming distance.
- Embedding near-dup: random-hyperplane LSH bucket (shared prefix) ->
  within-bucket exact cosine verify.

Scale notes: each batch is pre-reduced locally first (the combiner pattern),
shuffles move short keys/signatures rather than payloads, and pairwise work
only ever happens inside a candidate bucket, never all-pairs.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd
import ray.data


N_BUCKETS = 64


def dedup_exact(
    ds: ray.data.Dataset,
    key: str,
    order_by: list[str],
    n_buckets: int = N_BUCKETS,
) -> ray.data.Dataset:
    """Keep exactly one row per `key`: the one minimizing `order_by`.

    Grouping is by hash bucket (not by raw key) so the final pass is one
    vectorized drop_duplicates per bucket instead of per-key Python overhead;
    equal keys always share a bucket, so the result is identical."""
    import zlib

    def local_first(batch: pd.DataFrame):
        # mergesort = stable; pre-prune duplicates within the batch
        out = batch.sort_values(order_by, kind="mergesort").drop_duplicates(
            subset=[key], keep="first"
        )
        out = out.assign(
            _bucket=out[key].map(lambda s: zlib.crc32(str(s).encode()) % n_buckets)
        )
        # Arrow out: pandas blocks entering the hash shuffle carry unhashable
        # pandas schema metadata, defeating Ray's schema dedup (arrowutil)
        from ..arrowutil import strip_pd_metadata

        return strip_pd_metadata(out) if len(out) else out

    def bucket_first(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.sort_values(order_by, kind="mergesort")
            .drop_duplicates(subset=[key], keep="first")
            .drop(columns=["_bucket"])
        )

    pruned = ds.map_batches(local_first, batch_format="pandas")
    out = pruned.groupby("_bucket").map_groups(bucket_first, batch_format="pandas")
    # coalesce away schema-less empty blocks from empty hash partitions;
    # block count = n_buckets so downstream stages keep full parallelism
    return out.repartition(n_buckets)


# --------------------------------------------------------------- minhash-lsh

_WORD_RE = re.compile(r"[A-Za-z0-9]+")
_MERSENNE = (1 << 61) - 1
_N_PERMS, _N_BANDS, _ROWS_PER_BAND = 128, 16, 8
_rng = np.random.default_rng(42)
_PERM_A = _rng.integers(1, _MERSENNE, _N_PERMS, dtype=np.int64).astype(np.uint64)
_PERM_B = _rng.integers(0, _MERSENNE, _N_PERMS, dtype=np.int64).astype(np.uint64)


def shingle_set(text: str, k: int = 3) -> set:
    """Word k-gram shingles (lowercased)."""
    words = _WORD_RE.findall(text.lower())
    if len(words) < k:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    return np.array(
        [zlib.crc32(s.encode()) for s in shingle_set(text, k)], dtype=np.uint64
    )


def minhash_signature(text: str, k: int = 3) -> np.ndarray:
    """128 minhash values via universal hashing (a*h+b mod 2^61-1)."""
    h = _shingle_hashes(text, k)
    if len(h) == 0:
        return np.zeros(_N_PERMS, dtype=np.uint64)
    vals = (_PERM_A[:, None] * h[None, :] + _PERM_B[:, None]) % _MERSENNE
    return vals.min(axis=1)


def _band_rows(doc_id, sig: np.ndarray):
    out = []
    for b in range(_N_BANDS):
        chunk = sig[b * _ROWS_PER_BAND : (b + 1) * _ROWS_PER_BAND]
        out.append((doc_id, b, hashlib.md5(chunk.tobytes()).hexdigest()[:16]))
    return out


def minhash_candidate_pairs(
    docs_ds, id_col: str = "doc_id", text_col: str = "text", k: int = 3
):
    """documents -> candidate near-dup pairs (id_a < id_b) via LSH banding."""

    def to_bands(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, text in zip(batch[id_col], batch[text_col]):
            rows.extend(_band_rows(doc_id, minhash_signature(text, k)))
        out = pd.DataFrame(rows, columns=["doc_id", "band_id", "band_hash"])
        if len(out) == 0:
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype="object"),
                 "band_id": pd.Series(dtype="int64"),
                 "band_hash": pd.Series(dtype="object")}
            )
        out["bucket"] = out["band_hash"].map(
            lambda s: zlib.crc32(s.encode()) % N_BUCKETS
        ).astype("int32")
        return out

    def pairs_in_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (_b, _h), g in bucket.groupby(["band_id", "band_hash"], sort=False):
            ids = sorted(g["doc_id"].unique())
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    rows.append((ids[i], ids[j]))
        return pd.DataFrame(rows, columns=["id_a", "id_b"]).drop_duplicates()

    bands = docs_ds.map_batches(to_bands, batch_format="pandas")
    pairs = (
        bands.groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .repartition(8)
    )
    # global pair dedup (same pair can surface from several bands)
    return dedup_exact(pairs.map_batches(
        lambda b: b.assign(pair=b["id_a"].astype(str) + "|" + b["id_b"].astype(str))
        if len(b) else b.assign(pair=pd.Series(dtype="object")),
        batch_format="pandas",
    ), key="pair", order_by=["id_a", "id_b"]).drop_columns(["pair"])


def verify_jaccard(pairs_ds, docs_ds, threshold: float,
                   id_col: str = "doc_id", text_col: str = "text", k: int = 3):
    """Exact word-shingle Jaccard for candidate pairs. The text lookup is a
    broadcast of only the CANDIDATE docs' texts (semi-joined), not the corpus."""
    import ray

    pairs_df = pairs_ds.to_pandas()
    needed = set(pairs_df["id_a"]) | set(pairs_df["id_b"])
    texts = (
        docs_ds.map_batches(
            lambda b: b[b[id_col].isin(needed)][[id_col, text_col]],
            batch_format="pandas",
        ).to_pandas()
    )
    lookup_ref = ray.put(dict(zip(texts[id_col], texts[text_col])))
    pairs = ray.data.from_pandas(pairs_df) if len(pairs_df) else pairs_ds

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
        lookup = ray.get(lookup_ref)
        jac = []
        for a, b in zip(batch["id_a"], batch["id_b"]):
            sa, sb = shingle_set(lookup[a], k), shingle_set(lookup[b], k)
            denom = len(sa | sb)
            jac.append(len(sa & sb) / denom if denom else 0.0)
        out = batch.copy()
        out["jaccard"] = jac
        return out

    scored = pairs.map_batches(score, batch_format="pandas")
    return scored.map_batches(
        lambda b: b[b["jaccard"] >= threshold], batch_format="pandas"
    )


def connected_components(pairs_ds, all_ids_ds, id_col: str, max_iters: int = 10):
    """Min-label propagation over verified pairs: every id converges to the
    smallest id in its component (the cluster representative). Each round is
    one bucketed groupby over (label proposals ∪ current labels); iteration
    stops early when no label changes."""
    labels = all_ids_ds.map_batches(
        lambda b: pd.DataFrame({"id": b[id_col], "label": b[id_col]})
        if len(b) else pd.DataFrame({"id": [], "label": []}),
        batch_format="pandas",
    ).materialize()
    pairs = pairs_ds.materialize()
    if pairs.count() == 0:
        return labels

    for _ in range(max_iters):
        lab_df = labels.to_pandas()  # labels table is one row per doc id
        import ray

        lab_ref = ray.put(dict(zip(lab_df["id"], lab_df["label"])))

        def propose(batch: pd.DataFrame) -> pd.DataFrame:
            if len(batch) == 0:
                return pd.DataFrame({"id": [], "label": []})
            lab = ray.get(lab_ref)
            la = batch["id_a"].map(lab)
            lb = batch["id_b"].map(lab)
            lo = np.minimum(la, lb)
            return pd.DataFrame(
                {"id": pd.concat([batch["id_a"], batch["id_b"]]),
                 "label": pd.concat([lo, lo])}
            )

        proposals = pairs.map_batches(propose, batch_format="pandas")
        merged = dedup_exact(
            labels.union(proposals), key="id", order_by=["label"]
        ).materialize()
        changed = not merged.to_pandas().sort_values("id").reset_index(drop=True).equals(
            lab_df.sort_values("id").reset_index(drop=True)
        )
        labels = merged
        if not changed:
            break
    return labels


def dedup_minhash(docs_ds, threshold: float = 0.8,
                  id_col: str = "doc_id", text_col: str = "text", k: int = 3):
    """Full MinHash-LSH near-dedup: returns Dataset(id, label) where label is
    the component representative (min id); label == id -> survivor."""
    docs_ds = docs_ds.materialize()
    pairs = minhash_candidate_pairs(docs_ds, id_col, text_col, k)
    verified = verify_jaccard(pairs, docs_ds, threshold, id_col, text_col, k)
    return connected_components(
        verified.drop_columns(["jaccard"]), docs_ds, id_col
    )


# ------------------------------------------------------------------ simhash

_TOKEN_RE = re.compile(r"[A-Za-z0-9]+")


def simhash64(text: str) -> int:
    """64-bit SimHash over lowercased word tokens (crc32-pair hash)."""
    acc = np.zeros(64, dtype=np.int64)
    for tok in _TOKEN_RE.findall(text.lower()):
        h = (zlib.crc32(tok.encode()) << 32) | zlib.crc32((tok + "#").encode())
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits.astype(bool), 1, -1)
    return int("".join("1" if v > 0 else "0" for v in acc), 2)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def dedup_simhash(docs_ds, max_hamming: int = 3,
                  id_col: str = "doc_id", text_col: str = "text"):
    """SimHash near-dup pairs: 4 x 16-bit chunk bucketing (pigeonhole: any
    pair with Hamming <= 3 shares at least one exact chunk), exact Hamming
    verify inside buckets. Returns Dataset(id_a, id_b, hamming)."""

    def to_chunks(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, text in zip(batch[id_col], batch[text_col]):
            sh = simhash64(text)
            for c in range(4):
                chunk = (sh >> (16 * c)) & 0xFFFF
                rows.append((doc_id, sh, c, chunk))
        out = pd.DataFrame(rows, columns=["doc_id", "simhash", "chunk_id", "chunk_val"])
        if len(out) == 0:
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype="object"), "simhash": pd.Series(dtype="object"),
                 "chunk_id": pd.Series(dtype="int64"), "chunk_val": pd.Series(dtype="int64")}
            )
        out["bucket"] = ((out["chunk_id"] * 65536 + out["chunk_val"]) % N_BUCKETS).astype("int32")
        return out

    def pairs_in_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (_c, _v), g in bucket.groupby(["chunk_id", "chunk_val"], sort=False):
            recs = sorted(set(zip(g["doc_id"], g["simhash"])))
            for i in range(len(recs)):
                for j in range(i + 1, len(recs)):
                    d = hamming64(recs[i][1], recs[j][1])
                    if d <= max_hamming:
                        rows.append((recs[i][0], recs[j][0], d))
        return pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"]).drop_duplicates()

    chunks = docs_ds.map_batches(to_chunks, batch_format="pandas")
    pairs = (
        chunks.groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .repartition(8)
    )
    return dedup_exact(pairs.map_batches(
        lambda b: b.assign(pair=b["id_a"].astype(str) + "|" + b["id_b"].astype(str))
        if len(b) else b.assign(pair=pd.Series(dtype="object")),
        batch_format="pandas",
    ), key="pair", order_by=["id_a", "id_b"]).drop_columns(["pair"])


# ---------------------------------------------------- embedding near-dup

def embedding_near_dup(emb_ds, threshold: float = 0.95,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       n_planes: int = 12):
    """Near-duplicate vectors via random-hyperplane LSH bucketing + exact
    cosine verify within buckets. Deterministic (seeded hyperplanes).
    Returns Dataset(id_a, id_b, cosine)."""
    rng = np.random.default_rng(7)
    planes_list: list[np.ndarray] = []

    def to_buckets(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame(
                {"vec_id": pd.Series(dtype="object"), "sig": pd.Series(dtype="object"),
                 "vec": pd.Series(dtype="object"), "bucket": pd.Series(dtype="int32")}
            )
        vecs = np.array(batch[vec_col].tolist(), dtype=np.float64)
        dim = vecs.shape[1]
        if not planes_list:
            planes_list.append(np.random.default_rng(7).standard_normal((n_planes, dim)))
        planes = planes_list[0]
        signs = (vecs @ planes.T) >= 0
        sigs = ["".join("1" if s else "0" for s in row) for row in signs]
        out = pd.DataFrame(
            {"vec_id": batch[id_col].values, "sig": sigs, "vec": list(vecs)}
        )
        out["bucket"] = out["sig"].map(lambda s: zlib.crc32(s.encode()) % N_BUCKETS).astype("int32")
        return out

    def pairs_in_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _sig, g in bucket.groupby("sig", sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values("vec_id", kind="mergesort")
            mat = np.stack(g["vec"].to_list())
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            mat = mat / norms
            sims = mat @ mat.T
            ids = g["vec_id"].to_list()
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    if sims[i, j] >= threshold:
                        rows.append((ids[i], ids[j], float(sims[i, j])))
        return pd.DataFrame(rows, columns=["id_a", "id_b", "cosine"])

    buckets = emb_ds.map_batches(to_buckets, batch_format="pandas")
    return (
        buckets.groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .repartition(8)
    )
