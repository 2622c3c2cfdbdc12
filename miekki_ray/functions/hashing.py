"""Vectorized 64-bit hashing kernels — the numeric core of the sketcher.

This is the graft's rendering of the reference's k-mer MinHash sketching
[spec BASELINE.json:6]: "per-conversation k-shingle MinHash signatures
computed in map_batches over zero-copy Arrow batches (vectorized 64-bit
multiply-shift hashing in NumPy inside an actor pool)".

All arithmetic is uint64 with wraparound (mod 2^64) semantics — NumPy array
ops on uint64 wrap natively; we pin that behavior with explicit dtypes and an
errstate guard, and tests assert wraparound explicitly (SURVEY.md §7 hard
part 4).

Design notes
------------
- Shingles are character k-grams of the (utf-8 encoded) joined document,
  hashed with an O(n) polynomial rolling hash (prefix-sum + modular-inverse
  trick so the whole doc is one vectorized pass, no Python loop over
  positions), then whitened with a splitmix64 finalizer.
- MinHash uses the multiply-shift family h_s(x) = (a_s * x + b_s) mod 2^64
  with odd a_s — a bijection on Z_2^64, so min over it is a valid minwise
  hash.  Signatures for a whole batch of docs are computed with ONE
  np.minimum.reduceat over the concatenated shingle-hash array per slot
  chunk — no per-doc Python loop.
- All parameters derive from DedupConfig.seed via numpy default_rng, so the
  sketch is deterministic across runs/processes (SURVEY.md §4.2).
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
_MASK64 = (1 << 64) - 1

# odd base for the polynomial rolling hash (fixed; tied to splitmix64's
# golden-ratio constant, but any odd constant works)
_POLY_BASE = np.uint64(0x9E3779B97F4A7C15)
# modular inverse of _POLY_BASE mod 2^64 (exists because the base is odd)
_POLY_BASE_INV = np.uint64(pow(0x9E3779B97F4A7C15, -1, 1 << 64))


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — a public-domain 64-bit mixer."""
    with np.errstate(over="ignore"):
        x = np.asarray(x, dtype=U64).copy()
        x ^= x >> U64(30)
        x *= U64(0xBF58476D1CE4E5B9)
        x ^= x >> U64(27)
        x *= U64(0x94D049BB133111EB)
        x ^= x >> U64(31)
    return x


def arrow_str_hash64(col, seed: int = 0) -> np.ndarray:
    """Vectorized 64-bit hash of an Arrow string column, computed directly
    on the Arrow offsets/data buffers — NO Python-string round trip (the
    r4 pair-distinct tag went Arrow→pandas→object-concat→siphash; this is
    the zero-object replacement, VERDICT r4 Next #6). Per row: polynomial
    hash of the utf-8 bytes (odd base, uint64 wraparound) + a length term,
    finished with splitmix64. Quality is partitioning/bucketing grade —
    use for _part tags and bucket keys, not for content equality (exact
    dedup keeps doc_hash; pair distinct still groups on the strings)."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.type != pa.large_string():
        col = col.cast(pa.large_string())   # uniform int64 offsets
    n = len(col)
    if n == 0:
        return np.empty(0, dtype=U64)
    off = np.frombuffer(col.buffers()[1], dtype=np.int64,
                        count=n + 1 + col.offset)[col.offset:]
    starts, ends = off[:-1], off[1:]
    lens = ends - starts
    base_h = np.zeros(n, dtype=U64)
    total = int(off[-1] - off[0])
    if total:
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        seg = data[off[0]:off[-1]].astype(U64)
        # byte position within its row, vectorized
        pos = (np.arange(total, dtype=np.int64)
               - np.repeat(starts - off[0], lens))
        pows = np.ones(int(lens.max()), dtype=U64)
        if pows.size > 1:
            with np.errstate(over="ignore"):
                pows[1:] = np.cumprod(
                    np.full(pows.size - 1, _POLY_BASE, dtype=U64))
        with np.errstate(over="ignore"):
            contrib = seg * pows[pos]
        nonempty = lens > 0
        # reduceat over nonempty row starts only: empty rows occupy zero
        # bytes, so consecutive nonempty starts bound exactly one row each
        base_h[nonempty] = np.add.reduceat(
            contrib, (starts - off[0])[nonempty])
    with np.errstate(over="ignore"):
        return splitmix64(base_h
                          + lens.astype(U64) * U64(0x94D049BB133111EB)
                          + U64(seed))


def hash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) multiply-shift parameters: a odd, shape (num_perm,) each.

    Deterministic from seed — the sketcher actor builds these once in
    __init__ (stateful stage ST1, SURVEY.md §2.3)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(0, _MASK64, size=num_perm, dtype=U64, endpoint=True) | U64(1)
    b = rng.integers(0, _MASK64, size=num_perm, dtype=U64, endpoint=True)
    return a, b


def shingle_hashes(data: bytes, k: int) -> np.ndarray:
    """Unique uint64 hashes of all character k-grams (over utf-8 bytes) of
    ``data``. Returns at least one hash (hash of the whole doc) so empty /
    short docs still sketch."""
    return np.unique(shingle_hashes_ordered(data, k))


def iter_ordered_kgram_slices(col, k: int):
    """THE shared Arrow-buffer chunk-walk (r4: shingle_sets_from_arrow and
    textstats.winnow_sets_from_arrow carried verbatim copies that had
    already drifted on the null-data-buffer guard): yield one
    POSITION-ORDERED k-gram hash array per doc of an Arrow string column,
    computed with no Python-string materialization and no per-doc kernel
    launches. The polynomial window hash h[i] depends only on bytes
    i..i+k-1, so the batch pass yields bit-identical hashes to per-doc
    passes; windows crossing doc boundaries are simply never sliced.

    Doc-aligned CHUNKS of ~64 KB: one rolling pass per chunk keeps the
    ~5 temporaries L2-resident (a single whole-buffer pass streams MBs
    through DRAM and measures 2x SLOWER). A sub-k doc's degenerate
    whole-doc hash can't come from the chunk pass (its windows cross doc
    boundaries) — the per-doc fallback on < k bytes is O(k)."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return
    off_dtype = (np.int64 if pa.types.is_large_string(col.type)
                 else np.int32)
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[
        col.offset:col.offset + n + 1].astype(np.int64)
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.empty(0, dtype=np.uint8))
    CHUNK = 64 * 1024
    i = 0
    while i < n:
        j = i + 1
        while j < n and offs[j + 1] - offs[i] <= CHUNK:
            j += 1
        cs, ce = offs[i], offs[j]
        big = (shingle_hashes_ordered(data[cs:ce].tobytes(), k)
               if ce - cs >= k else np.empty(0, dtype=U64))
        for d in range(i, j):
            s, e = offs[d] - cs, offs[d + 1] - cs
            if e - s >= k:
                yield big[s:e - k + 1]
            else:
                yield shingle_hashes_ordered(
                    data[cs + s:cs + e].tobytes(), k)
        i = j


def shingle_sets_from_arrow(col, k: int,
                            prefix_bytes: int | None = None
                            ) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """Per-doc UNIQUE shingle-hash sets for a whole Arrow string column in
    ONE rolling-hash pass over the column's shared data buffer
    (iter_ordered_kgram_slices above).

    Returns (sets, prefix_sets): per-doc unique hash arrays, and (when
    prefix_bytes is set) the unique hashes of each doc's FIRST
    prefix_bytes — a zero-cost sub-slice of the same ordered slice (the
    old path re-hashed every long doc's prefix). A doc's byte length is
    len(slice) + k - 1 (the degenerate sub-k slice has length 1, i.e.
    "length k" here — below every valid prefix_bytes, so it reuses h
    exactly as the pre-refactor code did)."""
    sets: list[np.ndarray] = []
    psets: list[np.ndarray] = []
    want_prefix = prefix_bytes is not None
    for sl in iter_ordered_kgram_slices(col, k):
        h = np.unique(sl)
        sets.append(h)
        if want_prefix:
            if sl.size + k - 1 <= prefix_bytes:
                psets.append(h)
            else:
                # max(...) guards prefix_bytes < k (validated away in
                # DedupConfig, kept as defense): an empty slice here
                # would violate minhash_from_concat's >=1-shingle
                # precondition and corrupt the next doc's psig
                psets.append(np.unique(
                    sl[:max(prefix_bytes - k + 1, 1)]))
    return sets, psets


def shingle_hashes_ordered(data: bytes, k: int) -> np.ndarray:
    """POSITION-ORDERED uint64 hashes of all k-grams — h[i] is the hash of
    the window starting at byte i (winnowing needs positions; MinHash
    does not and uses the unique-sorted wrapper above).

    O(n) vectorized rolling polynomial hash:
      h[i] = sum_{j<k} c[i+j] * p^(k-1-j)  (mod 2^64)
    computed as p^(i+k-1) * (C[i+k] - C[i]) where C = cumsum(c * p^-i).
    """
    buf = np.frombuffer(data, dtype=np.uint8)
    n = buf.size
    if n < k or n == 0:
        # degenerate doc: single shingle = whitened poly hash of whole buffer
        acc = np.uint64(0)
        with np.errstate(over="ignore"):
            c = buf.astype(U64) + U64(1)
            p_pow = np.multiply.accumulate(
                np.full(max(n, 1), _POLY_BASE, dtype=U64)
            ) if n else np.array([], dtype=U64)
            acc = U64((int((c * p_pow[::-1]).sum()) & _MASK64) if n else 0)
        return splitmix64(np.array([acc], dtype=U64))

    with np.errstate(over="ignore"):
        c = buf.astype(U64) + U64(1)  # +1 so NUL bytes aren't absorbing
        # p^-i for i in [0, n): cumulative product of the inverse base
        pinv = np.empty(n, dtype=U64)
        pinv[0] = U64(1)
        if n > 1:
            np.multiply.accumulate(
                np.full(n - 1, _POLY_BASE_INV, dtype=U64), out=pinv[1:]
            )
        w = c * pinv
        csum = np.empty(n + 1, dtype=U64)
        csum[0] = U64(0)
        np.cumsum(w, out=csum[1:])
        # window sums in the p^-i domain
        d = csum[k:] - csum[:-k]          # length n-k+1, wraps mod 2^64
        # rescale: multiply by p^(i+k-1)
        ppow = np.empty(n - k + 1, dtype=U64)
        ppow[0] = U64(1)
        if n - k > 0:
            np.multiply.accumulate(
                np.full(n - k, _POLY_BASE, dtype=U64), out=ppow[1:]
            )
        pk1 = U64(pow(0x9E3779B97F4A7C15, k - 1, 1 << 64))
        h = d * ppow * pk1
    return splitmix64(h)


def minhash_from_concat(
    concat: np.ndarray,
    offsets: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
    block_hashes: int = 40_000,
) -> np.ndarray:
    """MinHash signatures for a batch of docs in one vectorized pass.

    concat:  all docs' shingle hashes concatenated, shape (M,) uint64
    offsets: start index of each doc's run in concat, shape (n_docs,)
             (every doc MUST have >= 1 shingle — shingle_hashes guarantees it)
    a, b:    multiply-shift params, shape (S,)

    Returns (n_docs, S) uint64. One 1D multiply-add + 1D reduceat per slot:
    the 2D (M, chunk) formulation is ~30x slower (generic strided reduceat
    + hundreds of MB of temporaries); the 1D path stays on numpy's
    contiguous fast path with two M-sized temporaries total.

    CACHE BLOCKING: the S=128 slot passes re-stream the concat array, so a
    whole 1024-doc batch (~20 MB) pays DRAM bandwidth 3x128 times — and at
    32 parallel workers DRAM is the shared bottleneck (the sketch stage
    scaled only 1.85x from 8->32 cpus). Processing doc-aligned blocks of
    ~block_hashes (~320 KB, L2-resident) cuts the kernel 3.6x single-
    threaded (1.12 s -> 0.31 s per 1024-doc batch, identical output) and
    removes most of the DRAM contention under parallelism."""
    n_docs = offsets.size
    S = a.size
    sig = np.empty((n_docs, S), dtype=U64)
    if concat.size == 0:
        return sig
    ends = np.append(offsets[1:], concat.size)
    d0 = 0
    with np.errstate(over="ignore"):
        while d0 < n_docs:
            d1 = d0 + 1
            while d1 < n_docs and ends[d1] - offsets[d0] <= block_hashes:
                d1 += 1
            lo, hi = offsets[d0], ends[d1 - 1]
            sub = concat[lo:hi]
            off = offsets[d0:d1] - lo
            y = np.empty_like(sub)
            for s in range(S):
                np.multiply(sub, a[s], out=y)
                y += b[s]
                sig[d0:d1, s] = np.minimum.reduceat(y, off)
            d0 = d1
    return sig


def band_hashes(sig: np.ndarray, bands: int, rows_per_band: int,
                seed: int) -> np.ndarray:
    """LSH band hashes: (n_docs, S) signatures -> (n_docs, b) uint64.

    Band i's hash combines its r contiguous slots with a seeded splitmix64
    chain, plus a per-band constant so identical slot-values in different
    bands never collide by construction [spec BASELINE.json:6] "LSH band
    hashing"."""
    n, S = sig.shape
    assert bands * rows_per_band == S, (bands, rows_per_band, S)
    rng = np.random.default_rng(seed + 1)
    band_const = rng.integers(0, _MASK64, size=bands, dtype=U64, endpoint=True)
    cube = sig.reshape(n, bands, rows_per_band)
    with np.errstate(over="ignore"):
        h = np.broadcast_to(band_const[None, :], (n, bands)).copy()
        for j in range(rows_per_band):
            h = splitmix64(h ^ cube[:, :, j])
    return h


def doc_hash(texts: list[bytes]) -> np.ndarray:
    """Exact-content hash per doc (uint64) for exact dedup (D1).

    blake2b-8byte per doc: C-speed per call, deterministic, collision
    probability ~2^-64 — fine for keep-first grouping; the keep-first group
    stage can additionally compare lengths."""
    import hashlib

    out = np.empty(len(texts), dtype=U64)
    for i, t in enumerate(texts):
        out[i] = int.from_bytes(
            hashlib.blake2b(t, digest_size=8).digest(), "little"
        )
    return out


def exact_jaccard(h1: np.ndarray, h2: np.ndarray) -> float:
    """Exact Jaccard over two UNIQUE-hash shingle sets (verify stage ST2)."""
    inter = np.intersect1d(h1, h2, assume_unique=True).size
    union = h1.size + h2.size - inter
    return inter / union if union else 1.0


def containment(h1: np.ndarray, h2: np.ndarray) -> float:
    """Shingle containment |A∩B| / min(|A|,|B|) — the ST3 pre-gate."""
    inter = np.intersect1d(h1, h2, assume_unique=True).size
    m = min(h1.size, h2.size)
    return inter / m if m else 1.0
