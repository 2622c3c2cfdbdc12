"""Text-analysis kernels for large-scale training-data pipelines:
language-ID (stopword-profile heuristic), quality scoring, token counting,
and document fingerprinting (rolling hash). All vectorized/pandas-string
based; compiled patterns live at module scope (built once per worker
process).

Character classes are pinned to EXPLICIT ASCII sets so the Python kernels
and their DuckDB (RE2) oracles in __ray_entry__.oracle_sql agree byte-for-
byte: Python's \\s and \\w are Unicode-aware while RE2's are ASCII, and
DuckDB trim() strips only spaces — texts containing NBSP or other Unicode
whitespace would otherwise hash-mismatch.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# explicit ASCII whitespace in the negated class — Python's \s is
# Unicode-aware (NBSP etc.) and would diverge from any RE2 restatement
# of this pattern (module-docstring contract, r4 review)
_TOKEN_RE = re.compile(r"[A-Za-z0-9]+(?:'[a-z]+)?|[^ \t\n\r\f\vA-Za-z0-9]")
# ASCII whitespace only (see module docstring / oracle pairing)
_ASCII_WS = " \t\n\r\f\v"
_WS_RE = re.compile(r"[ \t\n\r\f\v]+")
_WORD_RE = re.compile(r"[a-zA-Z']+")
_LANG_WORD_RE = re.compile(r"[a-zA-Zäöüéèàç']+")

# tiny per-language stopword profiles (public common-word lists) for the
# n-gram/stopword language heuristic — deliberately simple & deterministic
_LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the of and to in a is that it for was on are as with"
                    .split()),
    "de": frozenset("der die das und ist nicht ein eine zu mit von für auf"
                    .split()),
    "fr": frozenset("le la les et est un une de des que pour dans sur pas"
                    .split()),
    "es": frozenset("el la los las y es un una de que para en no con por"
                    .split()),
}
# tie-break order (first profile reaching the max count wins)
_LANG_ORDER = ("en", "de", "fr", "es")


def token_count(texts: pd.Series) -> np.ndarray:
    """Whitespace + BPE-ish regex token count per text."""
    return texts.fillna("").str.count(_TOKEN_RE).to_numpy(dtype=np.int64)


def whitespace_token_count(texts: pd.Series) -> np.ndarray:
    """ASCII-whitespace-delimited token count (oracle: DuckDB
    string_split_regex with the same class after the same trim)."""
    t = texts.fillna("").str.strip(_ASCII_WS)
    n = t.str.count(_WS_RE).to_numpy(dtype=np.int64) + 1
    n[t.str.len().to_numpy() == 0] = 0
    return n


def quality_scores(texts: pd.Series) -> pd.DataFrame:
    """Heuristic quality features: length, alpha ratio, punct ratio,
    stopword ratio (en), mean word length, all-caps ratio. Float ratios are
    rounded to 6 decimals (hash-stable vs the DuckDB oracle)."""
    t = texts.fillna("")
    n_chars = t.str.len().to_numpy(dtype=np.int64)
    n_alpha = t.str.count(r"[A-Za-z]").to_numpy(dtype=np.int64)
    # ASCII punct-ish: not word (ASCII), not ASCII whitespace
    n_punct = t.str.count(r"[^A-Za-z0-9_ \t\n\r\f\v]").to_numpy(
        dtype=np.int64)
    n_upper = t.str.count(r"[A-Z]").to_numpy(dtype=np.int64)
    words = t.str.findall(_WORD_RE)
    n_words = words.str.len().to_numpy(dtype=np.int64)
    # vectorized stopword + word-length accounting via a single explode
    ex = words.explode().dropna()
    if len(ex):
        low = ex.str.lower()
        stop_hits = low.isin(_LANG_PROFILES["en"]).groupby(level=0).sum()
        wlen_sum = ex.str.len().groupby(level=0).sum()
        n_stop = stop_hits.reindex(t.index, fill_value=0).to_numpy(
            dtype=np.int64)
        sum_wlen = wlen_sum.reindex(t.index, fill_value=0).to_numpy(
            dtype=np.int64)
    else:
        n_stop = np.zeros(len(t), dtype=np.int64)
        sum_wlen = np.zeros(len(t), dtype=np.int64)
    safe = np.maximum(n_chars, 1)
    safe_w = np.maximum(n_words, 1)
    mean_wlen = np.where(n_words > 0, sum_wlen / safe_w, 0.0)
    return pd.DataFrame({
        "n_chars": n_chars,
        "n_words": n_words,
        "alpha_ratio": round_half_away(n_alpha / safe),
        "punct_ratio": round_half_away(n_punct / safe),
        "upper_ratio": round_half_away(n_upper / safe),
        "stopword_ratio": round_half_away(n_stop / safe_w),
        "mean_word_len": round_half_away(mean_wlen),
    })


def lang_id(texts: pd.Series) -> pd.Series:
    """Stopword-profile language guess; 'und' (undetermined) when no
    profile scores > 0. Vectorized: one findall + explode, then a per-
    profile isin/groupby — no per-row Python."""
    t = texts.fillna("")
    words = t.str.findall(_LANG_WORD_RE)
    ex = words.explode().dropna()
    counts = np.zeros((len(t), len(_LANG_ORDER)), dtype=np.int64)
    if len(ex):
        low = ex.str.lower()
        for j, lang in enumerate(_LANG_ORDER):
            hits = low.isin(_LANG_PROFILES[lang]).groupby(level=0).sum()
            counts[:, j] = hits.reindex(t.index, fill_value=0).to_numpy(
                dtype=np.int64)
    # first profile (in _LANG_ORDER) attaining the max, 'und' if max == 0
    best = np.argmax(counts, axis=1)          # argmax keeps FIRST max
    langs = np.array(_LANG_ORDER, dtype=object)
    out = np.where(counts.max(axis=1) > 0, langs[best], "und")
    return pd.Series(out, index=t.index, dtype=object)


def winnow_fingerprints(text: str, k: int = 12,
                        window: int = 32) -> np.ndarray:
    """Full Schleimer et al. winnowing: the distinct minima of every
    ``window`` consecutive POSITION-ORDERED k-gram hashes. Guarantee: two
    texts sharing any substring of length >= window + k - 1 share at
    least one fingerprint (the local-min selection is position-stable).
    Returns a sorted unique uint64 array (possibly a single whole-doc
    hash for short texts)."""
    from miekki_ray.functions.hashing import shingle_hashes_ordered

    h = shingle_hashes_ordered((text or "").encode("utf-8"), k)
    if h.size <= window:
        return np.unique(h.min(keepdims=True))
    win = np.lib.stride_tricks.sliding_window_view(h, window)
    return np.unique(win.min(axis=1))


def winnow_sets_from_arrow(col, k: int = 12,
                           window: int = 32) -> list[np.ndarray]:
    """Batch winnowing: per-doc Schleimer fingerprint sets for a whole
    Arrow string column in ONE chunked rolling-hash pass — the SHARED
    chassis hashing.iter_ordered_kgram_slices (r4: this function and
    shingle_sets_from_arrow carried drifting copies of the chunk walk).
    Bit-identical to per-doc ``winnow_fingerprints`` (pinned by pytest);
    the per-doc remainder is two numpy kernels (sliding-window min +
    unique), not an encode + rolling pass."""
    from miekki_ray.functions.hashing import iter_ordered_kgram_slices

    out: list[np.ndarray] = []
    for h in iter_ordered_kgram_slices(col, k):
        if h.size <= window:
            out.append(np.unique(h.min(keepdims=True)))
        else:
            win = np.lib.stride_tricks.sliding_window_view(h, window)
            out.append(np.unique(win.min(axis=1)))
    return out


def doc_fingerprint(texts: pd.Series, window: int = 64) -> np.ndarray:
    """Winnowing-style fingerprint: min rolling-hash over `window`-byte
    shingles — a compact 64-bit content id robust to small local edits at
    the ends (public: Schleimer et al. winnowing, simplified to global
    min). Batch path: one concatenated rolling-hash pass + one
    minimum.reduceat — no per-doc Python hashing loop."""
    from miekki_ray.functions.hashing import shingle_hashes

    enc = [s.encode("utf-8") for s in texts.fillna("")]
    n = len(enc)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    sets = [shingle_hashes(e, window) for e in enc]
    sizes = np.array([s.size for s in sets], dtype=np.int64)
    nonempty = sizes > 0
    if nonempty.any():
        concat = np.concatenate([s for s in sets if s.size])
        offsets = np.concatenate(([0], np.cumsum(sizes[nonempty])[:-1]))
        out[nonempty] = np.minimum.reduceat(concat, offsets)
    return out


def round_half_away(x, nd: int = 6) -> np.ndarray:
    """Sign-aware round-half-AWAY-from-zero (DuckDB ROUND semantics) for
    any-sign values; np.round is banker's and flips exactly-representable
    .5 boundaries (e.g. 3.125 @ 2dp). NaN passes through."""
    s = 10.0 ** nd
    x = np.asarray(x, dtype=np.float64)
    return np.sign(x) * np.floor(np.abs(x) * s + 0.5) / s


# Token = maximal run of chars OUTSIDE the oracle's RE2 split class
# '[\s\x1c-\x1f]+' (RE2 \s is ASCII [\t\n\f\r ] — NO \v, NO Unicode
# whitespace). Python str.split() is Unicode-aware and diverges on NBSP /
# \v /  ; every oracle-compared tokenizer must use THIS class.
TOKEN_SPLIT_RE = r"[^\t\n\f\r \x1c-\x1f]+"
