"""Text-analysis kernels for large-scale training-data pipelines:
language-ID (n-gram heuristic), quality scoring, token counting, and
document fingerprinting (rolling hash). All vectorized/pandas-string based;
compiled patterns live at module scope (built once per worker process).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_TOKEN_RE = re.compile(r"[A-Za-z0-9]+(?:'[a-z]+)?|[^\sA-Za-z0-9]")
_WS_RE = re.compile(r"\s+")

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


def token_count(texts: pd.Series) -> np.ndarray:
    """Whitespace + BPE-ish regex token count per text."""
    return texts.fillna("").str.count(_TOKEN_RE).to_numpy(dtype=np.int64)


def whitespace_token_count(texts: pd.Series) -> np.ndarray:
    t = texts.fillna("").str.strip()
    n = t.str.count(_WS_RE).to_numpy(dtype=np.int64) + 1
    n[t.str.len().to_numpy() == 0] = 0
    return n


def quality_scores(texts: pd.Series) -> pd.DataFrame:
    """Heuristic quality features: length, alpha ratio, punct ratio,
    stopword ratio (en), mean word length, all-caps ratio."""
    t = texts.fillna("")
    n_chars = t.str.len().to_numpy(dtype=np.int64)
    n_alpha = t.str.count(r"[A-Za-z]").to_numpy(dtype=np.int64)
    n_punct = t.str.count(r"[^\w\s]").to_numpy(dtype=np.int64)
    n_upper = t.str.count(r"[A-Z]").to_numpy(dtype=np.int64)
    words = t.str.findall(r"[a-zA-Z']+")
    n_words = words.str.len().to_numpy(dtype=np.int64)
    stop = _LANG_PROFILES["en"]
    n_stop = words.map(
        lambda ws: sum(1 for w in ws if w.lower() in stop)).to_numpy(
        dtype=np.int64)
    mean_wlen = words.map(
        lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0
    ).to_numpy(dtype=np.float64)
    safe = np.maximum(n_chars, 1)
    return pd.DataFrame({
        "n_chars": n_chars,
        "n_words": n_words,
        "alpha_ratio": n_alpha / safe,
        "punct_ratio": n_punct / safe,
        "upper_ratio": n_upper / safe,
        "stopword_ratio": n_stop / np.maximum(n_words, 1),
        "mean_word_len": mean_wlen,
    })


def lang_id(texts: pd.Series) -> pd.Series:
    """Stopword-profile language guess; 'und' (undetermined) when no
    profile scores > 0."""
    def one(s: str) -> str:
        ws = [w.lower() for w in re.findall(r"[a-zA-Zäöüéèàç']+", s or "")]
        if not ws:
            return "und"
        best, best_n = "und", 0
        for lang, prof in _LANG_PROFILES.items():
            n = sum(1 for w in ws if w in prof)
            if n > best_n:
                best, best_n = lang, n
        return best

    return texts.map(one)


def doc_fingerprint(texts: pd.Series, window: int = 64) -> np.ndarray:
    """Winnowing-style fingerprint: min rolling-hash over `window`-byte
    shingles — a compact 64-bit content id robust to small local edits at
    the ends (public: Schleimer et al. winnowing, simplified to global min)."""
    from miekki_ray.functions.hashing import shingle_hashes

    out = np.empty(len(texts), dtype=np.uint64)
    for i, s in enumerate(texts.fillna("")):
        h = shingle_hashes(s.encode("utf-8"), window)
        out[i] = h.min() if h.size else np.uint64(0)
    return out
