"""Deterministic synthetic transcript corpus with planted duplicates.

Operator S2 (SURVEY.md §2.1) / FIXTURES.md §B: the repo-generated corpus
that substitutes for the reference's bundled query-vs-index test sequences
(unavailable — SURVEY.md §0). Fully deterministic from (n_convs, seed):
NumPy default_rng only, no wall clock, no external data.

Output schema is exactly the spec's input table [spec BASELINE.json:15]:

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp[us]

Rows are written in a deterministically SHUFFLED order so the stable
(conv_id, turn_idx) sort-merge invariant is actually exercised.

Planted structure (fractions of n_convs; see FIXTURES.md §B table):
  ~60% uniques · ~10% exact-dup clusters (size 2-5) · ~15% near-dup high-J
  · ~5% near-dup borderline · ~5% containment (prefix) pairs · ~5% skew
  block sharing one boilerplate opening.

Ground TRUTH is NOT emitted here — the oracle module computes it by brute
force over the same shingle sets (FIXTURES.md: "computed by a separate,
trivially-simple oracle module"). We do emit a `planted` table
(a, b, kind) for test introspection of which mechanism created a pair.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_ROLES = ("user", "assistant")
_BASE_TS_US = 1_700_000_000_000_000  # fixed epoch base, microseconds


def _vocab(rng: np.random.Generator, size: int = 32768) -> list[str]:
    """Large vocabulary of 4-7 char words so unrelated docs share ~no
    k-shingles: with k=10, a shared single word w gives a fully-determined
    shared window only when len(" w ") >= k, i.e. len(w) >= 8 — capping at
    7 forces every window to include neighbor-word characters, so cross-doc
    collisions need a shared word BIGRAM (negligible at 32k vocab). Keeps
    the brute-force oracle sparse and the planted J-distribution sharp."""
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    out = []
    for _ in range(size):
        ln = int(rng.integers(4, 8))
        out.append("".join(rng.choice(letters, size=ln)))
    return out


def _gen_turn_tokens(rng: np.random.Generator, vocab_n: int) -> np.ndarray:
    n_tok = int(rng.integers(5, 61))
    return rng.integers(0, vocab_n, size=n_tok)


def _edit_tokens(tokens: list[np.ndarray], rng: np.random.Generator,
                 rate: float, vocab_n: int) -> list[np.ndarray]:
    """Seeded token-level swap/insert/delete at ~`rate` per token."""
    out = []
    for t in tokens:
        t = t.copy()
        m = rng.random(t.size) < rate
        # substitute
        t[m] = rng.integers(0, vocab_n, size=int(m.sum()))
        # occasional insert / delete
        if t.size > 2 and rng.random() < rate * t.size / 3:
            pos = int(rng.integers(0, t.size))
            if rng.random() < 0.5:
                t = np.delete(t, pos)
            else:
                t = np.insert(t, pos, int(rng.integers(0, vocab_n)))
        out.append(t)
    return out


class _Builder:
    def __init__(self, seed: int):
        self.rng = np.random.default_rng(seed)
        self.vocab = _vocab(self.rng)
        self.vocab_n = len(self.vocab)
        self.rows_conv: list[str] = []
        self.rows_idx: list[int] = []
        self.rows_role: list[str] = []
        self.rows_text: list[str] = []
        self.rows_tool: list[str | None] = []
        self.rows_ts: list[int] = []
        self.planted: list[tuple[str, str, str]] = []
        self.n_emitted = 0
        self._conv_start: dict[str, int] = {}  # cid -> first row offset

    def new_conv_tokens(self, n_turns: int | None = None) -> list[np.ndarray]:
        if n_turns is None:
            n_turns = int(self.rng.integers(2, 41))
        return [_gen_turn_tokens(self.rng, self.vocab_n) for _ in range(n_turns)]

    def emit(self, tokens: list[np.ndarray]) -> str:
        cid = f"c{self.n_emitted:06d}"
        conv_i = self.n_emitted
        self.n_emitted += 1
        self._conv_start[cid] = len(self.rows_conv)
        for ti, tok in enumerate(tokens):
            role = "tool" if self.rng.random() < 0.10 else _ROLES[ti % 2]
            tool = f"tool_{int(self.rng.integers(0, 8))}" if role == "tool" else None
            text = " ".join(self.vocab[j] for j in tok)
            self.rows_conv.append(cid)
            self.rows_idx.append(ti)
            self.rows_role.append(role)
            self.rows_text.append(text)
            self.rows_tool.append(tool)
            self.rows_ts.append(_BASE_TS_US + conv_i * 3_600_000_000 + ti * 30_000_000)
        return cid

    def emit_copy_exact(self, src_rows: tuple[list, list, list]) -> str:
        """Byte-identical turn copy (role/text/tool identical; ts shifted)."""
        roles, texts, tools = src_rows
        cid = f"c{self.n_emitted:06d}"
        conv_i = self.n_emitted
        self.n_emitted += 1
        self._conv_start[cid] = len(self.rows_conv)
        for ti, (role, text, tool) in enumerate(zip(roles, texts, tools)):
            self.rows_conv.append(cid)
            self.rows_idx.append(ti)
            self.rows_role.append(role)
            self.rows_text.append(text)
            self.rows_tool.append(tool)
            self.rows_ts.append(_BASE_TS_US + conv_i * 3_600_000_000 + ti * 30_000_000)
        return cid

    def emit_edited(self, tokens: list[np.ndarray], src_cid: str) -> str:
        """Emit an edited copy carrying the SOURCE's role/tool tags: the
        near-dup fixtures calibrate Jaccard purely via token edit rates;
        emit()'s independent 10% tool redraw would otherwise perturb
        ~18% of turn tags on top of the planted edits, pushing the
        borderline band off the threshold it is tuned to straddle."""
        roles, _texts, tools = self.last_conv_rows(src_cid)
        cid = f"c{self.n_emitted:06d}"
        conv_i = self.n_emitted
        self.n_emitted += 1
        self._conv_start[cid] = len(self.rows_conv)
        for ti, tok in enumerate(tokens):
            self.rows_conv.append(cid)
            self.rows_idx.append(ti)
            self.rows_role.append(roles[ti])
            self.rows_text.append(" ".join(self.vocab[j] for j in tok))
            self.rows_tool.append(tools[ti])
            self.rows_ts.append(
                _BASE_TS_US + conv_i * 3_600_000_000 + ti * 30_000_000)
        return cid

    def last_conv_rows(self, cid: str) -> tuple[list, list, list]:
        # rows of one conv are contiguous and in turn_idx order at emit time
        s = self._conv_start[cid]
        e = s
        while e < len(self.rows_conv) and self.rows_conv[e] == cid:
            e += 1
        return (self.rows_role[s:e], self.rows_text[s:e], self.rows_tool[s:e])


def synth_transcripts(n_convs: int, seed: int) -> tuple[pa.Table, pa.Table]:
    """Return (turns, planted) tables. turns rows are deterministically
    shuffled; planted = (a, b, kind) with kind in
    {exact, near_high, near_border, containment, skew}."""
    b = _Builder(seed)
    n_skew = max(0, int(0.05 * n_convs))
    n_exact = int(0.10 * n_convs)
    n_near = int(0.15 * n_convs)
    n_border = int(0.05 * n_convs)
    n_contain = int(0.05 * n_convs)

    # --- skew block: many convs share one boilerplate opening ---
    if n_skew >= 2:
        opening = [_gen_turn_tokens(b.rng, b.vocab_n) for _ in range(4)]
        skew_ids = []
        for _ in range(n_skew):
            tail = [_gen_turn_tokens(b.rng, b.vocab_n)
                    for _ in range(int(b.rng.integers(6, 20)))]
            skew_ids.append(b.emit(opening + tail))
        for i in range(1, len(skew_ids)):
            b.planted.append((skew_ids[0], skew_ids[i], "skew"))

    # --- exact-dup clusters, sizes 2-5 ---
    emitted = 0
    while emitted < n_exact:
        size = int(b.rng.integers(2, 6))
        size = min(size, max(2, n_exact - emitted))
        tokens = b.new_conv_tokens()
        first = b.emit(tokens)
        src = b.last_conv_rows(first)
        for _ in range(size - 1):
            other = b.emit_copy_exact(src)
            b.planted.append((first, other, "exact"))
        emitted += size

    # --- near dups, high-J: light seeded edits ---
    emitted = 0
    while emitted < n_near:
        size = min(int(b.rng.integers(2, 4)), max(2, n_near - emitted))
        tokens = b.new_conv_tokens(n_turns=int(b.rng.integers(6, 30)))
        first = b.emit(tokens)
        for _ in range(size - 1):
            other = b.emit_edited(
                _edit_tokens(tokens, b.rng, 0.006, b.vocab_n), first)
            b.planted.append((first, other, "near_high"))
        emitted += size

    # --- near dups, borderline: heavier edits (lands near the J threshold) ---
    for _ in range(max(0, n_border // 2)):
        tokens = b.new_conv_tokens(n_turns=int(b.rng.integers(6, 30)))
        first = b.emit(tokens)
        other = b.emit_edited(
            _edit_tokens(tokens, b.rng, 0.04, b.vocab_n), first)
        b.planted.append((first, other, "near_border"))

    # --- containment: A = true prefix of B's turns, roles and all
    # (suffix-array stage population) ---
    for _ in range(max(0, n_contain // 2)):
        tokens = b.new_conv_tokens(n_turns=int(b.rng.integers(12, 36)))
        cut = max(2, int(len(tokens) * float(b.rng.uniform(0.3, 0.6))))
        big = b.emit(tokens)
        roles, texts, tools = b.last_conv_rows(big)
        small = b.emit_copy_exact((roles[:cut], texts[:cut], tools[:cut]))
        b.planted.append((small, big, "containment"))

    # --- uniques fill the remainder ---
    while b.n_emitted < n_convs:
        b.emit(b.new_conv_tokens())

    n_rows = len(b.rows_conv)
    perm = np.random.default_rng(seed + 999).permutation(n_rows)
    turns = pa.table({
        "conv_id": pa.array(np.asarray(b.rows_conv, dtype=object)[perm],
                            type=pa.string()),
        "turn_idx": pa.array(np.asarray(b.rows_idx, dtype=np.int32)[perm],
                             type=pa.int32()),
        "role": pa.array(np.asarray(b.rows_role, dtype=object)[perm],
                         type=pa.string()),
        "text": pa.array(np.asarray(b.rows_text, dtype=object)[perm],
                         type=pa.string()),
        "tool": pa.array(np.asarray(b.rows_tool, dtype=object)[perm],
                         type=pa.string()),
        "ts": pa.array(np.asarray(b.rows_ts, dtype=np.int64)[perm],
                       type=pa.timestamp("us")),
    })
    planted = pa.table({
        "a": pa.array([p[0] for p in b.planted], type=pa.string()),
        "b": pa.array([p[1] for p in b.planted], type=pa.string()),
        "kind": pa.array([p[2] for p in b.planted], type=pa.string()),
    })
    return turns, planted


def write_synth(out_dir: str, n_convs: int, seed: int) -> None:
    """Write turns.parquet + planted.parquet under out_dir (scratch/bench)."""
    import os
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    turns, planted = synth_transcripts(n_convs, seed)
    pq.write_table(turns, os.path.join(out_dir, "turns.parquet"))
    pq.write_table(planted, os.path.join(out_dir, "planted.parquet"))
