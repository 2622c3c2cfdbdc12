#!/usr/bin/env python
"""Regenerate miekki_ray/functions/bpe_merges.txt — the vendored BPE
merge table (functions/bpe.py docstring explains the provenance).

Training corpus: the text column of the repo's own deterministic
synthetic transcript generator at a fixed (n_convs, seed) — no external
data, bit-reproducible. Rerunning this script must be a no-op diff.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from miekki_ray.functions.bpe import _FIXTURE, save_merges, train_bpe
    from miekki_ray.synth import synth_transcripts

    turns, _ = synth_transcripts(300, 42)
    texts = turns["text"].to_pylist()
    merges = train_bpe(texts, n_merges=512)
    save_merges(merges, _FIXTURE)
    print(f"wrote {len(merges)} merges to {_FIXTURE}")


if __name__ == "__main__":
    main()
