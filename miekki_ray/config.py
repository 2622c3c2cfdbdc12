"""Engine configuration — one frozen dataclass, hashed into lineage manifests.

SURVEY.md §2.10: "one frozen dataclass: k, S, b, r (b·r=S asserted), seed,
jaccard_threshold, bucket_cap, salt_max, paths; hashed into lineage
manifests [spec BASELINE.json:14]".

Every hash / permutation / sample in the engine is derived from ``seed`` so
runs are bit-reproducible (SURVEY.md §4.2 "determinism").
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass


@dataclass(frozen=True)
class DedupConfig:
    # --- sketch config (must match the oracle's for the recall>=0.99 gate) ---
    k: int = 12           # shingle size: character k-grams over the joined doc
    num_perm: int = 128   # S — MinHash signature length (slots)
    bands: int = 32       # b — LSH bands
    rows_per_band: int = 4  # r — slots per band; b*r == S asserted
    seed: int = 20260817  # root seed for all hash-parameter derivation

    # --- decision thresholds ---
    jaccard_threshold: float = 0.8      # exact-Jaccard verify: edge iff J >= t
    containment_threshold: float = 0.9  # ST3: shingle-containment gate
    containment_lcs_ratio: float = 0.8  # ST3: LCS(short,long)/len(short) >= ratio => edge
    containment_enabled: bool = True    # gate for the suffix-array stage (§7 M5)

    # --- containment candidate generation (feeds ST3) ---
    # extra LSH bands over a MinHash of the doc's FIRST prefix_sketch_bytes:
    # a prefix-contained pair (A = prefix of B, len(A) >= window) has
    # IDENTICAL prefix windows, so its collision is guaranteed even though
    # full-doc Jaccard is far below threshold. Containment pairs the
    # full-doc bands miss are proposed here and decided exactly by ST3.
    prefix_sketch_bytes: int = 512
    prefix_bands: int = 2
    prefix_rows: int = 4
    # prefix-band buckets get a much tighter pair cap: boilerplate openings
    # (skew blocks) give MANY docs identical prefix windows, and those
    # buckets exist only to propose containment pairs — genuine containment
    # pairs sit in tiny buckets, while a shared-boilerplate mega-bucket
    # yields only verify-reject junk
    prefix_pair_cap: int = 256

    # --- skew handling (SURVEY.md §4.2) ---
    bucket_cap: int = 64    # bucket with > cap docs is salted/split + pair-sampled
    salt_factor: int = 16   # hot buckets split into this many sub-buckets
    pair_cap: int = 2048    # max pairs emitted per (sub-)bucket, seeded sample

    # --- doc assembly ---
    doc_len_cap: int = 1_000_000  # bytes of joined doc fed to the sketcher (§7 hard part 5)
    role_sep: str = "\x1f"        # role<sep>text within a turn
    turn_sep: str = "\x1e"        # between turns in the joined doc
    # M1: normalize the INTERNAL sketch/doc representation (\r\n -> \n +
    # NFC) so trivially-reformatted variants of a conversation dedup
    # together. The raw `text` column is never touched (the spec's per-turn
    # byte-equality invariant) — only the assembled `doc` string changes.
    normalize_docs: bool = False

    # --- scale auto-switches (SURVEY.md §4.3) ---
    # above these sizes the driver-side/broadcast variants are replaced by
    # fully-distributed ones; the defaults keep the fast small-corpus paths
    # for every sandbox run while tests pin tiny limits to exercise the
    # scale paths and assert identical output
    broadcast_loser_limit: int = 2_000_000   # exact-dup losers broadcastable
    driver_edge_limit: int = 2_000_000       # verified edges driver-UF-able
    # below BOTH limits the verify stage skips its two hash joins and
    # assembles pair docs on the driver (verify.verify_local; r3 fix for
    # the small-corpus fixed-overhead regression). Above ~4 batches the
    # kernel fans back out via from_arrow slices, so only the doc FETCH
    # is driver-bound and the byte limit is the real guard (estimate from
    # the docs table's average row bytes; pathological bound is
    # 2*pairs*doc_len_cap). Measured at 23k pairs / 32 cpus: attach_docs'
    # two hash joins cost 2.2 s of aggregator startup vs 0.9 s of actual
    # verify compute — the joins only pay for themselves when the pair
    # table itself is too big to sit on the driver.
    driver_verify_pairs: int = 200_000
    driver_verify_bytes: int = 512 * 2**20

    # --- physical execution ---
    num_partitions: int = 64      # shuffle width for groupby stages
    # docs per sketcher batch. Measured r2 (250k corpus, 16 cpus, fresh
    # sessions): 128/256 -> 17-22 s, 1024 -> 27-36 s for the sketch stage —
    # finer batches mean more tasks (better balance/pipelining) and a
    # ~5 MB hash working set per task instead of ~20 MB
    sketch_batch_size: int = 256
    # int => FIXED pool size (spawns all actors immediately); (lo, hi)
    # tuple => Ray autoscaling pool, which ramps too slowly for short jobs
    sketch_concurrency: int | tuple[int, int] = 8
    verify_batch_size: int = 1024  # bigger batches = better per-batch doc
    #                                 shingle-cache reuse in the verifier

    def __post_init__(self) -> None:
        if self.bands * self.rows_per_band != self.num_perm:
            raise ValueError(
                f"bands*rows_per_band must equal num_perm: "
                f"{self.bands}*{self.rows_per_band} != {self.num_perm}"
            )
        if self.k < 1:
            raise ValueError("k must be >= 1")
        if self.prefix_sketch_bytes < self.k:
            # a prefix window shorter than one shingle would yield an EMPTY
            # prefix set, and minhash_from_concat's reduceat would silently
            # assign that doc its neighbor's signature (review finding,
            # reproduced) — reject the config outright
            raise ValueError(
                f"prefix_sketch_bytes ({self.prefix_sketch_bytes}) must be "
                f">= k ({self.k}): shorter prefixes produce empty shingle "
                "sets and corrupt prefix signatures")
        if not (0.0 < self.jaccard_threshold <= 1.0):
            raise ValueError("jaccard_threshold must be in (0, 1]")

    def config_hash(self) -> str:
        """Stable hash of the semantic config — recorded in every stage
        manifest so resume invalidates on config change [spec BASELINE.json:14]."""
        d = asdict(self)
        # physical knobs don't change results; exclude them from the hash
        # (the scale auto-switch thresholds route between implementations
        # that are asserted identical — tests/test_cluster.py)
        for phys in ("num_partitions", "sketch_batch_size", "sketch_concurrency",
                     "verify_batch_size", "broadcast_loser_limit",
                     "driver_edge_limit", "driver_verify_pairs",
                     "driver_verify_bytes"):
            d.pop(phys)
        blob = json.dumps(d, sort_keys=True, default=str).encode()
        return hashlib.blake2b(blob, digest_size=16).hexdigest()
