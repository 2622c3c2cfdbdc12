"""miekki_ray — a from-scratch, Ray-Data-native near-duplicate detection and
clustering engine over Parquet tables of multi-turn conversation transcripts.

Re-expresses the capabilities of the Malfoy/Miekki reference (k-mer MinHash
sketching + partitioned-index intersection; see SURVEY.md — note §0: the
reference checkout is empty, so claims are pinned to BASELINE.json's spec
sentences, not reference file:line) as idiomatic Ray Data pipelines:

- conversations reconstructed from turn rows with a stable
  (conv_id, turn_idx) sort-merge                        [spec BASELINE.json:15]
- per-conversation k-shingle MinHash signatures, vectorized 64-bit
  multiply-shift hashing in NumPy inside actor pools    [spec BASELINE.json:6]
- LSH band hashing via groupby-aggregate shuffles, skewed buckets
  explicitly salted/split                               [spec BASELINE.json:6]
- exact Jaccard verification, suffix-array near-containment, union-find
  connected-component clustering                        [spec BASELINE.json:6]
- per-partition lineage manifests + checkpoint-resumable stage outputs
                                                        [spec BASELINE.json:14]
"""

from miekki_ray.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
