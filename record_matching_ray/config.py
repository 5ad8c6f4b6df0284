"""Pipeline configuration.

The reference scatters its thresholds as constants (candidate distance 0.3
at record_matching/main.py:557, cluster inclusion 0.97 at main.py:630, ANN
beam 32 at main.py:179, PoC blocking thresholds 0.70/0.80 at
claude_poc/entity-resolution_v4.py:304 and claude_poc_v2/...v2.py:1359-1360).
Here they live in one frozen dataclass so every stage, test and bench run
shares a single fingerprintable config (SURVEY.md §2.14).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


# Feature order is part of the contract (reference pins it as sorted(keys),
# record_matching/main.py:452, 684). Weights vectors are always in this order.
FEATURE_NAMES: tuple[str, ...] = (
    "f_cosine",          # hashing-embedding cosine similarity of full text
    "f_jaccard",         # token-set Jaccard of text shingle/token sets
    "f_jaro_winkler",    # Jaro-Winkler similarity of the extracted name/title
    "f_token_levenshtein",  # token-set Levenshtein ratio of names
    "f_temporal",        # year-compatibility score
    "f_name_content",    # jaro_winkler x jaccard interaction — the
                         # "adaptive weights for identical names" rule
                         # (claude_poc_v2/...v2.py:1582-1632): an identical
                         # name only counts when the page CONTENT also
                         # agrees, separating shared-name distinct entities
)


@dataclass(frozen=True)
class PipelineConfig:
    # --- S1 extraction / feature computation -------------------------------
    shingle_k: int = 3            # tokens per shingle for MinHash
    num_perm: int = 64            # MinHash permutations
    lsh_bands: int = 16           # bands (rows = num_perm // lsh_bands)
    embed_dim: int = 64           # hashing-trick embedding dimension
    max_tokens: int = 512         # cap tokens considered per page

    # --- S2 blocking -------------------------------------------------------
    use_host_blocks: bool = True
    use_lsh_blocks: bool = True
    use_name_blocks: bool = True  # exact normalized-name key (reference:
                                  # person-field ANN blocking main.py:552-577;
                                  # poc2 name|birth|death pre-cluster :1883-1918)
    hot_block_limit: int = 256    # block size above which the host block is salted
    n_salts: int = 8              # salt fan-out for hot blocks
    max_pairs_per_block: int = 65536  # hard cap; overflow counted, never silent

    # --- S3 scoring --------------------------------------------------------
    # Default weights used before/without training (reference trains logistic
    # regression, main.py:444-486; sensible prior here, overridable by
    # train_weights()).
    intercept: float = -6.0
    weights: tuple[float, ...] = (4.0, 3.0, 1.0, 1.0, 1.0, 4.0)  # FEATURE_NAMES order:
    # name-string features carry little weight on their own (1.0 each);
    # the name x content interaction carries it instead, so identical
    # names over disjoint text (score ~4.9) stay below the 6.0 edge bar
    # while true cross-host duplicates (~11+) clear it easily
    edge_threshold: float = 0.5   # score >= tau becomes a cluster edge
                                  # (reference: 0.97 on its own calibration,
                                  # main.py:630 — tau is calibration-specific)

    # --- S4 clustering -----------------------------------------------------
    max_cc_iters: int = 50        # label-propagation fixpoint bound
    refine_year_tolerance: float | None = None  # when set, run_er appends the
                                  # S5b year-conflict refinement stage
                                  # (stages/refine.py, poc2:1640-1853 analog)
    refine_domain_threshold: float | None = None  # when set, run_er appends
                                  # domain-coherence splitting: clusters with
                                  # mean pairwise embedding cosine below the
                                  # threshold are rebuilt without incoherent
                                  # edges (poc2:1640-1853's 0.25 rule)

    # --- page identity -----------------------------------------------------
    uid_mode: str = "hash64"      # "hash64": mix64(blake8(url)) >> 1 — 63-bit
                                  # ids, collision odds n^2/2^64 (negligible
                                  # to ~10^9 pages). "checked64": same wire
                                  # format (every shuffle stays 16B/pair),
                                  # plus a distributed collision audit that
                                  # deterministically remaps the O(n^2/2^64)
                                  # colliding urls (~50 at 10^12 pages) via a
                                  # broadcast dict — the 10^12-page path
                                  # without paying 2x on every pair shuffle
                                  # the way a two-column 128-bit uid would.

    # --- execution ---------------------------------------------------------
    keep_scored: bool = False     # checkpoint the full scored-pairs table
    emit_features: bool = False   # include per-pair f_* columns in scorer output
    scorer_batch_size: int = 16384  # fused-scorer input is 16B/row uid
                                    # pairs; 16k amortizes per-batch
                                    # dispatch without the tail-latency
                                    # imbalance 64k batches showed (A/B:
                                    # 8k/16k/64k -> 10.8/10.4/19.8s edges)
    scorer_concurrency: int = 4   # actor-pool size for the scorer stage
    extract_batch_size: int = 2048

    def feature_names(self) -> tuple[str, ...]:
        return FEATURE_NAMES

    @property
    def lsh_rows(self) -> int:
        assert self.num_perm % self.lsh_bands == 0
        return self.num_perm // self.lsh_bands

    def fingerprint(self) -> str:
        """Stable hash of the config — recorded in stage manifests so a
        resumed run only reuses checkpoints produced under the same config."""
        payload = json.dumps(asdict(self), sort_keys=True).encode()
        return hashlib.sha256(payload).hexdigest()[:16]


DEFAULT_CONFIG = PipelineConfig()
