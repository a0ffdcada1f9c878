"""Configuration for the PySpark-native record-linkage engine.

Mirrors the knob surface of the reference R package (parameter list at
``LinkOrgs/R/LinkOrgs_LinkOrgs.R:113-134``) without copying its code: the
reference exposes ``MaxDist``, ``AveMatchNumberPerAlias`` (raw + network),
``DistanceMeasure``, ``qgram``, ``RelThresNetwork`` and normalization flags.
We re-express them as one frozen dataclass consumed by every stage.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


@dataclass(frozen=True)
class LinkConfig:
    """All knobs for one linkage run.

    Defaults follow the reference defaults (``LinkOrgs_LinkOrgs.R:123-127``):
    jaccard over q=2 grams, AveMatchNumberPerAlias=10 raw / 2 network,
    RelThresNetwork=1.5, lower/space/punct normalization on.
    """

    # --- name columns -------------------------------------------------
    by_x: str = "name"
    by_y: str = "name"

    # --- normalization flags (LinkOrgs_LinkOrgs.R:541-568) -------------
    to_lower: bool = True
    norm_space: bool = True
    remove_punct: bool = True

    # --- scoring -------------------------------------------------------
    distance_measure: str = "jaccard"  # jaccard | levenshtein | osa | jw | embed_l2 | embed_cosine
    qgram: int = 2                      # q for the jaccard measure
    max_dist: float | None = None       # None => calibrate
    ave_match_number_per_alias: float = 10.0
    # network (alias-bridge) stage
    max_dist_network: float | None = None
    ave_match_number_per_alias_network: float = 2.0
    rel_thres_network: float = 1.5

    # --- blocking (PFuzzyDiscreteInternal.R:102-139 semantics) ---------
    block_ngram: int = 3                # trigram inverted index
    min_shared_frac: float = 0.05       # candidate needs >= ceil(frac * |trigrams(x)|) shared
    name_prefix_cap: int = 100          # trigram windows only over chars 1..100 (BuildHelpers.R:194)
    max_block_df: int | None = 10_000   # drop trigrams whose posting list exceeds this (skew guard)
    salt_buckets: int = 0               # >0 => explicit salting of the blocking join

    # --- calibration (CalibrateDistThres.R:37-104 semantics) -----------
    calibration_sample: int = 1000
    seed: int = 42

    # --- clustering -----------------------------------------------------
    cc_max_iter: int = 50
    cc_checkpoint_every: int = 5

    # --- misc ------------------------------------------------------------
    shuffle_partitions: int | None = None  # None => leave session setting

    def with_(self, **kw) -> "LinkConfig":
        return replace(self, **kw)


DEFAULT = LinkConfig()
